"""s4g_tpu — a TPU-native (JAX/XLA/Pallas/pjit) single-shot SE(3) grasp-detection
framework with the full capabilities of the S4G reference (yzqin/s4g-release).

Layer map (mirrors SURVEY.md §1 of the reference):
  L1  configs/ + utils/   — config tree, geometry constants, logging, checkpointing
  L2  ops/                — TPU-native point-cloud ops (FPS, ball query, grouping,
                            3-NN interpolation, gather_knn) as jnp + Pallas kernels
  L3/L4  models/          — SharedMLP, SA/FP modules, PN2 / PN2_CLS / PN2_LOCAL /
                            EDGEPN2D / EDGEPN2DU / GPD / PointNetGPD (+ loss, metric)
  L5  pipeline/           — preprocessing, post-processing, collision checking,
                            GraspDetector; datagen/ — synthetic label factory
  L6  entry points        — bench.py, tools/, __graft_entry__.py
  parallel/               — device-mesh sharding (data-parallel pjit), multi-host
"""

__version__ = "0.1.0"
