"""Detect-QA from a saved at-scale checkpoint (VERDICT r4 #4).

Restores the latest checkpoint under <out>/train_out and runs the same
held-out-scene detection QA as tools/train_at_scale.py — but on the SAVED
weights (the in-run QA historically evaluated a state mutated by the
steady-state timing loop; see run_detect_qa's caller).

Usage:
    python tools/detect_qa.py --out /tmp/s4g_scale_r4 [--num-points 25600]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/s4g_scale")
    parser.add_argument("--num-points", type=int, default=25600)
    parser.add_argument("--qa-seed", type=int, default=777)
    parser.add_argument("--json-out", default=None,
                        help="also write the QA dict to this path")
    args = parser.parse_args()

    from s4g_tpu.configs.config import load_cfg_from_dict
    from s4g_tpu.utils.checkpoint import Checkpointer
    from tools.train_at_scale import build_procedural_catalog, run_detect_qa

    np_in = args.num_points
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "PN2": {
            "NUM_INPUT": np_in,
            "NUM_CENTROIDS": (np_in // 5, np_in // 25, np_in // 100),
            "RADIUS": (0.02, 0.08, 0.32),
            "NUM_NEIGHBOURS": (64, 64, 64),
            "SA_CHANNELS": ((128, 128, 256), (256, 256, 512),
                            (512, 512, 1024)),
            "FP_CHANNELS": ((1024, 1024), (512, 512), (256, 256, 256)),
            "NUM_FP_NEIGHBOURS": (3, 3, 3),
            "SEG_CHANNELS": (512, 256, 256, 128),
            "NEG_WEIGHT": 0.5,
        }},
        "DATA": {"SCORE_CLASSES": 3},
    })
    ckpt = Checkpointer(os.path.join(args.out, "train_out"), None)
    restored = ckpt.load(None, resume=True, target=None)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.out}/train_out")
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    print(f"[detect-qa] restored step {int(np.asarray(restored['step']))}",
          flush=True)

    meshes, base_specs = build_procedural_catalog(args.out)
    names = sorted(meshes)
    r = np.random.RandomState(10_000 + args.qa_seed)
    k = int(r.randint(4, 7))
    picked = r.choice(len(names), size=k, replace=False)
    qa_specs = [base_specs[names[i]] for i in picked]

    qa = run_detect_qa(variables, cfg, meshes, qa_specs, np_in,
                       qa_seed=args.qa_seed)
    qa["checkpoint_step"] = int(np.asarray(restored["step"]))
    print("[detect-qa] " + json.dumps(qa), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(qa, f, indent=1)


if __name__ == "__main__":
    main()
