"""Wall-clock serving throughput: sequential detect() vs detect_stream.

bench.py's slope timing measures DEVICE time (dispatch and tunnel
constants cancel by construction) — the right metric for kernel work, but
a real serving loop pays host prep + dispatch + device per frame unless it
pipelines.  This measures the actual frames/sec a consumer sees, both
ways, on the deployment config over the bundled real scene.

Usage: python tools/measure_stream.py [n_frames] [depth]   (run solo)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from s4g_tpu.pipeline.detector import GraspDetector

    rng = np.random.RandomState(0)
    scene = np.load("/root/reference/inference/2638_view_0.p",
                    allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)     # (n, 3)
    frames = [cloud[rng.choice(len(cloud), 30000, replace=True)]
              for _ in range(n_frames)]

    det = GraspDetector(model="curvature_model", output_dir="/tmp/s4g_stream",
                        cloud_capacity=32768)
    kwargs = dict(num_selected=5, score_threshold=0.3,
                  verticalness_threshold=-1.0)

    # warm/compile both paths
    det.detect(frames[0], **kwargs)
    list(det.detect_stream(frames[:2], depth=depth, **kwargs))

    t0 = time.perf_counter()
    for f in frames:
        det.detect(f, **kwargs)
    seq_s = (time.perf_counter() - t0) / n_frames

    t0 = time.perf_counter()
    for _ in det.detect_stream(frames, depth=depth, **kwargs):
        pass
    stream_s = (time.perf_counter() - t0) / n_frames

    print(json.dumps({
        "n_frames": n_frames,
        "depth": depth,
        "sequential_ms_per_frame": round(seq_s * 1000, 2),
        "streamed_ms_per_frame": round(stream_s * 1000, 2),
        "sequential_fps": round(1.0 / seq_s, 1),
        "streamed_fps": round(1.0 / stream_s, 1),
    }))


if __name__ == "__main__":
    main()
