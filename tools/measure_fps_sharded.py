"""Measure sharded FPS device time via a jax.profiler trace — ONE variant
per process (multi-variant slope runs in one process produce impossible
numbers through the tunnel; see BASELINE.md methodology).

Usage: timeout 580 python tools/measure_fps_sharded.py N M G
Prints one line: "N=... M=... G=...: <ms> ms/exec (device)".
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tools.trace_forward import capture
from s4g_tpu.ops.sampling import farthest_point_sample


def device_ms(trace_dir, reps=8):
    import glob
    import gzip
    import json
    from collections import defaultdict
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    tr = json.load(gzip.open(sorted(paths)[-1]))
    tids = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    totals = defaultdict(float)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and \
                "XLA Ops" in tids.get((e["pid"], e["tid"]), ""):
            totals[e["name"]] += e["dur"] / 1e3
    leaf = sum(ms for n, ms in totals.items()
               if not (n.startswith("while") or n.startswith("cond")))
    return leaf / reps


def main():
    n, m, g = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    trace_dir = f"/tmp/s4g_fps_trace_{n}_{m}_{g}"
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.sort(rng.randn(1, 3, n).astype(np.float32), axis=2))
    fn = jax.jit(lambda p: farthest_point_sample(p, m, "auto", g))
    capture(fn, (pts,), trace_dir)
    print(f"N={n} M={m} G={g}: {device_ms(trace_dir):.3f} ms/exec (device)",
          flush=True)


if __name__ == "__main__":
    main()
