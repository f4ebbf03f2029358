"""Diff two per-op device-time tables from `trace_forward.py --json`.

Normalizes each side to ms/SCENE (divides by its batch) and prints the
op-class deltas, so the batched-serving residual (+1 ms/scene at b>=2,
docs/perf_roadmap.md) can be attributed in one command during a TPU
window:

    python tools/trace_forward.py --json /tmp/t1.json
    python tools/trace_forward.py --batch 2 --json /tmp/t2.json
    python tools/trace_diff.py /tmp/t1.json /tmp/t2.json

XLA op instance names ("fusion.1234") do not correspond across two
different programs, so ops are grouped by their digit-stripped class name
("fusion", "dynamic-slice", "custom-call", ...) plus, when present, the
trailing kind annotation XLA puts in the name.  Class-level deltas are the
attribution signal; instance-level matching across programs is meaningless.
"""

import argparse
import json
import re
from collections import defaultdict


def _classes(table: dict) -> dict:
    out = defaultdict(float)
    for name, ms in table.items():
        cls = re.sub(r"[.\-_]?\d+", "", name).strip("%. ")
        out[cls or name] += ms
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("a", help="baseline trace json (e.g. batch 1)")
    p.add_argument("b", help="comparison trace json (e.g. batch 2)")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    with open(args.a) as f:
        ta = json.load(f)
    with open(args.b) as f:
        tb = json.load(f)
    ba, bb = max(ta.get("batch", 1), 1), max(tb.get("batch", 1), 1)

    la = ta["leaf_ms_per_exec"] / ba
    lb = tb["leaf_ms_per_exec"] / bb
    print(f"leaf ms/scene: a(b={ba}) {la:.3f}   b(b={bb}) {lb:.3f}   "
          f"delta {lb - la:+.3f}")

    ca = {k: v / ba for k, v in _classes(ta["ms_per_exec"]).items()}
    cb = {k: v / bb for k, v in _classes(tb["ms_per_exec"]).items()}
    keys = set(ca) | set(cb)
    rows = sorted(keys, key=lambda k: -abs(cb.get(k, 0.0) - ca.get(k, 0.0)))
    print(f"{'op class':<58}{'a ms/sc':>9}{'b ms/sc':>9}{'delta':>9}")
    for k in rows[:args.top]:
        va, vb = ca.get(k, 0.0), cb.get(k, 0.0)
        if abs(vb - va) < 5e-4:
            continue
        print(f"{k[:57]:<58}{va:9.3f}{vb:9.3f}{vb - va:+9.3f}")


if __name__ == "__main__":
    main()
