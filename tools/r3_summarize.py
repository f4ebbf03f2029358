"""Summarize a tools/r3_measure_all.sh output directory into one table.

Parses the JSON line each bench/measure tool prints (and the trace tools'
headline "device XLA-op time" line) from $OUT/*.log and emits a compact
JSON + markdown summary for BASELINE.md / perf_roadmap.md.

Usage: python tools/r3_summarize.py [/tmp/r3_measure]
"""

import json
import os
import re
import sys


def last_json(path):
    try:
        with open(path, errors="replace") as f:
            lines = f.readlines()
    except OSError:
        return None
    for line in reversed(lines):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def trace_headline(path):
    try:
        with open(path, errors="replace") as f:
            text = f.read()
    except OSError:
        return None
    hits = re.findall(r"device XLA-op time: ([0-9.]+) ms/exec", text)
    return float(hits[-1]) if hits else None


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_measure"
    rows = {}
    for name in sorted(os.listdir(out)):
        if not name.endswith(".log"):
            continue
        step = name[:-4]
        path = os.path.join(out, name)
        if step.startswith("trace"):
            ms = trace_headline(path)
            rows[step] = {"device_ms_per_exec": ms} if ms is not None else None
        else:
            rows[step] = last_json(path)

    print(json.dumps(rows, indent=1))
    print()
    print("| step | headline |")
    print("|---|---|")
    for step, data in rows.items():
        if data is None:
            head = "(no parsable output — check the log)"
        elif "device_ms_per_exec" in data:
            head = f"{data['device_ms_per_exec']:.3f} ms device/exec"
        elif "e2e_ms_per_scene" in data:
            head = (f"b={data.get('batch', '?')}: "
                    f"fwd {data.get('fwd_ms_per_scene')} ms/scene, "
                    f"e2e {data.get('e2e_ms_per_scene')} ms/scene, "
                    f"{data.get('scenes_per_sec')} scenes/s")
        elif "vs_baseline" in data:
            d = data.get("detail", {})
            head = (f"{data.get('value')} scenes/s (vs_baseline "
                    f"{data.get('vs_baseline')}; fwd "
                    f"{d.get('model_forward_ms')} ms, e2e "
                    f"{d.get('detect_e2e_ms')} ms)")
        else:
            keys = [k for k in data if isinstance(data[k], (int, float))][:4]
            head = ", ".join(f"{k}={data[k]}" for k in keys) or str(data)[:80]
        print(f"| {step} | {head} |")


if __name__ == "__main__":
    main()
