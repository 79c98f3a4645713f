"""Scoped-trace probe: attribute the heritage faces-stage whiles.

Round 3's trace left two 7-9 ms whiles in the heritage steady step
unattributed (docs/ROADMAP.md); the faces interior has carried
named_scopes since (label_prop1/2, face_stats1/F, kth_*, fused_sort,
table_sort, join_sort). This captures a fresh 3-step trace of the
heritage steady state and prints (a) the grouped per-op table and (b)
the long_name of every while op above 1 ms/step — the long_name carries
the loop-state shapes, which identify the source loop (the round-3
method that attributed the label-prop convergence loops).

Runs as a tools/tpu_ab.py probe step; the full table appends to
``tpu_eval_results.jsonl``; the probe tail carries the while
attributions.
"""

import collections
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tpu_eval_results.jsonl")
TRACE_DIR = "/tmp/fccf_trace_r5"
STEPS = 3


def main():
    from tools import parse_trace, trace_config

    sys.argv = ["trace_config.py", "heritage", "--steps", str(STEPS),
                "--out", TRACE_DIR, "--no-parse"]
    trace_config.main()

    fn = parse_trace.newest_trace(TRACE_DIR)
    events = parse_trace.load_events(fn)
    total = sum(e["dur"] for e in events)
    by_op = collections.Counter()
    by_while = collections.Counter()  # per-op (ungrouped) while durations
    while_long = {}                   # while op -> its long_name
    for e in events:
        name = e.get("args", {}).get("long_name") or e["name"]
        name = name.split(" ")[0]
        if name.startswith("jit_"):
            total -= e["dur"]
            continue
        by_op[re.sub(r"\.\d+$", "", name)] += e["dur"]
        if name.lstrip("%").startswith("while"):
            by_while[name] += e["dur"]
            while_long.setdefault(
                name, e.get("args", {}).get("long_name", ""))

    table = [
        {"op": n, "us_per_step": round(d / STEPS),
         "pct": round(100 * d / total, 2)}
        for n, d in by_op.most_common(40)
    ]
    with open(OUT, "a") as f:
        f.write(json.dumps({
            "step": "heritage_trace", "steps": STEPS,
            "total_us_per_step": round(total / STEPS), "table": table,
        }) + "\n")

    print(f"TOTAL {total / STEPS / 1000:.1f} ms/step; top groups:")
    for row in table[:12]:
        print(f"  {row['us_per_step']:>8} us {row['pct']:>6.2f}% {row['op'][:80]}")
    print("WHILE ops >= 1 ms/step (long_name head identifies the loop):")
    for name, d in by_while.most_common(20):
        if d / STEPS < 1000:
            break
        print(f"  {d / STEPS:8.0f} us {name}: {while_long.get(name, '')[:220]}")


if __name__ == "__main__":
    main()
