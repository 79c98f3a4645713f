"""Parse a jax.profiler vm.trace.json.gz into a per-HLO-op cost table.

Usage:
    python tools/parse_trace.py [trace_dir_or_file] [--top N] [--group]

Finds the newest vm.trace.json.gz under the given directory (default
/tmp/fccf_trace), keeps device-track events (pid whose name mentions TPU),
and prints total duration by op, using the `long_name` arg (the HLO op
name) when present. With --group, ops are bucketed by fusion-name prefix
(e.g. all `fusion.123` variants together) and by named-scope landmark if
the long_name carries one.

This is the ONLY reliable stage attribution on the remote-TPU tunnel —
wall-clock timing of individual stages is noise (see docs/PERFORMANCE.md).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def newest_trace(path):
    if os.path.isfile(path):
        return path
    cands = glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    if not cands:
        sys.exit(f"no *.trace.json.gz under {path}")
    return max(cands, key=os.path.getmtime)


def load_events(fn):
    with gzip.open(fn, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # device pids: process_name metadata mentioning TPU
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    return [
        e
        for e in events
        if e.get("ph") == "X" and e.get("pid") in device_pids and "dur" in e
    ]


_FUSION_RE = re.compile(r"\.\d+$")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default="/tmp/fccf_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true",
                    help="bucket by op-name prefix (strip trailing .N)")
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by this many profiled steps")
    ap.add_argument("--describe", metavar="OPNAME",
                    help="print the full long_name of this op (e.g. "
                         "'%%while.354') — while/call ops often carry their "
                         "loop-state shapes there, which identifies the "
                         "source loop (round 3: the two big heritage whiles "
                         "were attributed to the label-prop convergence "
                         "loops by their f32[.,V,16] stats operands)")
    args = ap.parse_args()

    fn = newest_trace(args.path)
    print(f"# {fn}", file=sys.stderr)
    events = load_events(fn)
    if args.describe:
        want = args.describe.lstrip("%")
        seen = set()
        for e in events:
            if e["name"].lstrip("%") == want:
                ln = e.get("args", {}).get("long_name", "<no long_name>")
                if ln not in seen:
                    seen.add(ln)
                    print(ln)
        if not seen:
            print(f"no event named {args.describe!r}", file=sys.stderr)
        return
    total = sum(e["dur"] for e in events)

    by_op = collections.Counter()
    counts = collections.Counter()
    for e in events:
        name = e.get("args", {}).get("long_name") or e["name"]
        name = name.split(" ")[0]
        if name.startswith("jit_"):  # umbrella module event double-counts
            total -= e["dur"]
            continue
        if args.group:
            name = _FUSION_RE.sub("", name)
        by_op[name] += e["dur"]
        counts[name] += 1

    steps = args.steps or 1
    print(f"{'us/step':>12} {'%':>6} {'count':>6}  op")
    for name, dur in by_op.most_common(args.top):
        print(f"{dur / steps:12.0f} {100 * dur / total:6.2f} {counts[name]:6d}  {name[:110]}")
    print(f"{total / steps:12.0f} {100.0:6.2f} {'':6}  TOTAL device time")


if __name__ == "__main__":
    main()
