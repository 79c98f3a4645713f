"""On-chip accuracy A/B for ``refine_fine_guard`` under the 0.005 gate.

VERDICT r4 item 5: the guard's throughput price is measured (-1.6%
structured / -3.7% heritage) but its accuracy effect was only ever
measured under the OLD 0.05 curvature gate (where it traded RRE for RTE,
docs/PARITY.md divergence 8). This runs the staged A/B: structured +
heritage, 40 seeds, guard off vs on, in ONE process (the off-config
compile is reused across configs; guard on recompiles once per config).

Decision rule (the repo's measure-or-delete discipline): adopt only if
the guard improves RRE or RTE p95 on either family beyond noise WITHOUT
degrading the other metric; otherwise delete the knob + margin field +
the dual-score branch (pipeline/register.py).

Runs as a tools/tpu_ab.py probe step; full records append to
``tpu_eval_results.jsonl`` (the 800-char probe tail only carries the
summary verdict).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tpu_eval_results.jsonl")

SEEDS = int(os.environ.get("FCCF_GUARD_EVAL_SEEDS", "40"))
CONFIGS = ("structured", "heritage")


def main():
    import bench
    from tools.evaluate import evaluate_config

    rows = []
    with open(OUT, "a") as f:
        for guard in (False, True):
            for name in CONFIGS:
                cfg = bench.CONFIGS[name]
                t0 = time.time()
                # both arms pinned explicitly (None would mean "preset
                # default", which is exactly what this A/B may change)
                r = evaluate_config(
                    name, cfg, SEEDS, cfg.get("batch", 8),
                    refine_fine_guard=guard,
                    escalate_caps="auto",
                )
                rec = {k: v for k, v in r.items() if k != "seed_rows"}
                rec.update(step="guard_eval", guard=guard,
                           elapsed_s=round(time.time() - t0, 1),
                           seed_rows=r["seed_rows"])
                f.write(json.dumps(rec) + "\n")
                f.flush()
                rows.append(rec)
                print(f"[{name} guard={guard}] success={r['success']:.2f} "
                      f"rre mean/p95 {r['rre_mean']:.3f}/{r['rre_p95']:.3f} "
                      f"rte mean/p95 {r['rte_mean']:.4f}/{r['rte_p95']:.4f}",
                      flush=True)
    # verdict summary (the probe tail the runner records)
    for name in CONFIGS:
        off = next(r for r in rows if r["config"] == name and not r["guard"])
        on = next(r for r in rows if r["config"] == name and r["guard"])
        print(
            f"VERDICT {name}: rre_mean {off['rre_mean']:.3f}->"
            f"{on['rre_mean']:.3f} rre_p95 {off['rre_p95']:.3f}->"
            f"{on['rre_p95']:.3f} rte_p95 {off['rte_p95']:.4f}->"
            f"{on['rte_p95']:.4f} success {off['success']:.2f}->"
            f"{on['success']:.2f}", flush=True,
        )


if __name__ == "__main__":
    main()
