"""On-chip success-vs-overlap sweep (VERDICT r4 item 7).

The reference's RESSO scenes are PARTIAL-overlap registrations
(BASELINE.md Tables II-III); the synthetic families were generous-overlap
until io/synthetic.py grew the ``overlap`` parameter. This sweeps
overlap in {0.3, 0.5, 0.7, 1.0} over the office (indoor) and resso
(building-exterior) families in ONE process — params/caps/shapes are
identical across overlap levels, so each config compiles once and every
level reuses the jit cache. T_gt per seed is identical across levels by
construction (independent windowing rng), so the curves are paired.

Runs as a tools/tpu_ab.py probe step; full records append to
``tpu_eval_results.jsonl``; the probe tail carries the curve summary for
docs/EVALUATION.md.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tpu_eval_results.jsonl")

SEEDS = int(os.environ.get("FCCF_OVERLAP_EVAL_SEEDS", "24"))
CONFIGS = ("office", "resso")
OVERLAPS = (1.0, 0.7, 0.5, 0.3)  # full-overlap anchor first (jit warmup)


def main():
    import bench
    from tools.evaluate import evaluate_config

    rows = []
    with open(OUT, "a") as f:
        for name in CONFIGS:
            for ov in OVERLAPS:
                cfg = bench.CONFIGS[name]
                cfg = {**cfg, "pair": {**cfg["pair"], "overlap": ov}}
                t0 = time.time()
                r = evaluate_config(
                    name, cfg, SEEDS, cfg.get("batch", 8),
                    escalate_caps="auto",
                )
                rec = {k: v for k, v in r.items() if k != "seed_rows"}
                rec.update(step="overlap_eval", overlap=ov,
                           elapsed_s=round(time.time() - t0, 1),
                           seed_rows=r["seed_rows"])
                f.write(json.dumps(rec) + "\n")
                f.flush()
                rows.append(rec)
                print(f"[{name} overlap={ov}] success={r['success']:.2f} "
                      f"rre mean/p95 {r['rre_mean']:.3f}/{r['rre_p95']:.3f} "
                      f"rte mean/p95 {r['rte_mean']:.4f}/{r['rte_p95']:.4f} "
                      f"fails={r['fail_seeds']}", flush=True)
    # curve summary (the probe tail the runner records)
    for name in CONFIGS:
        pts = [
            f"{r['overlap']:.1f}:{100 * r['success']:.0f}%"
            for r in rows if r["config"] == name
        ]
        print(f"CURVE {name}: success @ overlap " + " ".join(pts),
              flush=True)


if __name__ == "__main__":
    main()
