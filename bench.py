"""Benchmark: ETH-like scan pairs registered per second on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference registers ETH "Office" in 0.0659 s single-thread
(BASELINE.md Table I) => 15.17 pairs/s. The driver-set target is >= 50
pairs/s on one v5e chip (BASELINE.json). No ETH data ships in this
environment (zero egress), so the workload is synthetic structured scenes
with ETH-like statistics: ~60k downsampled points/cloud at 0.1 m leaf,
~900 occupied 1 m feature voxels, 16 faces — the same tensor shapes the
real dataset would produce. Accuracy is sanity-checked against the known
ground-truth transforms (stderr); the timed region is the steady-state
batched registration step only (compile excluded, like the reference's
in-pipeline clock at FCCF.cpp:1681-1685).
"""

import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 1.0 / 0.0659  # reference Office time, Table I


def main():
    import jax
    import jax.numpy as jnp

    from fccf_pcr_tpu import FCCFParams, make_register_fn, registration_errors
    from fccf_pcr_tpu.config import Capacities
    from fccf_pcr_tpu.io import synthetic

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    B = 8  # pairs per batched step
    caps = Capacities(
        max_points=1 << 17,
        max_voxels=2048,
        max_matches=2048,
        max_hypotheses=8192,
        max_reps=256,
        max_residual=1 << 15,
        max_fine_voxels=1 << 14,
    )
    params = FCCFParams(leaf_size=0.1)

    t0 = time.time()
    pairs = [
        synthetic.make_pair(
            seed=s, points_per_plane=12000, clutter_points=4000, noise=0.004
        )
        for s in range(B)
    ]
    sp = np.stack([synthetic.pad_points(p[0], caps.max_points)[0] for p in pairs])
    sm = np.stack([synthetic.pad_points(p[0], caps.max_points)[1] for p in pairs])
    tp = np.stack([synthetic.pad_points(p[1], caps.max_points)[0] for p in pairs])
    tm = np.stack([synthetic.pad_points(p[1], caps.max_points)[1] for p in pairs])
    T_gt = np.stack([p[2] for p in pairs])
    print(f"# data gen: {time.time() - t0:.1f}s", file=sys.stderr)

    fn = make_register_fn(params, caps, batched=True)

    # Pin inputs on device: the registration step is timed as a resident
    # pipeline stage (re-uploading 27 MB of inputs per step through the
    # remote-TPU tunnel would otherwise dominate the wall clock).
    sp, sm, tp, tm = map(jax.device_put, (sp, sm, tp, tm))

    t0 = time.time()
    res = fn(sp, sm, tp, tm)
    jax.block_until_ready(res)
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
    rre, rte = np.asarray(rre), np.asarray(rte)
    print(
        f"# accuracy: RRE mean {rre.mean():.4f} deg max {rre.max():.4f}; "
        f"RTE mean {rte.mean():.4f} m max {rte.max():.4f}; "
        f"status {np.asarray(res.status).tolist()}",
        file=sys.stderr,
    )
    ok = (rre < 2.0).all() and (rte < 0.3).all()
    if not ok:
        print("# WARNING: accuracy check failed on synthetic pairs", file=sys.stderr)

    # steady state
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        res = fn(sp, sm, tp, tm)
    jax.block_until_ready(res)
    dt = (time.time() - t0) / iters
    pairs_per_s = B / dt
    print(f"# steady step: {dt * 1e3:.1f} ms for {B} pairs", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scan_pairs_registered_per_sec_per_chip",
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
