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

import argparse
import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 1.0 / 0.0659  # reference Office time, Table I

# Coverage configurations mirroring BASELINE.json: each entry is
# (model preset, scene kwargs, pair kwargs). "office" is the headline
# config the driver records; the others exercise density / overlap /
# sweep coverage (run with --config NAME or --config all).
CONFIGS = {
    "office": dict(
        model="eth-office",
        scene=dict(points_per_plane=12000, clutter_points=4000, noise=0.004),
        pair=dict(),
    ),
    "apartment": dict(  # denser indoor: finer leaf, more voxel planes
        model="eth-apartment",
        scene=dict(
            points_per_plane=24000, clutter_points=8000, noise=0.003,
            room=(9.0, 7.0, 3.0),
        ),
        pair=dict(),
    ),
    "cross-season": dict(  # low overlap, heavy clutter (Gazebo/Wood proxy)
        model="eth-outdoor",
        scene=dict(points_per_plane=9000, clutter_points=12000, noise=0.01),
        pair=dict(dropout=0.45, max_angle_deg=60.0, max_trans=6.0),
    ),
    "structured": dict(  # ETH Stairs + Hauptgebaude proxy: one vmap batch
        model="eth-structured",  # mixing stair flights and building halls
        scenes=[
            dict(scene="stairs", points_per_plane=12000,
                 clutter_points=4000, noise=0.004),
            dict(scene="hall", points_per_plane=14000,
                 clutter_points=6000, noise=0.006),
        ],
        pair=dict(),
    ),
    "sweep": dict(  # full-sequence sweep proxy: consecutive pairs of a
        model="eth-office",  # drifting scan trajectory, batched 8/step
        sequence=dict(n_scans=17, step_angle_deg=12.0, step_trans=0.8,
                      points_per_plane=12000, clutter_points=4000,
                      noise=0.004),
        pair=dict(),
    ),
    "resso": dict(  # RESSO building-exterior proxy (~50 m extent, outdoor
        model="resso",  # noise, few very large planes; Table I scenes 6i-7e)
        scene=dict(scene="facade", density=18.0, clutter_points=6000,
                   noise=0.012),
        pair=dict(max_angle_deg=40.0, max_trans=6.0, dropout=0.25),
    ),
    "heritage": dict(  # Heritage proxy: >100 m courtyard, the reference's
        model="heritage",  # hardest published scene (2.66 s, Table I)
        scene=dict(scene="courtyard", density=14.0, clutter_points=8000,
                   noise=0.015),
        pair=dict(max_angle_deg=40.0, max_trans=8.0, dropout=0.25),
        # ~230k-point clouds. Batch 8 adopted round 5: the paired
        # same-window A/B measured 33.5 vs 31.8 pairs/s (+5.5%,
        # pair/heritage-b8, reproducing the staged probe's +4.9%) —
        # the wider vmap amortizes the serial while trip counts; 16
        # overshoots (-2.2%) and the other presets measured flat at 16.
        batch=8,
    ),
}


def pairs_for_config(cfg, seeds):
    """(src, tar, T_gt) pairs for a CONFIGS entry: one pair per seed;
    mixed-family configs round-robin the family by seed value. Shared
    with tools/evaluate.py so the seed-to-scene assignment cannot
    drift between the benchmark and the accuracy sweep."""
    from fccf_pcr_tpu.io import synthetic

    fams = cfg.get("scenes")
    return [
        synthetic.make_pair(
            seed=s,
            **(fams[s % len(fams)] if fams else cfg["scene"]),
            **cfg["pair"],
        )
        for s in seeds
    ]


# Per-config accuracy gates (max over the batch), sized ~3x the measured
# maxima (docs/PERFORMANCE.md) so a real regression cannot hide behind a
# loose global band: e.g. office measures RRE max 0.12 deg / RTE max
# 0.028 m — a 0.5 deg error there IS a regression even though it would
# pass the old global 2 deg gate. Configs absent here use the global
# fallback (2 deg / 0.3 m — also the evaluation success criterion).
GATES = {
    "office": (0.5, 0.08),
    "apartment": (0.5, 0.08),
    "structured": (2.0, 0.2),
    "cross-season": (1.0, 0.15),
    "sweep": (1.0, 0.15),
    "resso": (1.0, 0.25),
    "heritage": (1.5, 0.3),  # ref's own Heritage row: 0.72 deg / 0.27 m
}


def make_record(pairs_per_s, rre, rte, gate=(2.0, 0.3)):
    """Build the headline JSON record, gated on the accuracy check.

    A fast-but-wrong pipeline must not record a clean headline number: the
    metric value is zeroed when the ground-truth check fails, and the
    accuracy fields travel with the record either way.
    """
    rre, rte = np.asarray(rre), np.asarray(rte)
    ok = bool((rre < gate[0]).all() and (rte < gate[1]).all())
    record = {
        "metric": "scan_pairs_registered_per_sec_per_chip",
        "value": round(pairs_per_s, 3) if ok else 0.0,
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3) if ok else 0.0,
        "accuracy_ok": ok,
        "rre_mean_deg": round(float(rre.mean()), 4),
        "rte_mean_m": round(float(rte.mean()), 4),
    }
    if not ok:
        record["measured_pairs_per_s"] = round(pairs_per_s, 3)
    return record


def _coerce_like(cur, key, val, flag):
    """Parse ``val`` to the type of the current field value ``cur``
    (bool parsing is strict: a typo must not silently benchmark the
    opposite configuration)."""
    if isinstance(cur, bool):
        v = val.strip().lower()
        if v in ("1", "true", "yes", "on"):
            return True
        if v in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"{flag} {key}: not a boolean: {val!r}")
    if isinstance(cur, int):
        return int(val)
    if isinstance(cur, float):
        return float(val)
    raise ValueError(f"{flag} {key}: unsupported field type {type(cur)}")


def run_config(name, cfg, emit_json, caps_overrides=(), params_overrides=(),
               batch_override=None):
    import jax
    import jax.numpy as jnp

    from fccf_pcr_tpu import make_register_fn, registration_errors
    from fccf_pcr_tpu.io import synthetic
    from fccf_pcr_tpu.models.fccf import get_model

    dev = jax.devices()[0]
    print(f"# [{name}] device: {dev}", file=sys.stderr)

    B = batch_override or cfg.get("batch", 8)  # pairs per batched step
    model = get_model(cfg["model"])
    params, caps = model.params, model.caps
    for ov in caps_overrides:
        key, _, val = ov.partition("=")
        cur = getattr(caps, key)  # raises on unknown field
        caps = caps.replace(**{key: _coerce_like(cur, key, val, "--caps-set")})
    for ov in params_overrides:
        key, _, val = ov.partition("=")
        cur = getattr(params, key)  # raises on unknown field
        params = params.replace(
            **{key: _coerce_like(cur, key, val, "--params-set")}
        )
    if caps_overrides or params_overrides:
        print(f"# [{name}] overrides: caps={list(caps_overrides)} "
              f"params={list(params_overrides)}", file=sys.stderr)

    t0 = time.time()
    if "sequence" in cfg:
        # Consecutive pairs of one drifting trajectory (BASELINE config
        # 5): pair k registers scan k against scan k+1, processed as
        # multiple batched steps per timed iteration. Only FULL batches
        # are timed; a trailing partial batch is dropped with a notice
        # (size the config with n_scans = m*B + 1 to cover every pair).
        scans, T_rel, _ = synthetic.make_sequence(
            seed=0, **cfg["sequence"], **cfg["pair"]
        )
        pairs = [
            (scans[k], scans[k + 1], T_rel[k]) for k in range(len(T_rel))
        ]
        n_full = (len(pairs) // B) * B
        if n_full == 0:
            raise ValueError(
                f"[{name}] sequence yields {len(pairs)} pairs; need at "
                f"least one full batch of {B} (n_scans >= {B + 1})"
            )
        if n_full != len(pairs):
            print(
                f"# [{name}] note: timing first {n_full} of {len(pairs)} "
                "consecutive pairs (full batches only)", file=sys.stderr,
            )
        pairs = pairs[:n_full]
    else:
        # One pair per seed; mixed-family configs (BASELINE config 3:
        # Stairs + Hauptgebaude in one vmap batch) alternate by seed.
        pairs = pairs_for_config(cfg, range(B))
    nb = len(pairs) // B  # batched steps per timed iteration (1 except sweep)
    # pad_points subsamples host-side past raw capacity, invisibly to the
    # pre_downsample overflow assert below — a benchmark must measure the
    # configured workload, not a silent subsample of it
    raw_max = max(max(len(p[0]), len(p[1])) for p in pairs)
    assert raw_max <= caps.raw_points, (
        f"[{name}] raw clouds reach {raw_max} points > preset "
        f"max_raw_points={caps.raw_points}"
    )
    sp = np.stack([synthetic.pad_points(p[0], caps.raw_points)[0] for p in pairs])
    sm = np.stack([synthetic.pad_points(p[0], caps.raw_points)[1] for p in pairs])
    tp = np.stack([synthetic.pad_points(p[1], caps.raw_points)[0] for p in pairs])
    tm = np.stack([synthetic.pad_points(p[1], caps.raw_points)[1] for p in pairs])
    T_gt = np.stack([p[2] for p in pairs])
    print(f"# data gen: {time.time() - t0:.1f}s ({len(pairs)} pairs, "
          f"{nb} step(s)/iter)", file=sys.stderr)

    # CLI-level first downsample, OUTSIDE the timed region: the reference's
    # clock (FCCF.cpp:1681-1685) starts after main's VoxelGrid pass
    # (:1668-1678); the timed pipeline still re-downsamples internally
    # (:1377-1387), exactly like the reference.
    from fccf_pcr_tpu.pipeline.register import pre_downsample

    pre = jax.jit(jax.vmap(
        lambda p, m: pre_downsample(p, m, params, caps)
    ))
    t0 = time.time()
    sp, sm, s_ovf = pre(sp, sm)
    tp, tm, t_ovf = pre(tp, tm)
    jax.block_until_ready((sp, sm, tp, tm))
    print(f"# pre-downsample (untimed, as in reference main): "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    # A benchmark run on truncated clouds is not measuring the configured
    # workload — capacity misconfiguration must fail loudly, not skew the
    # number (same policy as the accuracy gate).
    assert not (np.asarray(s_ovf).any() or np.asarray(t_ovf).any()), (
        f"[{name}] preset max_points={caps.max_points} too small for the "
        "downsampled benchmark clouds"
    )

    fn = make_register_fn(params, caps, batched=True)

    # Pin inputs on device: the registration step is timed as a resident
    # pipeline stage (re-uploading 27 MB of inputs per step through the
    # remote-TPU tunnel would otherwise dominate the wall clock).
    batches = [
        tuple(
            jax.device_put(a[j * B:(j + 1) * B])
            for a in (sp, sm, tp, tm)
        )
        for j in range(nb)
    ]

    t0 = time.time()
    results = [fn(*b) for b in batches]
    jax.block_until_ready(results)
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    transforms = jnp.concatenate([r.transform for r in results])
    status = np.concatenate([np.asarray(r.status) for r in results])
    rre, rte = registration_errors(transforms, jnp.asarray(T_gt))
    rre, rte = np.asarray(rre), np.asarray(rte)
    print(
        f"# accuracy: RRE mean {rre.mean():.4f} deg max {rre.max():.4f}; "
        f"RTE mean {rte.mean():.4f} m max {rte.max():.4f}; "
        f"status {status.tolist()}",
        file=sys.stderr,
    )
    gate = GATES.get(name, (2.0, 0.3))
    if not bool((rre < gate[0]).all() and (rte < gate[1]).all()):
        print(f"# ERROR: accuracy check failed (gate RRE<{gate[0]} deg, "
              f"RTE<{gate[1]} m) — the throughput record below is marked "
              "accuracy_ok=false", file=sys.stderr)

    # steady state
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        for b in batches:
            res = fn(*b)
    jax.block_until_ready(res)
    dt = (time.time() - t0) / iters
    pairs_per_s = len(pairs) / dt
    print(f"# steady step: {dt * 1e3:.1f} ms for {len(pairs)} pairs",
          file=sys.stderr)

    record = make_record(pairs_per_s, rre, rte, gate=gate)
    if emit_json:
        print(json.dumps(record))
    else:
        print(f"# [{name}] {json.dumps(record)}", file=sys.stderr)
    return record


def _probe_backend(timeout_s: float = 120.0, attempts: int = 3,
                   backoff_s: float = 45.0):
    """Fail fast — but not on the FIRST failure — if the backend is gone.

    The remote-TPU tunnel can die outright (observed: relay port
    refused for hours); the first dispatch then blocks FOREVER inside
    backend init, recording nothing. A healthy tunnel completes this
    trivial op in seconds (full-pipeline compiles take ~40-60 s, but
    backend init + a scalar reduce is not that), so a generous bound
    only fires when the backend is genuinely gone.

    Round 4 lost its official headline to a TRANSIENT outage: one 180 s
    attempt, no retry, rc-134 at exit (BENCH_r04.json). This probe now
    mirrors the A/B runner's outer retry loop (commit b724acd): up to
    ``attempts`` bounded tries with a sleep between, and on final failure
    it exits via os._exit so the stuck PJRT-init daemon thread cannot
    abort CPython teardown (the rc-134 source) — the driver sees a clean
    exit 3 plus the explicit infra-failure record."""
    import threading

    import jax  # noqa: F401 — backend init happens on first dispatch
    import jax.numpy as jnp

    ok = []

    def work():
        ok.append(float(jnp.ones((8, 8)).sum()))

    for attempt in range(1, attempts + 1):
        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(timeout_s)
        if ok:
            return
        print(
            f"# WARNING: backend probe attempt {attempt}/{attempts} timed "
            f"out after {timeout_s:.0f}s (TPU tunnel down?)"
            + (f"; retrying in {backoff_s:.0f}s" if attempt < attempts
               else ""),
            file=sys.stderr, flush=True,
        )
        if attempt < attempts:
            time.sleep(backoff_s)
            # A previously-stuck dispatch can complete during the sleep
            # (tunnel came back) — count that as success.
            if ok:
                return
    print(
        f"# FATAL: backend unreachable ({attempts} probe attempts of "
        f"{timeout_s:.0f}s each) — no measurement taken",
        file=sys.stderr, flush=True,
    )
    # Emit an explicit infra-failure record (value 0, error field) so
    # a recorded-but-zero headline is distinguishable from both a
    # perf collapse (accuracy fields present, accuracy_ok) and a
    # silent crash (no record at all).
    print(json.dumps({
        "metric": "scan_pairs_registered_per_sec_per_chip",
        "value": 0.0,
        "unit": "pairs/s",
        "vs_baseline": 0.0,
        "error": "backend unreachable (TPU tunnel down); "
                 "no measurement taken",
    }), flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    # NOT SystemExit: interpreter teardown with a thread stuck inside
    # PJRT C++ init raises through ~thread and aborts (rc 134/-6, seen
    # in BENCH_r04.json and tpu_ab_results.jsonl base/structured).
    import os

    os._exit(3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", default="office", choices=[*CONFIGS, "all"],
        help="coverage configuration (default: the headline office config)",
    )
    ap.add_argument(
        "--caps-set", action="append", default=[], metavar="KEY=VALUE",
        help="override a Capacities field of the selected preset (e.g. "
             "--caps-set max_hypotheses=2048) — for on-chip capacity "
             "A/Bs without source edits; the accuracy gate still applies",
    )
    ap.add_argument(
        "--params-set", action="append", default=[], metavar="KEY=VALUE",
        help="override an FCCFParams field of the selected preset (e.g. "
             "--params-set curvature_threshold=0.05) — for on-chip parameter "
             "A/Bs without source edits; the accuracy gate still applies",
    )
    ap.add_argument(
        "--batch", type=int, default=None,
        help="override the config's pairs-per-step (batch-size A/B; the "
             "round-5 grid measured heritage's while-heavy profile "
             "+5.5% at 8 — now its default — and every preset flat or "
             "worse at 16)",
    )
    args = ap.parse_args()
    _probe_backend()
    if args.config == "all":
        for name, cfg in CONFIGS.items():
            run_config(name, cfg, emit_json=(name == "office"),
                       caps_overrides=args.caps_set,
                       params_overrides=args.params_set,
                       batch_override=args.batch)
    else:
        run_config(args.config, CONFIGS[args.config],
                   emit_json=(args.config == "office"),
                   caps_overrides=args.caps_set,
                   params_overrides=args.params_set,
                   batch_override=args.batch)


if __name__ == "__main__":
    main()
