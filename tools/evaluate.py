"""Accuracy evaluation sweep — the framework's analog of the reference's
published result tables (BASELINE.md Tables I-III).

Registers N seeds per benchmark scene family against known ground truth
and reports success rate, RRE/RTE mean/median/p95, and throughput, as a
markdown table (stdout) suitable for docs/EVALUATION.md.

Usage:
    python tools/evaluate.py [--seeds N] [--configs office,apartment,...]
    python tools/evaluate.py --device cpu   # force CPU (slow, no TPU)
"""

import argparse
import sys
import time

import numpy as np


def evaluate_config(name, cfg, seeds, batch, rotation_gate=None,
                    escalate_caps=None, params_set=()):
    import jax

    from fccf_pcr_tpu import make_register_fn, registration_errors
    from fccf_pcr_tpu.io import synthetic
    from fccf_pcr_tpu.models.fccf import get_model
    from fccf_pcr_tpu.pipeline.register import pre_downsample
    from fccf_pcr_tpu.pipeline.sweep import ESCALATION_STATUS_MASK

    if "sequence" in cfg:
        raise ValueError(
            f"config '{name}' is a sequence-sweep throughput config; its "
            "scene family is evaluated via the office config"
        )
    import bench  # seed-to-scene assignment shared with the benchmark

    model = get_model(cfg["model"])
    params, caps = model.params, model.caps
    if rotation_gate is not None:
        params = params.replace(fuse_rotation_gate_deg=rotation_gate)
    for ov in params_set:  # generic FCCFParams override, same as bench.py
        key, _, val = ov.partition("=")
        cur = getattr(params, key)  # raises on unknown field
        params = params.replace(
            **{key: bench._coerce_like(cur, key, val, "--set")}
        )
    if escalate_caps == "auto":
        # per-config escalation partner: double every content-dependent
        # envelope bound of THIS preset (the registry presets run tight
        # lanes by design — see models/fccf.py tightcaps notes)
        from fccf_pcr_tpu.models.auto import auto_escalation_caps

        escalate_caps = auto_escalation_caps(caps)

    def run_seed_batches(seed_lists, stage_caps, timed):
        """Run batches of seeds at one capacity config; yields
        (seed, rre, rte, status) rows. ``timed`` accumulates throughput
        (first batch pays the compile, as in bench.py)."""
        nonlocal t_total, n_timed
        fn = make_register_fn(params, stage_caps, batched=True)
        pre = jax.jit(jax.vmap(
            lambda p, m: pre_downsample(p, m, params, stage_caps)
        ))
        for bi, ss in enumerate(seed_lists):
            ss_eff = list(ss) + [ss[-1]] * (batch - len(ss))
            pairs = bench.pairs_for_config(cfg, ss_eff)
            sp = np.stack([synthetic.pad_points(p[0], stage_caps.raw_points)[0] for p in pairs])
            sm = np.stack([synthetic.pad_points(p[0], stage_caps.raw_points)[1] for p in pairs])
            tp = np.stack([synthetic.pad_points(p[1], stage_caps.raw_points)[0] for p in pairs])
            tm = np.stack([synthetic.pad_points(p[1], stage_caps.raw_points)[1] for p in pairs])
            spd, smd, s_ovf = pre(sp, sm)
            tpd, tmd, t_ovf = pre(tp, tm)
            # raw-capacity truncation happens host-side in pad_points and
            # is invisible to pre_downsample's flag — check it here (the
            # sweep driver does the same, pipeline/sweep.py)
            raw_ovf = np.array([
                len(p[0]) > stage_caps.raw_points
                or len(p[1]) > stage_caps.raw_points
                for p in pairs
            ])
            pre_ovf = raw_ovf | np.asarray(s_ovf) | np.asarray(t_ovf)
            # Pin inputs on device and drain the async queue BEFORE the
            # clock starts, so the timed region measures the registration
            # step alone (same discipline as bench.py); without this the
            # pre_downsample dispatch and host->device transfers leak in.
            jax.block_until_ready((spd, smd, tpd, tmd))
            t0 = time.time()
            res = fn(spd, smd, tpd, tmd)
            jax.block_until_ready(res)
            dt = time.time() - t0
            if timed and bi > 0:  # first batch pays the compile
                t_total += dt
                n_timed += len(ss)
            T_gt = np.stack([p[2] for p in pairs])
            rre, rte = registration_errors(
                res.transform, T_gt.astype(np.float32)
            )
            st = np.asarray(res.status).copy()
            # preprocess truncation counts as a flagged pair (bit 1)
            st = np.where(pre_ovf, st | 1, st)
            for k, s in enumerate(ss):
                yield (s, float(np.asarray(rre)[k]),
                       float(np.asarray(rte)[k]), int(st[k]))

    t_total, n_timed = 0.0, 0
    rows = {}
    seed_lists = [
        list(range(b0, min(b0 + batch, seeds)))
        for b0 in range(0, seeds, batch)
    ]
    for s, rre, rte, st in run_seed_batches(seed_lists, caps, timed=True):
        rows[s] = (rre, rte, st)

    n_escalated = 0
    if escalate_caps is not None:
        # the mask already contains bit 1, which is also how preprocess
        # truncation is folded into evaluate statuses above
        flagged = sorted(
            s for s, (_, _, st) in rows.items()
            if st & ESCALATION_STATUS_MASK
        )
        if flagged:
            n_escalated = len(flagged)
            chunks = [
                flagged[i:i + batch] for i in range(0, len(flagged), batch)
            ]
            # escalation replaces the flagged seeds' rows (final status)
            for s, rre, rte, st in run_seed_batches(
                chunks, escalate_caps, timed=False
            ):
                rows[s] = (rre, rte, st)

    rres = [rows[s][0] for s in range(seeds)]
    rtes = [rows[s][1] for s in range(seeds)]
    statuses = [rows[s][2] for s in range(seeds)]

    rres, rtes = np.array(rres), np.array(rtes)
    ok = (rres < 2.0) & (rtes < 0.5)
    return {
        "config": name,
        "n": seeds,
        "success": float(ok.mean()),
        "rre_mean": float(rres[ok].mean()) if ok.any() else float("nan"),
        "rre_med": float(np.median(rres[ok])) if ok.any() else float("nan"),
        "rre_p95": float(np.percentile(rres[ok], 95)) if ok.any() else float("nan"),
        "rte_mean": float(rtes[ok].mean()) if ok.any() else float("nan"),
        "rte_med": float(np.median(rtes[ok])) if ok.any() else float("nan"),
        "rte_p95": float(np.percentile(rtes[ok], 95)) if ok.any() else float("nan"),
        "fail_seeds": [int(i) for i in np.flatnonzero(~ok)],
        "nonzero_status": int(np.count_nonzero(statuses)),
        # which seed raised which bits — saves a custom probe when a
        # flagged count appears (pipeline/register.py STATUS_* values)
        "flagged_seeds": {
            int(i): int(statuses[i]) for i in np.flatnonzero(statuses)
        },
        "pairs_per_s": (n_timed / t_total) if t_total > 0 else None,
        "n_escalated": n_escalated,
        # per-seed rows for tail attribution (--dump-seeds): which seeds
        # drive p95, and whether a variant helps exactly those seeds
        "seed_rows": {
            int(s): {"rre": rows[s][0], "rte": rows[s][1],
                     "status": rows[s][2]}
            for s in range(seeds)
        },
    }


def main():
    sys.path.insert(0, ".")
    import bench

    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=40)
    ap.add_argument("--batch", type=int, default=None,
                    help="pairs per step (default: the config's own batch)")
    ap.add_argument("--configs", default="office,apartment,cross-season")
    ap.add_argument("--device", default=None, choices=["cpu"])
    ap.add_argument(
        "--fuse-rotation-gate", type=float, default=None,
        help="override FCCFParams.fuse_rotation_gate_deg (degrees; "
        "0 = reference-faithful blind averaging)",
    )
    ap.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        dest="params_set",
        help="override any FCCFParams field for the sweep (repeatable; "
        "same contract as bench.py --params-set)",
    )
    ap.add_argument(
        "--pair-set", action="append", default=[], metavar="KEY=VALUE",
        dest="pair_set",
        help="override a make_pair kwarg for every config (repeatable; "
        "floats), e.g. --pair-set overlap=0.5 for the partial-overlap "
        "regime of the RESSO scenes (success-vs-overlap curves, "
        "docs/EVALUATION.md)",
    )
    ap.add_argument(
        "--dump-seeds", default=None, metavar="FILE",
        help="append one JSON line per config with the per-seed "
        "rre/rte/status rows (tail attribution across variants)",
    )
    ap.add_argument(
        "--escalate-caps", default=None, metavar="PRESET",
        help="re-run capacity-flagged seeds under this registry preset, "
        "or 'auto' to double each config's own envelope bounds "
        "(content-adaptive dual-capacity evaluation — lets presets run "
        "tight while keeping the sweep clean)",
    )
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    esc = None
    if args.escalate_caps == "auto":
        esc = "auto"  # resolved per config inside evaluate_config
    elif args.escalate_caps:
        from fccf_pcr_tpu.cli import _caps_preset

        esc = _caps_preset(args.escalate_caps)

    pair_set = {}
    for ov in args.pair_set:
        key, _, val = ov.partition("=")
        pair_set[key] = float(val)

    rows = []
    for name in args.configs.split(","):
        cfg = bench.CONFIGS[name]
        if pair_set:
            cfg = {**cfg, "pair": {**cfg["pair"], **pair_set}}
            name = name + "@" + ",".join(args.pair_set)
        batch = args.batch or cfg.get("batch", 8)
        r = evaluate_config(name, cfg, args.seeds, batch,
                            rotation_gate=args.fuse_rotation_gate,
                            escalate_caps=esc,
                            params_set=args.params_set)
        if args.dump_seeds:
            import json

            with open(args.dump_seeds, "a") as f:
                f.write(json.dumps({
                    "config": name,
                    "params_set": args.params_set,
                    "seed_rows": r["seed_rows"],
                }) + "\n")
        summary = {k: v for k, v in r.items() if k != "seed_rows"}
        print(f"# {summary}", file=sys.stderr)
        rows.append(r)

    print("| config | pairs | success | RRE mean/med/p95 (deg) | "
          "RTE mean/med/p95 (m) | pairs/s | flagged |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        pps = f"{r['pairs_per_s']:.1f}" if r["pairs_per_s"] else "—"
        print(
            f"| {r['config']} | {r['n']} | {100*r['success']:.0f}%"
            f"{' (fails: ' + str(r['fail_seeds']) + ')' if r['fail_seeds'] else ''} | "
            f"{r['rre_mean']:.3f} / {r['rre_med']:.3f} / {r['rre_p95']:.3f} | "
            f"{r['rte_mean']:.4f} / {r['rte_med']:.4f} / {r['rte_p95']:.4f} | "
            f"{pps} | {r['nonzero_status']} |"
        )


if __name__ == "__main__":
    main()
