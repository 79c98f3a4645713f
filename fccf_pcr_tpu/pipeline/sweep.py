"""Dataset sweep driver: batched registration of many scan pairs with
structured per-pair records.

Replaces the reference's external experiment scripting (the unused CSV
appender ``writefile``, FCCF.cpp:1610-1644, and the discarded clock at
:1681-1685) with first-class observability (SURVEY.md §5): every pair gets
a JSON record with the transform, scores, counts, status flags, RTE/RRE vs
ground truth when available, and wall-clock throughput.

Scales across chips by sharding the pair axis over a mesh
(parallel/mesh.py) when more than one device is visible.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from .register import (
    STATUS_FINE_OVERFLOW,
    STATUS_HYPOTHESIS_OVERFLOW,
    STATUS_REP_OVERFLOW,
    STATUS_RESIDUAL_OVERFLOW,
    STATUS_VOXEL_OVERFLOW,
)

# Status bits a larger-capacity recompile can actually clear (pipeline
# truncation, not geometry): everything except DEGENERATE (no type scored)
# and FINE_ALIAS (source-residual extent, independent of any capacity).
ESCALATION_STATUS_MASK = (
    STATUS_VOXEL_OVERFLOW
    | STATUS_HYPOTHESIS_OVERFLOW
    | STATUS_REP_OVERFLOW
    | STATUS_RESIDUAL_OVERFLOW
    | STATUS_FINE_OVERFLOW
)


def needs_escalation(record: dict) -> bool:
    """True when a sweep record shows a capacity hit a larger-caps re-run
    could clear (see ESCALATION_STATUS_MASK; preprocess truncation is a
    capacity hit too — max_raw_points / max_points)."""
    return bool(record.get("preprocess_overflow")) or bool(
        record["status"] & ESCALATION_STATUS_MASK
    )


def _chunk(lst, n):
    for i in range(0, len(lst), n):
        yield lst[i : i + n]


def run_sweep(
    pairs,
    params,
    caps,
    batch_size: int = 8,
    ground_truth=None,
    use_mesh: bool = True,
    out_path: str | None = None,
    resume: bool = True,
    escalate_caps=None,
):
    """Register a list of (src_points, tar_points) pairs.

    pairs: list of (np.ndarray (M,3), np.ndarray (K,3)).
    ground_truth: optional list of 4x4 arrays (src->tar).
    Returns (records, summary); writes JSONL to out_path if given.

    Checkpoint/resume: with ``out_path`` + ``resume``, per-pair records are
    appended as they complete and pairs already present in the file are
    skipped on restart — a long sweep survives preemption (SURVEY.md §5).

    Content-adaptive dual-capacity execution (``escalate_caps``): the
    fixed-shape pipeline sizes every stage bound at compile time, so the
    static policy (>=1.4x headroom over measured family maxima,
    models/fccf.py) makes EVERY pair pay wall-clock for content that occurs
    on a few. The reference never faces this: its std::vector stages grow
    per pair (FCCF.cpp throughout). Passing ``escalate_caps`` restores that
    elasticity at the session level — the sweep runs at the (tight) ``caps``
    first, then recompiles at ``escalate_caps`` and re-runs exactly the
    pairs whose records show a capacity hit (``needs_escalation``; the
    status contract guarantees every truncation raises its bit —
    tests/test_overflow.py forces each one). Escalated records replace the
    tight ones (keeping the tight status in ``status_tight``) and are
    re-appended to the JSONL, where resume's last-record-wins load order
    picks them up. The throughput summary counts each pair once (its tight
    run); escalation wall-clock adds to the measured time under the same
    first-batch-is-compile exclusion, so a single-chunk escalation (the
    expected rare-flagged-pair case) does not perturb the number.
    """
    import dataclasses
    import os

    if escalate_caps is not None:
        # Escalation must not shrink any bound: a SMALLER "escalation"
        # would truncate harder and replace good records with degraded
        # ones marked final.
        for f in dataclasses.fields(caps):
            if f.name == "max_raw_points":
                # 0 is a sentinel for "= max_points": compare effectives
                lo, hi = caps.raw_points, escalate_caps.raw_points
            else:
                lo = getattr(caps, f.name)
                hi = getattr(escalate_caps, f.name)
            if (hi < lo) if not isinstance(lo, bool) else (lo and not hi):
                raise ValueError(
                    f"escalate_caps.{f.name}={hi} is below the tight "
                    f"caps' {lo}; escalation capacities must dominate"
                )

    done: dict[int, dict] = {}
    if resume and out_path and os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                # pair indices past this invocation's list are another
                # sweep's records: including them would contaminate the
                # returned records and the RRE/RTE summary
                if "pair" in rec and rec["pair"] < len(pairs):
                    done[rec["pair"]] = rec
    from ..io.synthetic import pad_points
    from ..pipeline.metrics import registration_errors
    from ..pipeline.register import make_register_fn, pre_downsample

    devices = jax.devices()
    mesh = None
    use_mesh = use_mesh and len(devices) > 1 and batch_size % len(devices) == 0
    if use_mesh:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(devices)

    def build(stage_caps):
        """(pre, register) jitted at one capacity config; built once per
        config — a per-chunk lambda would recompile every batch."""
        if mesh is not None:
            from ..parallel.mesh import make_sharded_register_fn

            fn = make_sharded_register_fn(params, stage_caps, mesh)
        else:
            fn = make_register_fn(params, stage_caps, batched=True)
        # CLI-level first downsample (FCCF.cpp:1668-1678), raw-capacity in,
        # hot-pipeline capacity out (see register.pre_downsample).
        # Truncation at either capacity is surfaced in the per-pair
        # records, never silent. On a mesh the pair axis is sharded here
        # too — the raw clouds are the sweep's largest arrays, and an
        # unsharded pre would run its sort on one device and reshard the
        # outputs every batch.
        pre_v = jax.vmap(lambda p, m: pre_downsample(p, m, params, stage_caps))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            ds = NamedSharding(mesh, PartitionSpec("data"))
            pre = jax.jit(pre_v, in_shardings=(ds, ds), out_shardings=ds)
        else:
            pre = jax.jit(pre_v)
        return pre, fn

    # resume=False means exactly that: an existing file's records must
    # not survive (a later resume=True run would resurrect them)
    out_f = open(out_path, "a" if resume else "w") if out_path else None
    total_time = 0.0
    n_done = 0

    def run_pass(todo, stage_caps, escalated, tight_status=None):
        """One compiled pass over pair indices ``todo``; returns records."""
        nonlocal total_time, n_done
        pre, fn = build(stage_caps)
        pass_records = []
        for chunk_idx, chunk in enumerate(_chunk(todo, batch_size)):
            idxs = list(chunk)
            # pad the final chunk to the batch size (masked-out dummy pairs)
            eff = idxs + [idxs[-1]] * (batch_size - len(idxs))
            sp, sm, tp, tm = [], [], [], []
            raw_ovf = []
            for i in eff:
                s, t = pairs[i]
                raw_ovf.append(
                    len(s) > stage_caps.raw_points
                    or len(t) > stage_caps.raw_points
                )
                a, b = pad_points(
                    np.asarray(s, np.float32), stage_caps.raw_points
                )
                c, d = pad_points(
                    np.asarray(t, np.float32), stage_caps.raw_points
                )
                sp.append(a); sm.append(b); tp.append(c); tm.append(d)
            sp, sm, tp, tm = map(np.stack, (sp, sm, tp, tm))
            sp, sm, s_ovf = pre(sp, sm)
            tp, tm, t_ovf = pre(tp, tm)
            pre_ovf = (
                np.asarray(s_ovf) | np.asarray(t_ovf) | np.asarray(raw_ovf)
            )

            t0 = time.perf_counter()  # monotonic: NTP steps corrupt time.time
            res = fn(sp, sm, tp, tm)
            jax.block_until_ready(res)
            dt = time.perf_counter() - t0
            if chunk_idx > 0:  # exclude compile step from throughput
                total_time += dt
                if not escalated:  # escalated pairs already counted once
                    n_done += len(idxs)

            T = np.asarray(res.transform)
            for k, i in enumerate(idxs):
                rec = {
                    "pair": i,
                    "preprocess_overflow": bool(pre_ovf[k]),
                    "transform": T[k].tolist(),
                    "quick_score": np.asarray(res.quick_score[k]).tolist(),
                    "fine_score": np.asarray(res.fine_score[k]).tolist(),
                    "n_faces": np.asarray(res.n_faces[k]).tolist(),
                    "n_hypotheses": int(res.n_hypotheses[k]),
                    "status": int(res.status[k]),
                    "batch_time_s": dt,
                }
                if escalated:
                    rec["escalated"] = True
                    rec["status_tight"] = tight_status[i]
                if ground_truth is not None and ground_truth[i] is not None:
                    rre, rte = registration_errors(
                        jnp.asarray(T[k]),
                        jnp.asarray(ground_truth[i], jnp.float32),
                    )
                    rec["rre_deg"] = float(rre)
                    rec["rte_m"] = float(rte)
                pass_records.append(rec)
                if out_f is not None:
                    out_f.write(json.dumps(rec) + "\n")
                    out_f.flush()
        return pass_records

    try:
        todo = [i for i in range(len(pairs)) if i not in done]
        by_pair = dict(done)
        for rec in run_pass(todo, caps, escalated=False):
            by_pair[rec["pair"]] = rec

        n_escalated = 0
        if escalate_caps is not None:
            # include resumed records: a sweep interrupted between the
            # tight pass and the escalation pass still escalates on
            # restart (records already escalated once never re-run, even
            # if the large caps also truncated — that status is final)
            flagged = sorted(
                i
                for i, rec in by_pair.items()
                if needs_escalation(rec) and not rec.get("escalated")
            )
            n_escalated = len(flagged)
            tight = {i: by_pair[i]["status"] for i in flagged}
            for rec in run_pass(
                flagged, escalate_caps, escalated=True, tight_status=tight
            ):
                by_pair[rec["pair"]] = rec
    except BaseException:
        # the summary line marks a COMPLETED sweep; on failure just
        # release the handle (streamed records stay for resume)
        if out_f is not None:
            out_f.close()
        raise

    records = list(by_pair.values())
    summary = {
        "n_pairs": len(pairs),
        "n_resumed": len(done),
        # None (not 0.0) when nothing was timed past a compile chunk —
        # e.g. a resumed run that only escalates (n_done stays 0)
        "pairs_per_sec": (
            (n_done / total_time) if n_done > 0 and total_time > 0 else None
        ),
        "n_devices": len(devices),
        "sharded": mesh is not None,
    }
    if escalate_caps is not None:
        summary["n_escalated"] = n_escalated
    if ground_truth is not None and any("rre_deg" in r for r in records):
        rres = [r["rre_deg"] for r in records if "rre_deg" in r]
        rtes = [r["rte_m"] for r in records if "rte_m" in r]
        summary.update(
            rre_mean_deg=float(np.mean(rres)),
            rre_max_deg=float(np.max(rres)),
            rte_mean_m=float(np.mean(rtes)),
            rte_max_m=float(np.max(rtes)),
        )
    if out_f is not None:
        out_f.write(json.dumps({"summary": summary}) + "\n")
        out_f.close()
    records.sort(key=lambda r: r["pair"])
    return records, summary
