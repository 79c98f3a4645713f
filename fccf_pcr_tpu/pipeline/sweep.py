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
):
    """Register a list of (src_points, tar_points) pairs.

    pairs: list of (np.ndarray (M,3), np.ndarray (K,3)).
    ground_truth: optional list of 4x4 arrays (src->tar).
    Returns (records, summary); writes JSONL to out_path if given.

    Checkpoint/resume: with ``out_path`` + ``resume``, per-pair records are
    appended as they complete and pairs already present in the file are
    skipped on restart — a long sweep survives preemption (SURVEY.md §5).
    """
    import os

    done: dict[int, dict] = {}
    if resume and out_path and os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "pair" in rec:
                    done[rec["pair"]] = rec
    from ..io.synthetic import pad_points
    from ..pipeline.metrics import registration_errors
    from ..pipeline.register import make_register_fn, pre_downsample

    devices = jax.devices()
    mesh = None
    if use_mesh and len(devices) > 1 and batch_size % len(devices) == 0:
        from ..parallel.mesh import make_mesh, make_sharded_register_fn

        mesh = make_mesh(devices)
        fn = make_sharded_register_fn(params, caps, mesh)
    else:
        fn = make_register_fn(params, caps, batched=True)

    # CLI-level first downsample (FCCF.cpp:1668-1678), raw-capacity in,
    # hot-pipeline capacity out (see register.pre_downsample). Built once:
    # a per-chunk lambda would recompile every batch. Truncation at either
    # capacity is surfaced in the per-pair records, never silent.
    pre = jax.jit(jax.vmap(lambda p, m: pre_downsample(p, m, params, caps)))

    records = list(done.values())
    total_time = 0.0
    n_done = 0
    out_f = open(out_path, "a") if out_path else None
    todo = [i for i in range(len(pairs)) if i not in done]
    for chunk_idx, chunk in enumerate(_chunk(todo, batch_size)):
        idxs = list(chunk)
        # pad the final chunk to the batch size (masked-out dummy pairs)
        pad_to = batch_size
        eff = idxs + [idxs[-1]] * (pad_to - len(idxs))
        sp, sm, tp, tm = [], [], [], []
        raw_ovf = []
        for i in eff:
            s, t = pairs[i]
            raw_ovf.append(
                len(s) > caps.raw_points or len(t) > caps.raw_points
            )
            a, b = pad_points(np.asarray(s, np.float32), caps.raw_points)
            c, d = pad_points(np.asarray(t, np.float32), caps.raw_points)
            sp.append(a); sm.append(b); tp.append(c); tm.append(d)
        sp, sm, tp, tm = map(np.stack, (sp, sm, tp, tm))
        sp, sm, s_ovf = pre(sp, sm)
        tp, tm, t_ovf = pre(tp, tm)
        pre_ovf = np.asarray(s_ovf) | np.asarray(t_ovf) | np.asarray(raw_ovf)

        t0 = time.time()
        res = fn(sp, sm, tp, tm)
        jax.block_until_ready(res)
        dt = time.time() - t0
        if chunk_idx > 0:  # exclude compile step from throughput
            total_time += dt
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
            if ground_truth is not None and ground_truth[i] is not None:
                rre, rte = registration_errors(
                    jnp.asarray(T[k]), jnp.asarray(ground_truth[i], jnp.float32)
                )
                rec["rre_deg"] = float(rre)
                rec["rte_m"] = float(rte)
            records.append(rec)
            if out_f is not None:
                out_f.write(json.dumps(rec) + "\n")
                out_f.flush()

    summary = {
        "n_pairs": len(pairs),
        "n_resumed": len(done),
        "pairs_per_sec": (n_done / total_time) if total_time > 0 else None,
        "n_devices": len(devices),
        "sharded": mesh is not None,
    }
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
