"""Label-propagation schedule simulator: calls-to-convergence per
(sweeps_per_call, jump_rounds) on REAL scene affinity graphs.

The Pallas label-prop kernel (ops/pallas/label_prop.py) runs a fixed
number of Gauss-Seidel sweeps per call inside a convergence while-loop,
with path-halving "jump" rounds between calls. Any schedule reaches the
identical fixpoint (the loop only stops when a full sweep is a no-op),
so the schedule is purely a cost trade: sweeps are O(occupied^2) kernel
work, jumps are V-wide random gathers (~10 ns/element on v5e — a
measurable cost at building-scale V, and pass 2 pays full static V
despite its tiny occupancy bound).

This tool replays the kernel's exact schedule semantics (BI=128 row
blocks, `changed` sampled on the last sweep of a call) in NumPy on the
affinity graph of a chosen scene family and reports calls/sweeps/jumps
per schedule. It's how the jump_rounds=2 default was chosen: on heritage
courtyards (V=11264, 5.3-7.9k occupied) and structured stairs/halls,
call counts were IDENTICAL for J in {1, 2, 4, 8} and only +1 at J=0 —
the affinity components are near-cliques (coplanar voxels are mutually
affine at any distance), so chains that would need deep path-halving
never form.

Usage:
    python tools/convergence_sim.py --model heritage --scene courtyard \
        --scene-kw density=14.0,clutter_points=8000,noise=0.015 \
        --pair-kw max_angle_deg=40.0,max_trans=8.0,dropout=0.25 --seeds 3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

BIG = 2**30
BI = 128  # kernel i-block (ops/pallas/label_prop.py)

SCHEDULES = [(2, 8), (2, 4), (2, 2), (2, 1), (2, 0),
             (3, 0), (3, 1), (4, 0), (1, 2), (1, 4)]


def simulate(aff, valid, sweeps, jumps, max_calls=32):
    """Replay the kernel schedule; return (labels, calls)."""
    V = aff.shape[0]
    labels = np.where(valid, np.arange(V), BIG).astype(np.int64)

    def one_call(labels):
        changed_last = False
        for s in range(sweeps):
            changed = False
            for i0 in range(0, V, BI):
                rows = slice(i0, i0 + BI)
                cand = np.where(aff[rows], labels[None, :], BIG).min(axis=1)
                new = np.minimum(labels[rows], cand)
                if np.any(new != labels[rows]):
                    changed = True
                labels[rows] = new
            if s == sweeps - 1:
                changed_last = changed
        return labels, changed_last

    def jump(labels):
        for _ in range(jumps):
            labels = np.minimum(labels, labels[np.minimum(labels, V - 1)])
            labels = np.where(valid, labels, BIG)
        return labels

    labels, changed = one_call(labels)
    calls = 1
    labels = jump(labels)
    while changed and calls < max_calls:
        labels, changed = one_call(labels)
        calls += 1
        labels = jump(labels)
    return labels, calls


def exact_components(aff, valid):
    V = aff.shape[0]
    labels = np.where(valid, np.arange(V), BIG).astype(np.int64)
    while True:
        cand = np.where(aff, labels[None, :], BIG).min(axis=1)
        new = np.where(valid, np.minimum(labels, cand), BIG)
        if np.array_equal(new, labels):
            return labels
        labels = new


def _kw(s):
    out = {}
    for item in filter(None, s.split(",")):
        k, v = item.split("=")
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="heritage")
    ap.add_argument("--scene", default="courtyard")
    ap.add_argument("--scene-kw", default="")
    ap.add_argument("--pair-kw", default="")
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fccf_pcr_tpu.features.faces import _pairwise_affinity
    from fccf_pcr_tpu.io import synthetic
    from fccf_pcr_tpu.models.fccf import get_model
    from fccf_pcr_tpu.ops import eigen3
    from fccf_pcr_tpu.ops.voxelize import downsample_and_voxelize
    from fccf_pcr_tpu.pipeline.register import pre_downsample

    model = get_model(args.model)
    params, caps = model.params, model.caps
    results = {}
    for seed in range(args.seeds):
        src, tar, _ = synthetic.make_pair(
            seed=seed, scene=args.scene, **_kw(args.scene_kw),
            **_kw(args.pair_kw),
        )
        for name, cloud in (("src", src), ("tar", tar)):
            p, m = synthetic.pad_points(cloud, caps.raw_points)
            pd, md, _ = pre_downsample(jnp.asarray(p), jnp.asarray(m),
                                       params, caps)
            down, dm, vs, pv, vstart = downsample_and_voxelize(
                pd, md, params.leaf_size, params.face_voxel_size,
                caps.max_voxels, wide_extent=caps.wide_extent,
            )
            normal, curvature = eigen3.plane_fit_from_cov(vs.cov)
            vvalid = (vs.valid & (vs.count > params.voxel_point_threshold)
                      & (curvature < params.curvature_threshold))
            total = jnp.sum((pv < caps.max_voxels).astype(jnp.float32))
            gc = jnp.sum(jnp.where((pv < caps.max_voxels)[:, None], down, 0.0),
                         axis=0) / jnp.maximum(total, 1.0)
            flip = jnp.sum((vs.centroid - gc[None]) * normal, axis=-1) < 0.0
            normal = jnp.where(flip[:, None], normal, -normal)
            aff = np.asarray(_pairwise_affinity(
                normal, vs.centroid, vvalid,
                params.normal_thresh1, params.l1, params.k1))
            valid = np.asarray(vvalid)
            gt = exact_components(aff, valid)
            print(f"seed {seed} {name}: V={aff.shape[0]} "
                  f"occ={int(valid.sum())}", flush=True)
            for sched in SCHEDULES:
                labels, calls = simulate(aff, valid, *sched)
                results.setdefault(sched, []).append(
                    (calls, np.array_equal(labels, gt)))

    print("\n(S sweeps/call, J jump rounds) -> calls, exact?")
    for (S, J) in sorted(results):
        rows = results[(S, J)]
        calls = [c for c, _ in rows]
        print(f"S={S} J={J}: calls={calls} sweeps_max={max(calls) * S} "
              f"jumps_max={max(calls) * J} exact={all(ok for _, ok in rows)}")


if __name__ == "__main__":
    main()
