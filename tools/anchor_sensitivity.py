"""Measure octree-anchoring sensitivity of the reference algorithm.

VERDICT r2 item 6: the NumPy twin (the stand-in for the un-buildable C++
reference) shares the pipeline's absolute-origin voxel anchoring, whereas
the reference anchors its PCL octrees at the cloud bounding box
(FCCF.cpp:475-479 face extraction, :792-796 fine verify).  This tool runs
the twin over the 5-family twin-sweep seed grid with BOTH anchorings and
quantifies how much the anchoring choice actually shifts (a) face
membership, (b) the final transform, and (c) success vs ground truth —
turning PARITY.md divergence 1 from an assertion into a measurement.

Membership comparison: each downsampled point is labeled with the face
that owns its voxel cell under each anchoring; agreement is the Rand
index over points labeled in both partitions (cells themselves cannot be
joined across anchors because the grids are shifted).

Usage: python tools/anchor_sensitivity.py [--families office,stairs,...]
       [--seeds 30-39] [--json OUT.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from fccf_pcr_tpu import registration_errors  # noqa: E402
from fccf_pcr_tpu.config import FCCFParams  # noqa: E402
from fccf_pcr_tpu.io import synthetic  # noqa: E402
from fccf_pcr_tpu.twin import twin  # noqa: E402

# Same scene grid as tests/test_twin_sweep.py (downscaled for twin speed).
FAMILIES = {
    "office": dict(
        scene=dict(points_per_plane=800, clutter_points=400,
                   room=(10.0, 8.0, 3.0)),
        pair=dict(),
    ),
    "apartment": dict(
        scene=dict(points_per_plane=1600, clutter_points=700,
                   room=(9.0, 7.0, 3.0)),
        pair=dict(),
    ),
    "cross-season": dict(
        scene=dict(points_per_plane=700, clutter_points=900,
                   room=(12.0, 8.0, 3.5)),
        pair=dict(dropout=0.4, max_angle_deg=55.0, max_trans=5.0),
    ),
    "stairs": dict(
        scene=dict(scene="stairs", points_per_plane=1200,
                   clutter_points=600),
        pair=dict(),
    ),
    "hall": dict(
        scene=dict(scene="hall", points_per_plane=1000, clutter_points=600,
                   hall=(12.0, 7.0, 4.0), n_pillars=3),
        pair=dict(),
    ),
}


def _point_labels(cloud, params, anchor):
    """face label per downsampled point under the given octree anchor
    (-1 = not on a selected face)."""
    faces, _, _ = twin.face_extrate(cloud, params, anchor=anchor)
    shift = cloud.min(axis=0) if anchor == "bbox" else 0.0
    cell_to_face = {}
    for fi, f in enumerate(faces):
        for mu, _, _ in f.voxels:
            c = tuple(
                np.floor((np.asarray(mu, np.float64) - shift)
                         / params.face_voxel_size).astype(np.int64)
            )
            cell_to_face[c] = fi
    keys = np.floor((cloud - shift) / params.face_voxel_size).astype(np.int64)
    return np.array(
        [cell_to_face.get(tuple(k), -1) for k in keys], dtype=np.int64
    )


def _rand_index(a, b):
    """Rand index between two labelings over rows labeled in both."""
    keep = (a >= 0) & (b >= 0)
    a, b = a[keep], b[keep]
    n = len(a)
    if n < 2:
        return 1.0, n
    # pair-counting via contingency table
    from collections import Counter

    nij = Counter(zip(a.tolist(), b.tolist()))
    ni = Counter(a.tolist())
    nj = Counter(b.tolist())
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    sum_ij = sum(c2(v) for v in nij.values())
    sum_i = sum(c2(v) for v in ni.values())
    sum_j = sum(c2(v) for v in nj.values())
    total = c2(n)
    agree = total + 2 * sum_ij - sum_i - sum_j
    return agree / total, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--seeds", default="30-39")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.seeds.split("-"))
    seeds = range(lo, hi + 1)
    params = FCCFParams()
    out = open(args.json, "a") if args.json else None

    for fam in args.families.split(","):
        cfg = FAMILIES[fam]
        rows = []
        for s in seeds:
            src, tar, T_gt = synthetic.make_pair(seed=s, **cfg["scene"],
                                                 **cfg["pair"])
            cloud_t = twin.voxel_grid_downsample(
                tar[np.isfinite(tar).all(1)], params.leaf_size)
            la = _point_labels(cloud_t, params, "origin")
            lb = _point_labels(cloud_t, params, "bbox")
            rand, n_both = _rand_index(la, lb)
            cov_a = float((la >= 0).mean())
            cov_b = float((lb >= 0).mean())

            T_a = twin.register_pair(src, tar, params, anchor="origin")
            T_b = twin.register_pair(src, tar, params, anchor="bbox")
            rre_ab, rte_ab = registration_errors(T_b, T_a)
            rre_a, rte_a = registration_errors(T_a, T_gt)
            rre_b, rte_b = registration_errors(T_b, T_gt)
            ok_a = rre_a < 2.0 and rte_a < 0.5
            ok_b = rre_b < 2.0 and rte_b < 0.5
            rec = dict(
                family=fam, seed=s, rand_index=float(rand),
                n_joint_pts=int(n_both), face_cover_origin=cov_a,
                face_cover_bbox=cov_b, rre_bbox_vs_origin=float(rre_ab),
                rte_bbox_vs_origin=float(rte_ab), ok_origin=bool(ok_a),
                ok_bbox=bool(ok_b), rre_origin=float(rre_a),
                rte_origin=float(rte_a), rre_bbox=float(rre_b),
                rte_bbox=float(rte_b),
            )
            rows.append(rec)
            print(json.dumps(rec), flush=True)
            if out:
                out.write(json.dumps(rec) + "\n")
                out.flush()
        ri = [r["rand_index"] for r in rows]
        agree_T = sum(
            r["rre_bbox_vs_origin"] < 1.5 and r["rte_bbox_vs_origin"] < 0.3
            for r in rows if r["ok_origin"] and r["ok_bbox"]
        )
        both_ok = sum(r["ok_origin"] and r["ok_bbox"] for r in rows)
        print(
            f"[{fam}] rand_index mean={np.mean(ri):.4f} "
            f"min={np.min(ri):.4f}; ok origin="
            f"{sum(r['ok_origin'] for r in rows)}/{len(rows)} bbox="
            f"{sum(r['ok_bbox'] for r in rows)}/{len(rows)}; transform "
            f"agreement where both ok: {agree_T}/{both_ok}",
            flush=True,
        )
    if out:
        out.close()


if __name__ == "__main__":
    main()
