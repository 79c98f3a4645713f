"""Quick (coarse) verification: plane-overlap scoring + refinement trigger.

Rebuild of ``quick_verify`` (FCCF.cpp:680-783, C11): transform the target
faces, find coplanar source-target face pairs (angle < 10 deg and plane
offset difference < 2 m), keep the best candidate per source face by
min/max size ratio, refine the transform when >= 4 pairs matched
(composing T <- DeltaT @ T), and return the sum of pair importances
(2*min / (sum sizes)).

TPU form: one (F1 x F2) predicate tensor + masked argmax per source face;
vmapped by the caller over all cluster representatives of all types.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FCCFParams
from ..features.faces import Faces
from ..ops import geometry
from ..refine.gauss_newton import refine_pairs


def quick_verify(T, f1: Faces, f2: Faces, params: FCCFParams):
    """Returns (T_refined, score, n_pairs). T is 4x4; faces2 are transformed
    by it (with normals) exactly like transformPointCloudWithNormals
    (:712)."""
    R = T[:3, :3]
    t = T[:3, 3]
    c2t = f2.centroid @ R.T + t
    n2t = f2.normal @ R.T

    size1 = jnp.sum(jnp.where(f1.valid, f1.point_size, 0.0))
    size2 = jnp.sum(jnp.where(f2.valid, f2.point_size, 0.0))

    ang = geometry.angle_deg(f1.normal[:, None, :], n2t[None, :, :])
    d1 = jnp.sum(f1.normal * f1.centroid, axis=-1)
    d2 = jnp.sum(n2t * c2t, axis=-1)
    dist = jnp.abs(d1[:, None] - d2[None, :])
    cand = (
        f1.valid[:, None]
        & f2.valid[None, :]
        & (ang < params.qv_angle)
        & (dist < params.qv_dist)
    )

    ratio = jnp.minimum(f1.point_size[:, None], f2.point_size[None, :]) / jnp.maximum(
        jnp.maximum(f1.point_size[:, None], f2.point_size[None, :]), 1e-12
    )
    # First strictly-best candidate per source face (:742-755: strict >,
    # so ties keep the earliest index — argmax does the same).
    best_j = jnp.argmax(jnp.where(cand, ratio, -1.0), axis=1)
    pair_valid = jnp.any(cand, axis=1) & f1.valid

    min_sz = jnp.minimum(f1.point_size, f2.point_size[best_j])
    importance = jnp.where(
        pair_valid, 2.0 * min_sz / jnp.maximum(size1 + size2, 1e-12), 0.0
    )
    n_pairs = jnp.sum(pair_valid)
    score = jnp.sum(importance)

    # Refinement on the matched pairs when >= required_optimize (:772-776).
    dT = refine_pairs(
        n1=f1.normal,
        p1=f1.centroid,
        n2=n2t[best_j],
        p2=c2t[best_j],
        w=importance,
        iters=params.refine_iters,
    )
    T_ref = dT @ T
    do_refine = n_pairs >= params.required_optimize
    T_out = jnp.where(do_refine, T_ref, T)
    return T_out, score, n_pairs
