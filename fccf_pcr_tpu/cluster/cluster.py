"""Transform-hypothesis clustering.

Rebuild of ``transform_cluster`` (FCCF.cpp:1040-1231, C15) plus the rotation
averaging helper ``average_normal`` (FCCF.cpp:325-367, C6).

Reference semantics (order-dependent) preserved EXACTLY, but computed in
parallel:

  - <= 10 hypotheses of a type: pass through unclustered; 0 -> one identity
    representative (:1043-1063).
  - otherwise greedy leader clustering: walk hypotheses in order, skipping
    already-allocated seeds AND the final element (:1084 quirk: the last
    hypothesis never seeds); a seed's cluster is every hypothesis (allocated
    or not! :1093-1115 never re-checks is_allocate) within 0.8 m translation
    radius whose rotation is within 2 deg (angle between Q.x_hat images);
    members are marked allocated.
  - clusters sorted by size desc (stable), then emitted with the adaptive
    floor walk (:1126-1229): floor starts at the max size, each undersized
    cluster decrements the floor while fewer than cluster_num/2 reps are
    emitted; emission stops when the rep list exceeds cluster_num, the
    floor reaches < 2, or an undersized cluster is hit after cluster_num/2.
  - each emitted representative is (mean translation, axis-averaged
    rotation rebuilt via two Rodrigues steps) over its members.

TPU-native derivation of the seed set (replacing the reference's O(H^2)
*sequential* allocation loop): index i is a greedy seed iff

    seed_i = eligible_i  AND  NOT EXISTS j < i: seed_j AND adj(j, i)

because "allocated before i's turn" means exactly "covered by an earlier
seed's ball". Any fixpoint of this equation equals the sequential greedy
result (induction over i), and Jacobi iteration stabilizes positions in
order of their dependency depth, so ``lax.while_loop`` until no change is
exact — typically a handful of O(H^2) fused sweeps instead of H sequential
steps. Cluster membership/stats are then plain masked matmuls on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Capacities, FCCFParams
from ..hypotheses.transforms import Hypotheses
from ..ops import geometry
from ..ops.voxelize import compact

_XHAT = jnp.array([1.0, 0.0, 0.0])
_YHAT = jnp.array([0.0, 1.0, 0.0])


class Representatives(NamedTuple):
    """Per-type cluster representatives (type-major leading axis)."""

    quat: jax.Array   # (3, C, 4)
    t: jax.Array      # (3, C, 3)
    valid: jax.Array  # (3, C) bool


def geometric_adjacency(quat, t, params: FCCFParams):
    """(H, H) boolean ball adjacency shared by all types: translation
    within cluster_dist (radiusSearch gate, squared) AND rotation within
    cluster_angle (angle between Q.x_hat images, :1105-1110)."""
    H = quat.shape[0]
    px = geometry.quat_rotate(quat, jnp.broadcast_to(_XHAT, (H, 3)))
    py = geometry.quat_rotate(quat, jnp.broadcast_to(_YHAT, (H, 3)))
    cos_gate = jnp.cos(jnp.deg2rad(params.cluster_angle)).astype(t.dtype)
    r2 = params.cluster_dist * params.cluster_dist

    t2 = jnp.sum(t * t, axis=-1)
    d2 = t2[:, None] + t2[None, :] - 2.0 * (t @ t.T)
    cosm = jnp.clip(px @ px.T, -1.0, 1.0)
    adj = (d2 <= r2) & (cosm >= cos_gate)
    return adj, px, py


def _greedy_seeds(adj, mask, max_iters):
    """Exact greedy-leader seed set via Jacobi fixpoint (see module doc)."""
    H = mask.shape[0]
    idx = jnp.arange(H)
    last_idx = jnp.max(jnp.where(mask, idx, -1))
    eligible = mask & (idx != last_idx)
    lower = idx[:, None] < idx[None, :]  # [j, i]: j strictly before i
    madj = adj & mask[:, None] & mask[None, :]

    def cond(state):
        s, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        s, _, it = state
        covered = jnp.any(madj & s[:, None] & lower, axis=0)
        new = eligible & ~covered
        return new, jnp.any(new != s), it + 1

    s, _, _ = jax.lax.while_loop(
        cond, body, (eligible, jnp.bool_(True), jnp.int32(0))
    )
    return s


def _cluster_stats(adj, mask, t, px, py):
    """Per-slot cluster stats (valid only for seed rows): size, sums of
    member translations and rotated axes. Members = ball of the slot,
    restricted to this type's hypotheses (allocated-or-not, per the
    reference's overlap quirk)."""
    m = (adj & mask[:, None] & mask[None, :]).astype(t.dtype)
    size = jnp.sum(m, axis=1)
    stats = jnp.concatenate([t, px, py], axis=-1)  # (H, 9)
    sums = m @ stats
    return size, sums[:, 0:3], sums[:, 3:6], sums[:, 6:9]


def _emit_representatives(is_seed, size, tsum, xsum, ysum, cluster_num, caps):
    """Sorted emission with the adaptive floor walk (:1122-1229).

    Seed clusters are first compacted (sorted by size desc, stable) into
    ``max_clusters`` slots so the sequential walk is short; the walk itself
    is inherently order-dependent (the floor decrements as it goes), so it
    stays a scan — over max_clusters slots, not H.
    """
    H = is_seed.shape[0]
    key = jnp.where(is_seed, size, -1.0)
    order = jnp.lexsort((jnp.arange(H), -key))
    s_seed = is_seed[order]

    payload = jnp.concatenate(
        [size[:, None], tsum, xsum, ysum], axis=-1
    )[order]
    W = caps.max_clusters
    _, c_overflow, w_valid, w_payload = compact(s_seed, W, payload)
    w_size = w_payload[:, 0]

    floor0 = jnp.maximum(w_size[0], 0.0)

    def step(carry, x):
        emitted, floor, stop = carry
        seed, sz = x
        live = seed & ~stop
        big = sz >= floor
        emit = live & big
        emitted = emitted + emit.astype(jnp.int32)
        # break after push once the rep list exceeds cluster_num (:1208-1211)
        stop_after_push = emit & (emitted.astype(jnp.float32) > cluster_num)
        under_half = emitted.astype(jnp.float32) < (cluster_num / 2.0)
        dec = live & ~big & under_half
        floor = jnp.where(dec, floor - 1.0, floor)
        stop_floor = dec & (floor < 2.0)
        stop_half = live & ~big & ~under_half
        stop = stop | stop_after_push | stop_floor | stop_half
        return (emitted, floor, stop), emit

    (_, _, _), emit = jax.lax.scan(
        step, (jnp.int32(0), floor0, jnp.bool_(False)), (w_valid, w_size)
    )

    mean_t = w_payload[:, 1:4] / jnp.maximum(w_size[:, None], 1.0)
    nt1 = geometry.normalize(w_payload[:, 4:7])
    nt2 = geometry.normalize(w_payload[:, 7:10])
    R = geometry.rotation_from_two_axes(nt1, nt2)
    q = geometry.matrix_to_quat(R)

    C = caps.max_reps
    _, overflow, r_valid, r_q, r_t = compact(emit, C, q, mean_t)
    return r_valid, r_q, r_t, overflow | c_overflow


def _cluster_one_type(type_mask, hyp, adj, px, py, cluster_num, params, caps):
    C = caps.max_reps
    count = jnp.sum(type_mask)

    # Branch 1: pass-through (<=10) / identity (0) (:1043-1063).
    _, _, p_valid, p_q, p_t = compact(type_mask, C, hyp.quat, hyp.t)
    id_q = jnp.zeros((C, 4)).at[0, 0].set(1.0)
    id_t = jnp.zeros((C, 3))
    id_valid = jnp.zeros((C,), bool).at[0].set(True)
    small_valid = jnp.where(count == 0, id_valid, p_valid)
    small_q = jnp.where(count == 0, id_q, p_q)
    small_t = jnp.where(count == 0, id_t, p_t)

    # Branch 2: greedy clustering + emission.
    is_seed = _greedy_seeds(adj, type_mask, max_iters=adj.shape[0])
    size, tsum, xsum, ysum = _cluster_stats(adj, type_mask, hyp.t, px, py)
    g_valid, g_q, g_t, overflow = _emit_representatives(
        is_seed, size, tsum, xsum, ysum, cluster_num, caps
    )

    use_small = count <= params.cluster_count_threshold
    valid = jnp.where(use_small, small_valid, g_valid)
    q = jnp.where(use_small, small_q, g_q)
    t = jnp.where(use_small, small_t, g_t)
    return valid, q, t, overflow & ~use_small


def cluster_hypotheses(
    hyp: Hypotheses, params: FCCFParams, caps: Capacities
) -> Representatives:
    """Cluster the hypothesis pool per roughness type (driver :1437-1466).

    cluster budget per type: int(200 * count_type / count_total) (:1465).
    The geometric ball adjacency is computed once and shared by the three
    type lanes (types partition the hypothesis set).
    """
    adj, px, py = geometric_adjacency(hyp.quat, hyp.t, params)

    types = jnp.arange(3, dtype=jnp.int32)
    masks = hyp.valid[None, :] & (hyp.type_[None, :] == types[:, None])
    counts = jnp.sum(masks, axis=1).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(counts), 1.0)
    cluster_nums = jnp.floor(
        jnp.float32(params.select_cluster_number) * counts / total
    )

    valid, q, t, _ = jax.vmap(
        lambda m, cn: _cluster_one_type(m, hyp, adj, px, py, cn, params, caps)
    )(masks, cluster_nums)
    return Representatives(quat=q, t=t, valid=valid)
