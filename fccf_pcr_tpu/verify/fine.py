"""Fine verification: voxel-occupancy overlap score on the residual clouds.

Rebuild of ``fine_verify`` (FCCF.cpp:785-839, C12): fuse the source residual
cloud (label 0) with the transformed target residual cloud (label 1), voxel
at 0.5 m, and for every voxel holding both labels add
(s + t) * min(s,t)/max(s,t); score = sum / total points.

TPU redesign (no octree, no per-candidate tree build):
  - residual points are compacted once per pair into fixed-capacity arrays;
  - voxel cells are absolute-anchored ``floor(p / res)`` packed into one
    int32 key (11+10+10 bits with wraparound — exact for scenes under
    ~1024 x 512 x 512 m, far beyond the ETH scenes);
  - the *source* cloud never moves across candidates, so its (sorted unique
    key, count) table is built once; each candidate only sorts its own
    transformed target keys and joins against the source table with a
    vectorized binary search (jnp.searchsorted).

The denominator ``allinvec`` (:829) sums every occupied voxel's points,
i.e. exactly the total number of fused points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Capacities, FCCFParams

_SENTINEL = jnp.int32(2**31 - 1)


def _pack_keys(points, mask, res):
    k = jnp.floor(points / res).astype(jnp.int32)
    kx = (k[..., 0] + (1 << 20)) & 2047   # 11 bits
    ky = (k[..., 1] + (1 << 20)) & 1023   # 10 bits
    kz = (k[..., 2] + (1 << 20)) & 1023   # 10 bits
    key = (kx << 20) | (ky << 10) | kz
    return jnp.where(mask, key, _SENTINEL)


def _unique_counts(keys, cap):
    """Sorted unique keys + counts (fixed capacity, sentinel-padded).

    Scatter-free: the k-th unique key and its run length come from binary
    searches over the sorted key array (run starts = positions where the
    0-based unique rank equals k)."""
    s = jnp.sort(keys)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    first = first & (s != _SENTINEL)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # 0-based unique rank
    seg = jnp.where(s != _SENTINEL, jnp.minimum(seg, cap), cap)
    # run boundaries of each unique value (seg is nondecreasing)
    bounds = jnp.searchsorted(seg, jnp.arange(cap + 1, dtype=jnp.int32))
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.float32)
    start = jnp.minimum(bounds[:-1], s.shape[0] - 1)
    ukeys = jnp.where(counts > 0, s[start], _SENTINEL)
    return ukeys, counts


class SourceTable(NamedTuple):
    keys: jax.Array    # (Vf,) sorted unique voxel keys (sentinel padded)
    counts: jax.Array  # (Vf,) float counts
    n_src: jax.Array   # () total source residual points


def build_source_table(src_pts, src_mask, params: FCCFParams, caps: Capacities):
    keys = _pack_keys(src_pts, src_mask, params.fine_voxel)
    ukeys, counts = _unique_counts(keys, caps.max_fine_voxels)
    return SourceTable(
        keys=ukeys, counts=counts, n_src=jnp.sum(src_mask.astype(jnp.float32))
    )


def fine_verify(T, table: SourceTable, tar_pts, tar_mask, params, caps):
    """Score one candidate transform (:785-839). Returns the scalar score.

    Sort-free per candidate: only voxels holding BOTH labels contribute
    (:830), and those are a subset of the source voxels — so each
    transformed target point just binary-searches the static source table
    and a scatter-add accumulates per-source-voxel target counts. Exactly
    the reference's score, with no per-candidate octree/sort.
    """
    R = T[:3, :3]
    t = T[:3, 3]
    tar_t = tar_pts @ R.T + t
    keys = _pack_keys(tar_t, tar_mask, params.fine_voxel)

    Vf = table.keys.shape[0]
    pos = jnp.minimum(jnp.searchsorted(table.keys, keys), Vf - 1)
    hit = (table.keys[pos] == keys) & tar_mask
    tt = jax.ops.segment_sum(
        hit.astype(jnp.float32), jnp.where(hit, pos, Vf), num_segments=Vf + 1
    )[:Vf]

    s = table.counts
    both = (s >= 1.0) & (tt >= 1.0)
    mn = jnp.minimum(s, tt)
    mx = jnp.maximum(s, tt)
    similar = jnp.sum(jnp.where(both, (s + tt) * mn / jnp.maximum(mx, 1.0), 0.0))
    total = table.n_src + jnp.sum(tar_mask.astype(jnp.float32))
    return similar / jnp.maximum(total, 1.0)
