"""Voxel hashing, grouping and per-voxel statistics — the TPU replacement for
PCL's octree / VoxelGrid machinery.

The reference uses:
  - ``pcl::VoxelGrid`` downsampling (FCCF.cpp:1377-1387, :1668-1678)
  - ``pcl::octree::OctreePointCloudSearch`` voxel occupancy + per-voxel point
    lists for plane fitting (FCCF.cpp:475-534) and fine verification
    (FCCF.cpp:792-796)

On TPU there is no tree: voxelization is a hash -> sort -> segment-reduce
program over fixed-capacity arrays. Voxel cells are anchored at the absolute
origin (``floor(p / res)``), not at the cloud bounding box like PCL's octree;
this is a deliberate, documented divergence (deterministic, batch-friendly)
that only relabels cell boundaries.

Cell index packing: cells are ordered (kz, ky, kx) with kx fastest, mirroring
PCL VoxelGrid's leaf ordering. ky/kx are offset to [0, 65536) so a (hi, lo)
int32 pair is lexicographically sortable without int64.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_SENT = jnp.iinfo(jnp.int32).max

# Packed-key extent limits (cells): z-major like PCL leaf ordering.
_XBITS, _YBITS, _ZBITS = 11, 10, 10
_XMAX, _YMAX, _ZMAX = (1 << _XBITS) - 1, (1 << _YBITS) - 1, (1 << _ZBITS) - 2


class VoxelStats(NamedTuple):
    """Per-voxel plane statistics (fixed capacity V, masked)."""

    centroid: jax.Array  # (V, 3)
    cov: jax.Array       # (V, 3, 3) normalized covariance
    count: jax.Array     # (V,) int32 points in voxel
    valid: jax.Array     # (V,) bool occupied
    overflow: jax.Array  # () bool, more voxels than capacity


def _cell_keys(points, mask, res):
    """Single int32 sort key per point; invalid points sort last.

    Cells are absolute-anchored floor(p/res) but re-indexed relative to the
    cloud's min occupied cell, packed z-major (kz, ky, kx) into one int32 —
    one sort instead of a two-key lexsort. Extent limit: 2047 x 1023 x 1022
    cells (204 x 102 x 102 m at a 0.1 m leaf; clouds beyond that clip into
    border cells and raise the overflow flag).
    """
    k = jnp.floor(points / res).astype(jnp.int32)
    masked = jnp.where(mask[:, None], k, _SENT)
    kmin = jnp.min(masked, axis=0)
    rel = k - kmin
    ovf = jnp.any(
        mask[:, None]
        & (rel > jnp.array([_XMAX, _YMAX, _ZMAX]))
    )
    rel = jnp.clip(rel, 0, jnp.array([_XMAX, _YMAX, _ZMAX]))
    key = (
        (rel[..., 2] << (_XBITS + _YBITS))
        | (rel[..., 1] << _XBITS)
        | rel[..., 0]
    )
    return jnp.where(mask, key, _SENT), ovf


def _sorted_segments(key, mask):
    """Sort by key; return (order, seg_id_sorted, first_flag_sorted).

    seg_id is 0-based in first-occurrence order over the *sorted* sequence;
    invalid points (sentinel keys) share the trailing segment and must be
    masked by the caller.
    """
    order = jnp.argsort(key, stable=True)
    k_s = key[order]
    first = jnp.concatenate([jnp.ones((1,), bool), k_s[1:] != k_s[:-1]])
    seg_id = jnp.cumsum(first) - 1
    return order, seg_id, first


def sorted_segment_reduce(values, seg, num_segments):
    """Sums + counts per segment for a NONDECREASING segment-id vector.

    Scatter-free (TPU scatters serialize): per-segment sums are differences
    of the running prefix sum at segment boundaries, found with a binary
    search. XLA's cumsum is a log-depth associative scan, so float error is
    O(log N) — more than accurate enough for meter-scale geometry.

    values: (N, D); seg: (N,) in [0, num_segments] (num_segments = dropped).
    Returns (sums (S, D), counts (S,) int32).
    """
    ps = jnp.cumsum(values, axis=0)
    # boundaries[k] = first index with seg >= k  (seg is sorted)
    bounds = jnp.searchsorted(seg, jnp.arange(num_segments + 1, dtype=seg.dtype))
    n = values.shape[0]
    end = jnp.minimum(bounds[1:], n) - 1
    start = jnp.minimum(bounds[:-1], n) - 1
    ps_end = jnp.where((end >= 0)[:, None], ps[jnp.maximum(end, 0)], 0.0)
    ps_start = jnp.where((start >= 0)[:, None], ps[jnp.maximum(start, 0)], 0.0)
    sums = ps_end - ps_start
    counts = (jnp.minimum(bounds[1:], n) - jnp.minimum(bounds[:-1], n)).astype(
        jnp.int32
    )
    return sums, counts


def voxel_grid_downsample(points, mask, res, out_capacity=None):
    """PCL-VoxelGrid-equivalent: centroid per occupied cell.

    Mirrors FCCF.cpp:1377-1387. Returns (out_points (C,3), out_mask (C,)).
    Output order is ascending (kz, ky, kx) like PCL's leaf ordering.
    """
    n = points.shape[0]
    cap = n if out_capacity is None else out_capacity
    key, _ = _cell_keys(points, mask, res)
    order, seg_id, _ = _sorted_segments(key, mask)
    pts_s = points[order]
    mask_s = mask[order]
    seg = jnp.where(mask_s, jnp.minimum(seg_id, cap), cap)
    sums, cnts = sorted_segment_reduce(
        pts_s * mask_s[:, None].astype(points.dtype), seg, cap
    )
    out = sums / jnp.maximum(cnts[:, None].astype(points.dtype), 1.0)
    return out, cnts > 0


def voxel_stats(points, mask, res, num_voxels):
    """Per-voxel centroid + covariance + count over fixed capacity V.

    Replaces the octree voxel loop of ``face_extrate`` (FCCF.cpp:481-534):
    every occupied cell gets its centroid and a normalized covariance
    (two-pass, numerically better than PCL's E[xx^T]-mu mu^T at identical
    semantics). Also returns ``point_voxel`` (N,), each point's voxel slot
    (== V for dropped/invalid points) so callers can build the residual
    cloud mask without compaction.
    """
    V = num_voxels
    key, key_ovf = _cell_keys(points, mask, res)
    order, seg_id, _ = _sorted_segments(key, mask)
    pts_s = points[order]
    mask_s = mask[order]
    seg = jnp.where(mask_s & (seg_id < V), seg_id, V)

    w = (seg < V).astype(points.dtype)
    psum, cnt = sorted_segment_reduce(pts_s * w[:, None], seg, V)
    cntf = cnt.astype(points.dtype)
    mean = psum / jnp.maximum(cntf[:, None], 1.0)

    centered = (pts_s - mean[jnp.minimum(seg, V - 1)]) * w[:, None]
    outer = (centered[:, :, None] * centered[:, None, :]).reshape(-1, 9)
    covsum, _ = sorted_segment_reduce(outer, seg, V)
    cov = covsum.reshape(V, 3, 3) / jnp.maximum(cntf[:, None, None], 1.0)

    nvalid_seg = jnp.max(jnp.where(mask_s, seg_id, -1)) + 1
    overflow = (nvalid_seg > V) | key_ovf

    # Map voxel slot back to each original point: invert the sort
    # permutation (argsort of a permutation is its inverse; scatter-free).
    point_voxel = seg[jnp.argsort(order)]

    stats = VoxelStats(
        centroid=mean,
        cov=cov,
        count=cnt,
        valid=cnt > 0,
        overflow=overflow,
    )
    return stats, point_voxel


def compact(valid, capacity, *payloads):
    """Stable masked compaction: pack valid entries (in order) into the
    first slots of fixed-capacity outputs.

    Returns (count, overflow, out_valid (capacity,), *out_payloads). Entries
    beyond capacity are dropped (overflow flag raised). This is the masked
    equivalent of every ``std::vector::push_back`` loop in the reference.

    Scatter-free: TPU scatters serialize badly, so the k-th output slot
    *gathers* its source position from a binary search over the running
    count (cumsum) — O(capacity log N) fully-vectorized loads.
    """
    lead = valid.ndim
    valid = valid.reshape(-1)
    ps = jnp.cumsum(valid.astype(jnp.int32))
    count = ps[-1]
    overflow = count > capacity
    # source index of the k-th valid entry: first position with ps == k+1
    src = jnp.searchsorted(ps, jnp.arange(1, capacity + 1, dtype=jnp.int32))
    out_valid = jnp.arange(capacity) < count
    src = jnp.minimum(src, valid.shape[0] - 1)
    outs = []
    for p in payloads:
        p = p.reshape((valid.shape[0],) + p.shape[lead:])
        g = p[src]
        mask = out_valid.reshape((capacity,) + (1,) * (g.ndim - 1))
        outs.append(jnp.where(mask, g, jnp.zeros((), p.dtype)))
    return (jnp.minimum(count, capacity), overflow, out_valid, *outs)
