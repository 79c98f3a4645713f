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

_OFFSET = 32768  # recenter per-dim cell indices into [0, 65536)


class VoxelStats(NamedTuple):
    """Per-voxel plane statistics (fixed capacity V, masked)."""

    centroid: jax.Array  # (V, 3)
    cov: jax.Array       # (V, 3, 3) normalized covariance
    count: jax.Array     # (V,) int32 points in voxel
    valid: jax.Array     # (V,) bool occupied
    overflow: jax.Array  # () bool, more voxels than capacity


def _cell_keys(points, mask, res):
    """(hi, lo) int32 sort keys per point; invalid points sort last."""
    k = jnp.floor(points / res).astype(jnp.int32)
    kx = jnp.clip(k[..., 0] + _OFFSET, 0, 65535)
    ky = jnp.clip(k[..., 1] + _OFFSET, 0, 65535)
    kz = k[..., 2]
    hi = jnp.where(mask, kz, jnp.iinfo(jnp.int32).max)
    lo = jnp.where(mask, ky * 65536 + kx, jnp.iinfo(jnp.int32).max)
    return hi, lo


def _sorted_segments(hi, lo, mask):
    """Sort by (hi, lo); return (order, seg_id_sorted, seg_start_sorted).

    seg_id is 0-based in first-occurrence order over the *sorted* sequence;
    invalid points (sentinel keys) share the trailing segment and must be
    masked by the caller.
    """
    order = jnp.lexsort((lo, hi))
    hi_s = hi[order]
    lo_s = lo[order]
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
        ]
    )
    seg_id = jnp.cumsum(first) - 1
    return order, seg_id, first


def voxel_grid_downsample(points, mask, res, out_capacity=None):
    """PCL-VoxelGrid-equivalent: centroid per occupied cell.

    Mirrors FCCF.cpp:1377-1387. Returns (out_points (C,3), out_mask (C,)).
    Output order is ascending (kz, ky, kx) like PCL's leaf ordering.
    """
    n = points.shape[0]
    cap = n if out_capacity is None else out_capacity
    hi, lo = _cell_keys(points, mask, res)
    order, seg_id, _ = _sorted_segments(hi, lo, mask)
    pts_s = points[order]
    mask_s = mask[order]
    w = mask_s.astype(points.dtype)
    seg = jnp.where(mask_s, seg_id, cap)  # park invalid in dropped bucket
    sums = jax.ops.segment_sum(pts_s * w[:, None], seg, num_segments=cap + 1)
    cnts = jax.ops.segment_sum(w, seg, num_segments=cap + 1)
    out = sums[:cap] / jnp.maximum(cnts[:cap, None], 1.0)
    return out, cnts[:cap] > 0


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
    hi, lo = _cell_keys(points, mask, res)
    order, seg_id, _ = _sorted_segments(hi, lo, mask)
    pts_s = points[order]
    mask_s = mask[order]
    seg = jnp.where(mask_s & (seg_id < V), seg_id, V)

    w = (seg < V).astype(points.dtype)
    cnt = jax.ops.segment_sum(w, seg, num_segments=V + 1)[:V]
    psum = jax.ops.segment_sum(pts_s * w[:, None], seg, num_segments=V + 1)[:V]
    mean = psum / jnp.maximum(cnt[:, None], 1.0)

    centered = (pts_s - mean[jnp.minimum(seg, V - 1)]) * w[:, None]
    outer = centered[:, :, None] * centered[:, None, :]
    covsum = jax.ops.segment_sum(outer, seg, num_segments=V + 1)[:V]
    cov = covsum / jnp.maximum(cnt[:, None, None], 1.0)

    nvalid_seg = jnp.max(jnp.where(mask_s, seg_id, -1)) + 1
    overflow = nvalid_seg > V

    # Map voxel slot back to each original point: invert the sort order.
    point_voxel_sorted = seg
    point_voxel = jnp.zeros_like(seg).at[order].set(point_voxel_sorted)

    stats = VoxelStats(
        centroid=mean,
        cov=cov,
        count=cnt.astype(jnp.int32),
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
    """
    lead = valid.ndim
    valid = valid.reshape(-1)
    pos = jnp.cumsum(valid) - 1
    count = jnp.sum(valid).astype(jnp.int32)
    overflow = count > capacity
    dest = jnp.where(valid & (pos < capacity), pos, capacity)
    out_valid = jnp.zeros((capacity + 1,), bool).at[dest].set(valid)[:capacity]
    outs = []
    for p in payloads:
        p = p.reshape((valid.shape[0],) + p.shape[lead:])
        buf = jnp.zeros((capacity + 1,) + p.shape[1:], p.dtype)
        outs.append(buf.at[dest].set(p)[:capacity])
    return (jnp.minimum(count, capacity), overflow, out_valid, *outs)
