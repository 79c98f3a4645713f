"""Voxel hashing / downsampling / compaction vs NumPy goldens."""

import numpy as np
import jax.numpy as jnp

from fccf_pcr_tpu.ops.voxelize import compact, voxel_grid_downsample, voxel_stats


def _assert_clouds_match(got, want, atol):
    """Order-insensitive row match: every got row has a want row within
    atol, bijectively."""
    assert got.shape == want.shape
    d = np.linalg.norm(got[:, None, :] - want[None, :, :], axis=-1)
    nearest = d.argmin(axis=1)
    assert (d[np.arange(len(got)), nearest] < atol).all(), (
        d[np.arange(len(got)), nearest].max()
    )
    assert len(np.unique(nearest)) == len(got)  # bijection


def _np_downsample(pts, res):
    keys = np.floor(pts / res).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    out = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(out, inv, pts)
    np.add.at(cnt, inv, 1)
    return out / cnt[:, None]


def test_downsample_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    mask = np.ones(2000, bool)
    mask[1500:] = False  # padding
    got_p, got_m, got_ovf = voxel_grid_downsample(
        jnp.asarray(pts), jnp.asarray(mask), 0.5
    )
    assert not bool(got_ovf)
    got = np.asarray(got_p)[np.asarray(got_m)]
    want = _np_downsample(pts[:1500].astype(np.float64), 0.5)
    assert got.shape == want.shape
    # 2e-3 m tolerance: centroids come from a log-depth f32 prefix scan
    # (scatter-free segment reduce); error is O(eps log N * extent), i.e.
    # sub-mm at meter-scale scenes — tighter than PCL's own linear f32
    # accumulation. Rows are matched by nearest neighbor (any value- or
    # cell-based ordering is unstable under fp noise).
    _assert_clouds_match(got, want, atol=2e-3)


def test_voxel_stats_counts_and_centroids():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 8, (3000, 3)).astype(np.float32)
    mask = np.ones(3000, bool)
    stats, sorted_pts, point_voxel = voxel_stats(
        jnp.asarray(pts), jnp.asarray(mask), 1.0, 1024
    )
    keys = np.floor(pts / 1.0).astype(np.int64)
    uniq, inv, cnt = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    assert int(stats.valid.sum()) == len(uniq)
    assert int(stats.count.sum()) == 3000
    # total centroid mass matches
    got_c = np.asarray(stats.centroid)[np.asarray(stats.valid)]
    want_c = np.zeros((len(uniq), 3))
    np.add.at(want_c, inv, pts.astype(np.float64))
    want_c /= cnt[:, None]
    _assert_clouds_match(got_c, want_c, atol=2e-3)
    # point_voxel consistency (sorted order): same cell -> same slot,
    # sorted_pts is a permutation of the input
    pv = np.asarray(point_voxel)
    sp = np.asarray(sorted_pts)
    np.testing.assert_array_equal(
        sp[np.lexsort(sp.T)], pts[np.lexsort(pts.T)]
    )
    keys_sorted = np.floor(sp / 1.0).astype(np.int64)
    uq, inv_s = np.unique(keys_sorted, axis=0, return_inverse=True)
    for cell in range(3):
        sel = inv_s == cell
        assert len(np.unique(pv[sel])) == 1


def test_compact_order_and_overflow():
    valid = jnp.asarray(np.array([0, 1, 1, 0, 1, 1, 1], bool))
    payload = jnp.arange(7, dtype=jnp.int32) * 10
    count, overflow, out_valid, out = compact(valid, 3, payload)
    assert int(count) == 3 and bool(overflow)
    np.testing.assert_array_equal(np.asarray(out), [10, 20, 40])
    assert np.asarray(out_valid).all()
    count, overflow, out_valid, out = compact(valid, 8, payload)
    assert int(count) == 5 and not bool(overflow)
    np.testing.assert_array_equal(np.asarray(out)[:5], [10, 20, 40, 50, 60])
    np.testing.assert_array_equal(np.asarray(out_valid), [1, 1, 1, 1, 1, 0, 0, 0])


def test_fused_downsample_and_voxelize_matches_unfused():
    """downsample_and_voxelize == voxel_grid_downsample + voxel_stats
    (same cells, counts, and stats up to prefix-scan float noise)."""
    from fccf_pcr_tpu.ops.voxelize import downsample_and_voxelize

    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 12, (4000, 3)).astype(np.float32)
    mask = np.ones(4000, bool)
    mask[3500:] = False
    leaf, face = 0.25, 1.0
    V = 4096

    d_pts, d_mask, stats_f, pv, vstart = downsample_and_voxelize(
        jnp.asarray(pts), jnp.asarray(mask), leaf, face, V
    )
    d2, m2, _ = voxel_grid_downsample(jnp.asarray(pts), jnp.asarray(mask), leaf)
    stats_u, _, _ = voxel_stats(d2, m2, face, V)

    # same downsampled point set
    got = np.asarray(d_pts)[np.asarray(d_mask)]
    want = np.asarray(d2)[np.asarray(m2)]
    assert got.shape == want.shape
    # 1e-2 tolerance: the two paths accumulate prefix sums in different
    # orders (face-major vs leaf-major), so single-point cells see the
    # full prefix-cancellation noise (~eps * sum magnitude).
    _assert_clouds_match(got, want, atol=1e-2)

    # same total occupancy; voxel COUNT may differ by a few cells: the
    # unfused path re-floors (noisy) leaf centroids at face resolution
    # while the fused path nests leaf cells integrally — leaf cells whose
    # centroid sits within float noise of a face boundary can relabel
    # (documented divergence, same class as the octree-anchor change).
    cf = np.asarray(stats_f.count)[np.asarray(stats_f.valid)]
    cu = np.asarray(stats_u.count)[np.asarray(stats_u.valid)]
    assert cf.sum() == cu.sum()
    assert abs(len(cf) - len(cu)) <= 3, (len(cf), len(cu))

    # point_voxel maps each downsampled point into a valid slot
    pv = np.asarray(pv)
    assert (pv[np.asarray(d_mask)] < V).all()


def test_wide_extent_matches_single_key():
    """The two-key wide-extent sort path (building-scale presets) must
    produce the same voxel structure as the single-key path on a cloud
    that fits both extents."""
    from fccf_pcr_tpu.ops.voxelize import downsample_and_voxelize

    rng = np.random.default_rng(11)
    pts = rng.uniform(-9, 9, (3000, 3)).astype(np.float32)
    mask = np.ones(3000, bool)
    mask[2800:] = False
    args = (jnp.asarray(pts), jnp.asarray(mask), 0.25, 1.0, 1024)
    d1, m1, s1, pv1, vs1 = downsample_and_voxelize(*args, wide_extent=False)
    d2, m2, s2, pv2, vs2 = downsample_and_voxelize(*args, wide_extent=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(
        np.asarray(d1)[np.asarray(m1)], np.asarray(d2)[np.asarray(m2)],
        atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(s1.count), np.asarray(s2.count))
    np.testing.assert_allclose(
        np.asarray(s1.centroid), np.asarray(s2.centroid), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(pv1), np.asarray(pv2))


def test_wide_extent_handles_scene_beyond_single_key_budget():
    """A cloud wider than the single-key face-cell budget (127 cells per
    axis at ratio 4... actually 2^9=512 here) must clip+flag on the
    single-key path but stay clean on the wide-extent path."""
    from fccf_pcr_tpu.ops.voxelize import downsample_and_voxelize

    rng = np.random.default_rng(12)
    # ratio 4 -> bits_w 6 -> 25 face bits -> 8/8/9 split -> >=256 cells;
    # spread x over 600 face cells to exceed any single-key axis budget
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    pts[:, 0] *= 600.0
    mask = np.ones(2000, bool)
    args = (jnp.asarray(pts), jnp.asarray(mask), 0.25, 1.0, 2048)
    _, _, s_narrow, _, _ = downsample_and_voxelize(*args, wide_extent=False)
    _, _, s_wide, _, _ = downsample_and_voxelize(*args, wide_extent=True)
    assert bool(s_narrow.overflow)
    assert not bool(s_wide.overflow)


def test_sparse_stats_exclude_dropped_voxels_under_overflow():
    """When more than V feature voxels exist, the sparse (fused) path's
    LAST kept slot must not absorb the dropped voxels' down points — its
    stats must equal the same voxel's stats at ample capacity."""
    from fccf_pcr_tpu.ops.voxelize import downsample_and_voxelize

    rng = np.random.default_rng(3)
    # ~64 occupied 1m voxels of content in a 4x4x4 region
    pts = rng.uniform(0, 4, (6000, 3)).astype(np.float32)
    mask = np.ones(6000, bool)
    leaf, face = 0.25, 1.0

    _, _, ample, _, _ = downsample_and_voxelize(
        jnp.asarray(pts), jnp.asarray(mask), leaf, face, 128
    )
    V = 32  # force overflow: drops the tail voxels
    _, _, tight, _, _ = downsample_and_voxelize(
        jnp.asarray(pts), jnp.asarray(mask), leaf, face, V
    )
    assert bool(tight.overflow) and not bool(ample.overflow)
    # kept slots (including the LAST) carry identical stats
    np.testing.assert_array_equal(
        np.asarray(tight.count), np.asarray(ample.count)[:V]
    )
    np.testing.assert_allclose(
        np.asarray(tight.centroid), np.asarray(ample.centroid)[:V],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tight.cov), np.asarray(ample.cov)[:V], atol=1e-5
    )


def test_kth_true_positions_impls_agree():
    # Both boundary-table implementations (binary search vs rank scatter)
    # must return identical positions at every slot < count, for sparse,
    # dense, empty, and overflowing flag patterns.
    from fccf_pcr_tpu.ops.voxelize import _kth_true_positions

    rng = np.random.default_rng(0)
    for n, S, p in [(1000, 64, 0.02), (1000, 64, 0.5), (1000, 8, 0.9),
                    (257, 300, 0.3), (64, 4, 0.0)]:
        flag = jnp.asarray(rng.random(n) < p)
        pos_b, cnt_b = _kth_true_positions(flag, S, impl="bsearch")
        pos_s, cnt_s = _kth_true_positions(flag, S, impl="scatter")
        assert int(cnt_b) == int(cnt_s) == int(np.asarray(flag).sum())
        k = min(int(cnt_b), S)
        np.testing.assert_array_equal(
            np.asarray(pos_b)[:k], np.asarray(pos_s)[:k]
        )
        expect = np.where(np.asarray(flag))[0][:k]
        np.testing.assert_array_equal(np.asarray(pos_b)[:k], expect)
