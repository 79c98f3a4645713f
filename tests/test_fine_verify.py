"""Fine-verify voxel-occupancy score vs a NumPy golden implementing the
reference formula (FCCF.cpp:785-839)."""

import numpy as np
import jax
import jax.numpy as jnp

from fccf_pcr_tpu.config import TEST_CAPS, FCCFParams
from fccf_pcr_tpu.verify.fine import build_source_table, fine_verify


def _np_fine(src, tar, res):
    fused = np.concatenate([src, tar])
    labels = np.concatenate([np.zeros(len(src)), np.ones(len(tar))])
    keys = np.floor(fused / res).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    sim = 0.0
    for u in range(len(uniq)):
        lab = labels[inv == u]
        s = (lab == 0).sum()
        t = (lab == 1).sum()
        if s >= 1 and t >= 1:
            sim += (s + t) * min(s, t) / max(s, t)
    return sim / len(fused)


def test_score_matches_numpy_golden():
    rng = np.random.default_rng(0)
    params = FCCFParams()
    caps = TEST_CAPS

    def away_from_boundaries(lo, hi, n):
        # keep points > 1e-2 from any 0.5m cell boundary so float32
        # transform round-off cannot flip cell assignment
        cells = rng.integers(int(lo / 0.5), int(hi / 0.5), (n, 3))
        frac = rng.uniform(0.05, 0.45, (n, 3))
        return ((cells + frac) * 0.5).astype(np.float32)

    src = away_from_boundaries(0, 6, 800)
    # target: half overlapping the source region, half elsewhere
    tar = np.concatenate(
        [away_from_boundaries(0, 6, 400), away_from_boundaries(10, 16, 400)]
    ).astype(np.float32)

    cap = caps.max_residual
    src_p = np.zeros((cap, 3), np.float32)
    src_p[: len(src)] = src
    src_m = np.zeros(cap, bool)
    src_m[: len(src)] = True
    tar_p = np.zeros((cap, 3), np.float32)
    tar_p[: len(tar)] = tar
    tar_m = np.zeros(cap, bool)
    tar_m[: len(tar)] = True

    table = build_source_table(jnp.asarray(src_p), jnp.asarray(src_m), params, caps)
    T = jnp.eye(4)
    got, aliased = jax.jit(
        lambda T, tp, tm: fine_verify(T, table, tp, tm, params, caps)
    )(T, jnp.asarray(tar_p), jnp.asarray(tar_m))
    want = _np_fine(src, tar, params.fine_voxel)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    assert not bool(aliased)


def test_transform_is_applied():
    rng = np.random.default_rng(1)
    params = FCCFParams()
    caps = TEST_CAPS
    src = rng.uniform(0, 4, (500, 3)).astype(np.float32)
    offset = np.array([20.0, 0.0, 0.0], np.float32)
    tar = src - offset  # needs +offset translation to overlap

    cap = caps.max_residual
    def pad(x):
        p = np.zeros((cap, 3), np.float32)
        p[: len(x)] = x
        m = np.zeros(cap, bool)
        m[: len(x)] = True
        return jnp.asarray(p), jnp.asarray(m)

    sp, sm = pad(src)
    tp, tm = pad(tar)
    table = build_source_table(sp, sm, params, caps)
    f = jax.jit(lambda T: fine_verify(T, table, tp, tm, params, caps))
    T_good = jnp.eye(4).at[:3, 3].set(jnp.asarray(offset))
    T_bad = jnp.eye(4)
    assert float(f(T_good)[0]) > 0.9  # identical clouds overlap perfectly
    assert float(f(T_bad)[0]) == 0.0


def test_alias_flag_on_wide_scenes():
    """SOURCE residuals whose cell span exceeds 1024 cells/axis must raise
    the aliased flag (the packed 10-bit/axis key wraps inside the table
    itself); a far-away TARGET must NOT flag or score — its cells fall
    outside the source join window and are dropped before packing, so the
    wrapped key cannot fabricate collisions for any candidate pose.
    In-range scenes at negative coordinates must not flag, and negative-z
    cells must stay distinct (regression: the old int32 packing clamped
    wrapped z=1023 onto 1022, merging the two 0.5 m slabs just below the
    origin)."""
    params = FCCFParams()
    caps = TEST_CAPS
    rng = np.random.default_rng(2)

    def pad(x):
        cap = caps.max_residual
        p = np.zeros((cap, 3), np.float32)
        p[: len(x)] = x
        m = np.zeros(cap, bool)
        m[: len(x)] = True
        return jnp.asarray(p), jnp.asarray(m)

    near = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
    far = near + np.array([700.0, 0.0, 0.0], np.float32)  # 1400 cells away

    # in-range: span 16 m, straddling the origin
    sp, sm = pad(near)
    table = build_source_table(sp, sm, params, caps)
    score, aliased = fine_verify(jnp.eye(4), table, sp, sm, params, caps)
    assert not bool(aliased) and float(score) > 0.9

    # target far from source: its cells are outside the join window, so
    # no flag and EXACTLY zero score (pre-window, the wrapped far cells
    # could collide with real source voxels and fabricate overlap)
    tp, tm = pad(far)
    score, aliased = fine_verify(jnp.eye(4), table, tp, tm, params, caps)
    assert not bool(aliased)
    assert float(score) == 0.0

    # WIDE SOURCE (two clusters 1400 cells apart): the table's own packed
    # keys wrap -> flagged at build, surfaced by every candidate
    wide = np.concatenate([near, far])
    sp2, sm2 = pad(wide)
    table_w = build_source_table(sp2, sm2, params, caps)
    _, aliased = fine_verify(jnp.eye(4), table_w, sp2, sm2, params, caps)
    assert bool(aliased)

    # z slabs [-1,-0.5) and [-0.5,0) must score as distinct cells: a cloud
    # in the lower slab vs one in the upper slab overlaps nowhere.
    lo = rng.uniform([0, 0, -0.95], [4, 4, -0.55], (400, 3)).astype(np.float32)
    hi = lo + np.array([0, 0, 0.5], np.float32)
    sp, sm = pad(lo)
    tp, tm = pad(hi)
    table = build_source_table(sp, sm, params, caps)
    score, aliased = fine_verify(jnp.eye(4), table, tp, tm, params, caps)
    assert not bool(aliased)
    assert float(score) == 0.0
