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
    got = float(
        jax.jit(
            lambda T, tp, tm: fine_verify(T, table, tp, tm, params, caps)
        )(T, jnp.asarray(tar_p), jnp.asarray(tar_m))
    )
    want = _np_fine(src, tar, params.fine_voxel)
    np.testing.assert_allclose(got, want, rtol=1e-5)


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
    assert float(f(T_good)) > 0.9  # identical clouds overlap perfectly
    assert float(f(T_bad)) == 0.0
