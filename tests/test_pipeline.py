"""End-to-end registration property tests (SURVEY.md §4 test strategy):
known-ground-truth recovery, identity, degeneracy, vmap consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fccf_pcr_tpu import make_register_fn, registration_errors
from fccf_pcr_tpu.io import synthetic
from fccf_pcr_tpu.pipeline.register import STATUS_DEGENERATE


@pytest.fixture(scope="module")
def register(params, caps):
    return make_register_fn(params, caps)


def _pair(caps, seed):
    src, tar, T_gt = synthetic.make_pair(
        seed=seed, points_per_plane=1500, clutter_points=900
    )
    src_p, src_m = synthetic.pad_points(src, caps.max_points)
    tar_p, tar_m = synthetic.pad_points(tar, caps.max_points)
    return src_p, src_m, tar_p, tar_m, T_gt


@pytest.mark.parametrize("seed", [3, 7])
def test_recovers_ground_truth(register, caps, seed):
    src_p, src_m, tar_p, tar_m, T_gt = _pair(caps, seed)
    res = register(src_p, src_m, tar_p, tar_m)
    rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
    assert float(rre) < 0.5, f"RRE {float(rre)}"
    assert float(rte) < 0.15, f"RTE {float(rte)}"
    assert int(res.status) & STATUS_DEGENERATE == 0


def test_identity_pair(register, caps):
    # registering a cloud against itself must give ~identity
    src_p, src_m, tar_p, tar_m, _ = _pair(caps, 5)
    res = register(tar_p, tar_m, tar_p, tar_m)
    T = np.asarray(res.transform)
    rre, rte = registration_errors(
        res.transform, jnp.eye(4)
    )
    assert float(rre) < 0.2
    assert float(rte) < 0.05, f"T=\n{T}"


def test_empty_cloud_is_degenerate(register, caps):
    z = np.zeros((caps.max_points, 3), np.float32)
    m = np.zeros((caps.max_points,), bool)
    res = register(z, m, z, m)
    assert int(res.status) & STATUS_DEGENERATE
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-6)


def test_vmap_consistency(params, caps):
    """Batched registration must equal per-pair registration exactly
    (SURVEY.md §4: vmap-consistency)."""
    single = make_register_fn(params, caps)
    batched = make_register_fn(params, caps, batched=True)
    pairs = [_pair(caps, s) for s in [3, 7]]
    sp = np.stack([p[0] for p in pairs])
    sm = np.stack([p[1] for p in pairs])
    tp = np.stack([p[2] for p in pairs])
    tm = np.stack([p[3] for p in pairs])
    rb = batched(sp, sm, tp, tm)
    for k in range(2):
        rs = single(sp[k], sm[k], tp[k], tm[k])
        np.testing.assert_allclose(
            np.asarray(rb.transform[k]), np.asarray(rs.transform), atol=1e-5
        )


def test_nan_points_are_removed(register, caps):
    src_p, src_m, tar_p, tar_m, T_gt = _pair(caps, 3)
    src_p = src_p.copy()
    src_p[:50] = np.nan  # NaNs inside the masked-valid region
    res = register(src_p, src_m, tar_p, tar_m)
    rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
    assert np.isfinite(np.asarray(res.transform)).all()
    assert float(rre) < 0.5 and float(rte) < 0.15


