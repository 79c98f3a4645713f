"""Batched 3x3 eigendecomposition vs numpy.linalg."""

import numpy as np
import jax.numpy as jnp

from fccf_pcr_tpu.ops import eigen3


def test_eigvals_match_lapack():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(256, 3, 3))
    A = (A + A.transpose(0, 2, 1)) / 2
    got = np.asarray(eigen3.eigvals_sym3x3(jnp.asarray(A, jnp.float32)))
    want = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(got, want, atol=5e-5 * np.abs(want).max())


def test_plane_fit_recovers_normal():
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        # points on a plane + small noise
        basis = np.linalg.svd(np.eye(3) - np.outer(n, n))[0][:, :2]
        uv = rng.uniform(-1, 1, (200, 2))
        pts = uv @ basis.T + 0.002 * rng.normal(size=(200, 3))
        pts -= pts.mean(0)
        cov = pts.T @ pts / len(pts)
        normal, curv = eigen3.plane_fit_from_cov(jnp.asarray(cov[None], jnp.float32))
        normal = np.asarray(normal)[0]
        assert abs(abs(normal @ n) - 1.0) < 1e-3
        assert float(curv[0]) < 0.01


def test_curvature_of_blob_is_high():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 3))
    pts -= pts.mean(0)
    cov = pts.T @ pts / len(pts)
    _, curv = eigen3.plane_fit_from_cov(jnp.asarray(cov[None], jnp.float32))
    assert float(curv[0]) > 0.2  # isotropic: l0/sum ~ 1/3


def test_degenerate_cov_is_safe():
    cov = jnp.zeros((1, 3, 3), jnp.float32)
    normal, curv = eigen3.plane_fit_from_cov(cov)
    assert np.isfinite(np.asarray(normal)).all()
    assert float(curv[0]) == 0.0
