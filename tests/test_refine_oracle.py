"""De-correlated refinement oracle (VERDICT round 1, item 5).

The NumPy twin's LM refiner is the same algorithm as the pipeline's
(finite differences of the same cost), so refinement bugs cancel in twin
parity tests. This cross-checks ``refine_pairs`` against an INDEPENDENT
solver: scipy.optimize.least_squares (TRF, float64, 2-point numeric
Jacobian) over an independent parameterization (rotation VECTOR via
scipy Rotation, not our quaternion tangent steps).

Both minimize the Ceres cost of FCCF.cpp:178-208 (LidarPlaneFactor):
    sum_i w_i^2 ( |n1_i x (R n2_i)|^2 + (n1_i.p1_i - (R n2_i).(R p2_i + t))^2 )
On noisy problems the optimum is NOT zero-residual, so agreement here
tests solver behavior, not just problem consistency.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import least_squares
from scipy.spatial.transform import Rotation

from fccf_pcr_tpu.refine.gauss_newton import refine_pairs


def _residuals_np(x, n1, p1, n2, p2, w):
    R = Rotation.from_rotvec(x[:3]).as_matrix()
    t = x[3:]
    n2r = n2 @ R.T
    p2r = p2 @ R.T + t
    cross = np.cross(n1, n2r)
    off = np.sum(n1 * p1, axis=1) - np.sum(n2r * p2r, axis=1)
    return (np.concatenate([cross, off[:, None]], axis=1) * w[:, None]).ravel()


def _cost(T, n1, p1, n2, p2, w):
    rv = Rotation.from_matrix(T[:3, :3]).as_rotvec()
    x = np.concatenate([rv, T[:3, 3]])
    r = _residuals_np(x, n1, p1, n2, p2, w)
    return float(np.dot(r, r))


def _make_problem(rng, noisy):
    P = int(rng.integers(4, 12))
    ang = np.deg2rad(rng.uniform(0.5, 6.0))
    axis = rng.normal(size=3)
    R = Rotation.from_rotvec(axis / np.linalg.norm(axis) * ang).as_matrix()
    t = rng.uniform(-0.8, 0.8, 3)
    n2 = rng.normal(size=(P, 3))
    n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
    p2 = rng.uniform(-10, 10, (P, 3))
    n1 = n2 @ R.T
    p1 = p2 @ R.T + t
    if noisy:
        # perturb the "observed" planes so the optimum has residual > 0
        n1 = n1 + rng.normal(scale=5e-3, size=n1.shape)
        n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
        p1 = p1 + rng.normal(scale=2e-2, size=p1.shape)
    w = rng.uniform(0.05, 0.5, P)
    return n1, p1, n2, p2, w


@pytest.mark.parametrize("noisy", [False, True])
def test_lm_matches_independent_solver(noisy):
    rng = np.random.default_rng(11 if noisy else 7)
    ours = jax.jit(functools.partial(refine_pairs, iters=50))
    worse, checked = 0, 0
    for _ in range(12):
        n1, p1, n2, p2, w = _make_problem(rng, noisy)
        T = np.asarray(
            ours(
                jnp.asarray(n1, jnp.float32), jnp.asarray(p1, jnp.float32),
                jnp.asarray(n2, jnp.float32), jnp.asarray(p2, jnp.float32),
                jnp.asarray(w, jnp.float32),
            )
        ).astype(np.float64)
        sol = least_squares(
            _residuals_np, np.zeros(6), args=(n1, p1, n2, p2, w),
            method="trf", xtol=1e-12, ftol=1e-12, gtol=1e-12,
        )
        R_ref = Rotation.from_rotvec(sol.x[:3]).as_matrix()
        t_ref = sol.x[3:]

        # same optimum: transform-level agreement...
        dR = Rotation.from_matrix(T[:3, :3] @ R_ref.T).magnitude()
        assert np.degrees(dR) < 0.1, f"rotation differs {np.degrees(dR)} deg"
        assert np.linalg.norm(T[:3, 3] - t_ref) < 5e-3

        # ...and cost-level: our float32 LM may not hit the float64 optimum
        # exactly, but must never be meaningfully worse than scipy's.
        c_ours = _cost(T, n1, p1, n2, p2, w)
        c_ref = 2.0 * sol.cost  # least_squares reports 0.5 * sum r^2
        checked += 1
        if c_ours > c_ref * (1 + 1e-3) + 1e-9:
            worse += 1
    assert worse == 0, f"{worse}/{checked} problems converged worse than scipy"
