"""Plane-to-plane pose refinement: jit-compiled Levenberg-Marquardt.

Replaces Ceres (FCCF.cpp:178-249, C3/C4): ``LidarPlaneFactor`` residuals
over (quaternion, translation) with EigenQuaternionParameterization,
DENSE_QR, max 50 iterations.

Residual/cost equivalence note: Ceres minimizes
    sum_i  w_i^2 * ( |n1 x (Q n2)|^2 + (n1.p1 - (Q n2).(Q p2 + t))^2 )
The reference's scalar residuals |v| and sqrt(x^2) square to exactly this
cost, so we use the smooth vector form (3 cross-product components + 1
signed offset) — same global objective and minimizer, a better-conditioned
Gauss-Newton approximation, and no gradient singularity at the optimum.
The quaternion update is a local 3-dof tangent step (left-multiplied
exponential), re-normalized each accept — the manifold structure Ceres'
local parameterization provides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import geometry
from ..ops.linalg6 import solve_spd6


def _exp_quat(v):
    """so(3) tangent -> unit quaternion (w, x, y, z).

    Differentiable at v = 0 (the LM linearization point): the norm is
    computed via a double-where so jacfwd never sees d|v|/dv at 0, and the
    small-angle branch uses the Taylor series of sin(t/2)/t and cos(t/2).
    """
    t2 = jnp.sum(v * v)
    small = t2 < 1e-12
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    k = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(0.5 * theta) / theta)
    w = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(0.5 * theta))
    return jnp.concatenate([w[None], k * v])


def _residuals(q, t, n1, p1, n2, p2, w):
    """(P, 4) weighted residuals; masked pairs carry w = 0."""
    n2r = geometry.quat_rotate(q[None, :], n2)
    p2r = geometry.quat_rotate(q[None, :], p2) + t[None, :]
    cross = jnp.cross(n1, n2r)                       # |.| == residual[0]
    off = jnp.sum(n1 * p1, axis=-1) - jnp.sum(n2r * p2r, axis=-1)
    r = jnp.concatenate([cross, off[:, None]], axis=-1)
    return r * w[:, None]


def refine_pairs(n1, p1, n2, p2, w, iters: int = 50):
    """LM solve for the correction (R, t) minimizing the plane-pair cost.

    Inputs are (P, 3) plane normals/points for matched pairs, with
    per-pair weight w (the reference's ``important``; 0 for masked slots).
    Returns the 4x4 correction DeltaT (to be composed T <- DeltaT @ T,
    FCCF.cpp:775).
    """
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], p1.dtype)
    t0 = jnp.zeros((3,), p1.dtype)

    def cost(q, t):
        r = _residuals(q, t, n1, p1, n2, p2, w).reshape(-1)
        return jnp.sum(r * r), r

    def local_residual(delta, q, t):
        dq = _exp_quat(delta[:3])
        return _residuals(
            geometry.quat_multiply(dq, q), t + delta[3:], n1, p1, n2, p2, w
        ).reshape(-1)

    def cond(state):
        q, t, lam, it, done = state
        return ~done & (it < iters)

    def step(state):
        q, t, lam, it, done = state
        r = local_residual(jnp.zeros(6, p1.dtype), q, t)
        J = jax.jacfwd(local_residual)(jnp.zeros(6, p1.dtype), q, t)
        JtJ = J.T @ J
        g = J.T @ r
        damped = JtJ + lam * jnp.diag(jnp.diag(JtJ)) + 1e-12 * jnp.eye(6, dtype=p1.dtype)
        delta = -solve_spd6(damped, g)
        q_new = geometry.normalize(geometry.quat_multiply(_exp_quat(delta[:3]), q))
        t_new = t + delta[3:]
        c_old = jnp.sum(r * r)
        c_new, _ = cost(q_new, t_new)
        accept = c_new < c_old
        # Ceres-style function_tolerance termination: stop after an accepted
        # step whose relative cost decrease is below 1e-6 (Ceres default) —
        # Ceres itself early-stops the same way well before max 50 iters.
        done = accept & (c_old - c_new <= 1e-6 * jnp.maximum(c_old, 1e-30))
        q = jnp.where(accept, q_new, q)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10), jnp.minimum(lam * 2.0, 1e8))
        return q, t, lam, it + 1, done

    q, t, _, _, _ = jax.lax.while_loop(
        cond,
        step,
        (q0, t0, jnp.asarray(1e-4, p1.dtype), jnp.int32(0), jnp.bool_(False)),
    )
    return geometry.make_transform(geometry.quat_to_matrix(q), t)
