"""Gauss-Newton/LM plane-pair refinement (Ceres replacement)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from fccf_pcr_tpu.refine.gauss_newton import refine_pairs


def _rand_rot(rng, max_deg):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.deg2rad(rng.uniform(0.5, max_deg))
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def test_recovers_known_correction():
    rng = np.random.default_rng(0)
    f = jax.jit(functools.partial(refine_pairs, iters=50))
    for _ in range(5):
        R = _rand_rot(rng, 5.0)
        t = rng.uniform(-0.8, 0.8, 3)
        n2 = rng.normal(size=(8, 3))
        n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
        p2 = rng.uniform(-10, 10, (8, 3))
        n1 = n2 @ R.T
        p1 = p2 @ R.T + t
        w = np.full(8, 0.1, np.float32)
        dT = np.asarray(
            f(
                jnp.asarray(n1, jnp.float32),
                jnp.asarray(p1, jnp.float32),
                jnp.asarray(n2, jnp.float32),
                jnp.asarray(p2, jnp.float32),
                jnp.asarray(w),
            )
        )
        r_err = np.degrees(
            np.arccos(np.clip((np.trace(R.T @ dT[:3, :3]) - 1) / 2, -1, 1))
        )
        assert r_err < 0.05
        assert np.linalg.norm(dT[:3, 3] - t) < 1e-3


def test_masked_pairs_are_ignored():
    rng = np.random.default_rng(1)
    R = _rand_rot(rng, 3.0)
    t = np.array([0.2, 0.1, -0.3])
    n2 = rng.normal(size=(8, 3))
    n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
    p2 = rng.uniform(-5, 5, (8, 3))
    n1 = n2 @ R.T
    p1 = p2 @ R.T + t
    # poison the masked rows — must not affect the solve
    n1[5:] = rng.normal(size=(3, 3)) * 100
    p1[5:] = rng.normal(size=(3, 3)) * 100
    w = np.array([0.1] * 5 + [0.0] * 3, np.float32)
    f = jax.jit(functools.partial(refine_pairs, iters=50))
    dT = np.asarray(
        f(
            jnp.asarray(n1, jnp.float32),
            jnp.asarray(p1, jnp.float32),
            jnp.asarray(n2, jnp.float32),
            jnp.asarray(p2, jnp.float32),
            jnp.asarray(w),
        )
    )
    assert np.linalg.norm(dT[:3, 3] - t) < 1e-2


def test_identity_input_stays_identity():
    rng = np.random.default_rng(2)
    n = rng.normal(size=(6, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    p = rng.uniform(-3, 3, (6, 3)).astype(np.float32)
    w = jnp.ones(6, jnp.float32)
    dT = np.asarray(refine_pairs(jnp.asarray(n), jnp.asarray(p), jnp.asarray(n), jnp.asarray(p), w, iters=10))
    np.testing.assert_allclose(dT, np.eye(4), atol=1e-5)
