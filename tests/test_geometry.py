"""Unit tests for ops.geometry against NumPy references."""

import numpy as np
import jax.numpy as jnp

from fccf_pcr_tpu.ops import geometry


def _rand_rot(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0.1, np.pi - 0.1)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def test_angle_deg_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 3))
    b = rng.normal(size=(64, 3))
    got = np.asarray(geometry.angle_deg(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    want = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_rotation_between_planes_aligns_unit_normals():
    rng = np.random.default_rng(1)
    for _ in range(20):
        R_gt = _rand_rot(rng)
        n1 = rng.normal(size=3); n1 /= np.linalg.norm(n1)
        # second plane normal at a 30-150 deg angle
        m1 = rng.normal(size=3); m1 /= np.linalg.norm(m1)
        if abs(n1 @ m1) > 0.85:
            continue
        n2 = R_gt.T @ n1
        m2 = R_gt.T @ m1
        R, _ = geometry.rotation_between_planes(
            jnp.asarray(n1, jnp.float32), jnp.asarray(m1, jnp.float32),
            jnp.asarray(n2, jnp.float32), jnp.asarray(m2, jnp.float32),
        )
        R = np.asarray(R)
        # R must map n2 -> n1 and m2 -> m1 (which pins R = R_gt)
        np.testing.assert_allclose(R @ n2, n1, atol=1e-4)
        np.testing.assert_allclose(R @ m2, m1, atol=1e-3)


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(2)
    Rs = np.stack([_rand_rot(rng) for _ in range(32)]).astype(np.float32)
    q = geometry.matrix_to_quat(jnp.asarray(Rs))
    R2 = np.asarray(geometry.quat_to_matrix(q))
    np.testing.assert_allclose(R2, Rs, atol=1e-5)
    # quat_rotate agrees with matrix action
    v = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(geometry.quat_rotate(q, jnp.asarray(v)))
    want = np.einsum("bij,bj->bi", Rs, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_from_two_axes_reconstructs():
    rng = np.random.default_rng(3)
    for _ in range(10):
        R_gt = _rand_rot(rng).astype(np.float32)
        nt1 = R_gt @ np.array([1.0, 0, 0], np.float32)
        nt2 = R_gt @ np.array([0.0, 1, 0], np.float32)
        R = np.asarray(
            geometry.rotation_from_two_axes(jnp.asarray(nt1), jnp.asarray(nt2))
        )
        np.testing.assert_allclose(R, R_gt, atol=1e-4)


def test_transform_helpers():
    rng = np.random.default_rng(4)
    R = _rand_rot(rng).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    T = np.asarray(geometry.make_transform(jnp.asarray(R), jnp.asarray(t)))
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    got = np.asarray(geometry.apply_transform(jnp.asarray(T), jnp.asarray(pts)))
    np.testing.assert_allclose(got, pts @ R.T + t, atol=1e-5)
    assert float(geometry.rotation_error_deg(jnp.asarray(R), jnp.asarray(R))) < 0.2
