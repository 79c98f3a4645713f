"""Greedy clustering semantics vs a NumPy golden that mirrors the
reference's transform_cluster (FCCF.cpp:1040-1231) exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from fccf_pcr_tpu.cluster.cluster import (
    _XHAT,
    _YHAT,
    _emit_representatives,
    _greedy_seeds_all_types,
)
from fccf_pcr_tpu.config import TEST_CAPS, FCCFParams
from fccf_pcr_tpu.ops import geometry


def _np_greedy(mask, quat, t, dist_thresh, angle_thresh):
    """Reference-faithful greedy clustering. Returns per-seed member lists."""
    H = len(mask)
    idx = [i for i in range(H) if mask[i]]
    px = np.zeros((H, 3))
    for i in range(H):
        w, x, y, z = quat[i]
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        px[i] = R @ np.array([1.0, 0, 0])
    allocated = np.zeros(H, bool)
    clusters = {}
    last = idx[-1]
    for i in idx:
        if i == last:  # reference skips the final element as a seed (:1084)
            continue
        if allocated[i]:
            continue
        members = []
        for j in idx:
            if np.sum((t[j] - t[i]) ** 2) <= dist_thresh**2:
                cos = np.clip(px[i] @ px[j], -1, 1)
                if np.degrees(np.arccos(cos)) < angle_thresh:
                    members.append(j)
                    allocated[j] = True
        clusters[i] = members
    return clusters


def _rand_hyps(rng, H, n_valid):
    mask = np.zeros(H, bool)
    mask[:n_valid] = True
    # few distinct translation/rotation modes + noise
    modes_t = rng.uniform(-5, 5, (4, 3))
    axes = rng.normal(size=(4, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angs = rng.uniform(0.2, 1.0, 4)
    quat = np.zeros((H, 4))
    quat[:, 0] = 1.0
    t = np.zeros((H, 3))
    for i in range(n_valid):
        m = rng.integers(0, 4)
        t[i] = modes_t[m] + rng.normal(0, 0.15, 3)
        a = axes[m] + rng.normal(0, 0.002, 3)
        a /= np.linalg.norm(a)
        ang = angs[m] + rng.normal(0, 0.002)
        quat[i] = [np.cos(ang / 2), *(np.sin(ang / 2) * a)]
    return mask, quat.astype(np.float32), t.astype(np.float32)


def test_greedy_seeds_and_stats_match_reference_semantics():
    rng = np.random.default_rng(0)
    H = 512  # must be a multiple of the seed block (or smaller than it)
    mask, quat, t = _rand_hyps(rng, H, 400)
    params = FCCFParams()

    @jax.jit
    def run(m, q, tt):
        px = geometry.quat_rotate(q, jnp.broadcast_to(_XHAT, (H, 3)))
        py = geometry.quat_rotate(q, jnp.broadcast_to(_YHAT, (H, 3)))
        return _greedy_seeds_all_types(m[None, :], tt, px, py, params)

    seeds3, size3, sums3 = run(jnp.asarray(mask), jnp.asarray(quat), jnp.asarray(t))
    seeds = np.asarray(seeds3[0])
    size = np.asarray(size3[0])
    sums = np.asarray(sums3[0])

    golden = _np_greedy(mask, quat, t, params.cluster_dist, params.cluster_angle)
    got_seeds = set(np.flatnonzero(seeds))
    assert got_seeds == set(golden.keys())
    for s, members in golden.items():
        assert int(size[s]) == len(members)
        np.testing.assert_allclose(sums[s, :3], t[members].sum(0), atol=1e-3)


def _emit(is_seed_slots, sizes_slots, cluster_num):
    """Helper: run emission from per-slot seed stats (compacted first)."""
    from fccf_pcr_tpu.ops.voxelize import compact

    H = len(is_seed_slots)
    caps = TEST_CAPS
    sums = np.zeros((H, 9), np.float32)
    sums[:, 3] = sizes_slots  # xsum ~ size * x_hat
    sums[:, 7] = sizes_slots  # ysum ~ size * y_hat
    sums[:, 0] = np.arange(H)  # distinguishable mean t
    _, _, seed_valid, s_size, s_sums = compact(
        jnp.asarray(is_seed_slots),
        caps.max_clusters,
        jnp.asarray(sizes_slots, jnp.float32),
        jnp.asarray(sums),
    )
    return jax.jit(
        lambda v, sz, sm: _emit_representatives(v, sz, sm, float(cluster_num), caps)
    )(seed_valid, s_size, s_sums)


def test_emission_floor_walk():
    # sizes: [10, 10, 5, 4, 1]; cluster_num = 6 -> the two 10s emit; then
    # 5 < 10 with emitted(2) < 3 decrements the floor per skip until seeds
    # run out.
    H = 16
    is_seed = np.zeros(H, bool)
    sizes = np.zeros(H, np.float32)
    for slot, s in zip([0, 3, 5, 8, 9], [10, 10, 5, 4, 1]):
        is_seed[slot] = True
        sizes[slot] = s
    r_valid, r_q, r_t, _ = _emit(is_seed, sizes, 6.0)
    assert int(np.asarray(r_valid).sum()) == 2
    np.testing.assert_allclose(np.asarray(r_t)[0, 0], 0.0 / 10, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_t)[1, 0], 3.0 / 10, atol=1e-5)


def test_emission_stops_after_cluster_num():
    # many equal-size clusters, tiny cluster_num: stops after num+1 pushes
    H = 32
    is_seed = np.zeros(H, bool)
    sizes = np.zeros(H, np.float32)
    for slot in range(12):
        is_seed[slot] = True
        sizes[slot] = 7
    r_valid, _, _, _ = _emit(is_seed, sizes, 3.0)
    # break happens after push when size > cluster_num (:1208-1211)
    assert int(np.asarray(r_valid).sum()) == 4


def test_column_blocked_scan_is_exact():
    """The column-blocked seed scan (inner (B, B) tiles bounded by the
    occupied-column prefix) must produce bit-identical seeds/sizes and
    near-identical sums (f32 accumulation order differs) vs the full-width
    path, including with multiple row blocks and a 3-type pool."""
    import fccf_pcr_tpu.cluster.cluster as cc

    rng = np.random.default_rng(5)
    H = 1536  # 3 row blocks of 512
    n_valid = 1100  # occupied prefix < H: the dynamic bounds matter
    quat = rng.normal(size=(H, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    t = (rng.normal(size=(H, 3)) * 2.0).astype(np.float32)
    types = rng.integers(0, 3, H)
    valid = np.arange(H) < n_valid
    masks = np.stack([valid & (types == k) for k in range(3)])
    params = FCCFParams()

    px = geometry.quat_rotate(jnp.asarray(quat), jnp.broadcast_to(_XHAT, (H, 3)))
    py = geometry.quat_rotate(jnp.asarray(quat), jnp.broadcast_to(_YHAT, (H, 3)))

    old = cc._SEED_COL_BLOCKED
    try:
        cc._SEED_COL_BLOCKED = False
        s1, z1, m1 = cc._greedy_seeds_all_types(
            jnp.asarray(masks), jnp.asarray(t), px, py, params
        )
        cc._SEED_COL_BLOCKED = True
        s2, z2, m2 = cc._greedy_seeds_all_types(
            jnp.asarray(masks), jnp.asarray(t), px, py, params
        )
    finally:
        cc._SEED_COL_BLOCKED = old

    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-3)
