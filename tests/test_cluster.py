"""Greedy clustering semantics vs a NumPy golden that mirrors the
reference's transform_cluster (FCCF.cpp:1040-1231) exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from fccf_pcr_tpu.cluster.cluster import (
    _cluster_stats,
    _emit_representatives,
    _greedy_seeds,
    geometric_adjacency,
)
from fccf_pcr_tpu.config import FCCFParams


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
    t = np.zeros((H, 3))
    for i in range(n_valid):
        m = rng.integers(0, 4)
        t[i] = modes_t[m] + rng.normal(0, 0.15, 3)
        a = axes[m] + rng.normal(0, 0.002, 3)
        a /= np.linalg.norm(a)
        ang = angs[m] + rng.normal(0, 0.002)
        quat[i] = [np.cos(ang / 2), *(np.sin(ang / 2) * a)]
    return mask, quat.astype(np.float32), t.astype(np.float32)


def test_greedy_cluster_matches_reference_semantics():
    rng = np.random.default_rng(0)
    H = 64
    mask, quat, t = _rand_hyps(rng, H, 50)
    params = FCCFParams()

    @jax.jit
    def run(m, q, tt):
        adj, px, py = geometric_adjacency(q, tt, params)
        is_seed = _greedy_seeds(adj, m, max_iters=m.shape[0])
        size, tsum, xsum, ysum = _cluster_stats(adj, m, tt, px, py)
        return is_seed, size, tsum, xsum, ysum

    is_seed, size, tsum, xsum, ysum = run(
        jnp.asarray(mask), jnp.asarray(quat), jnp.asarray(t)
    )

    golden = _np_greedy(mask, quat, t, params.cluster_dist, params.cluster_angle)
    got_seeds = set(np.flatnonzero(np.asarray(is_seed)))
    assert got_seeds == set(golden.keys())
    for s, members in golden.items():
        assert int(np.asarray(size)[s]) == len(members)
        np.testing.assert_allclose(
            np.asarray(tsum)[s], t[members].sum(0), atol=1e-4
        )


def test_emission_floor_walk():
    # sizes: [10, 10, 5, 4, 1]; cluster_num = 6 -> floor walk emits the two
    # 10s; then 5 < 10 and emitted(2) < 3 -> floor 9; 4 < 9, emitted < 3 ->
    # floor 8; 1 < 8 -> floor 7 ... seeds exhausted.
    H = 16
    is_seed = np.zeros(H, bool)
    sizes = np.zeros(H, np.float32)
    for slot, s in zip([0, 3, 5, 8, 9], [10, 10, 5, 4, 1]):
        is_seed[slot] = True
        sizes[slot] = s
    tsum = np.tile(np.arange(H, dtype=np.float32)[:, None], (1, 3))
    xsum = np.tile(np.array([1.0, 0, 0], np.float32), (H, 1)) * sizes[:, None]
    ysum = np.tile(np.array([0.0, 1, 0], np.float32), (H, 1)) * sizes[:, None]

    from fccf_pcr_tpu.config import TEST_CAPS

    r_valid, r_q, r_t, _ = jax.jit(
        lambda a, b, c, d, e: _emit_representatives(a, b, c, d, e, 6.0, TEST_CAPS)
    )(
        jnp.asarray(is_seed),
        jnp.asarray(sizes),
        jnp.asarray(tsum),
        jnp.asarray(xsum),
        jnp.asarray(ysum),
    )
    assert int(np.asarray(r_valid).sum()) == 2
    # representatives carry the mean translation of their cluster
    np.testing.assert_allclose(np.asarray(r_t)[0], tsum[0] / 10, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_t)[1], tsum[3] / 10, atol=1e-5)


def test_emission_stops_after_cluster_num():
    # many equal-size clusters, tiny cluster_num: stops after num+1 pushes
    H = 32
    is_seed = np.zeros(H, bool)
    sizes = np.zeros(H, np.float32)
    for slot in range(12):
        is_seed[slot] = True
        sizes[slot] = 7
    from fccf_pcr_tpu.config import TEST_CAPS

    r_valid, _, _, _ = jax.jit(
        lambda a, b, c, d, e: _emit_representatives(a, b, c, d, e, 3.0, TEST_CAPS)
    )(
        jnp.asarray(is_seed),
        jnp.asarray(sizes),
        jnp.zeros((H, 3)),
        jnp.zeros((H, 3)),
        jnp.zeros((H, 3)),
    )
    # break happens after push when size > cluster_num (:1208-1211)
    assert int(np.asarray(r_valid).sum()) == 4
