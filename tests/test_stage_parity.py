"""Stage-level parity: JAX pipeline vs the reference-faithful NumPy twin
on IDENTICAL face inputs (isolates each stage from face-extraction
divergence, SURVEY.md §7)."""

import numpy as np
import jax
import jax.numpy as jnp

from fccf_pcr_tpu.config import TEST_CAPS, FCCFParams
from fccf_pcr_tpu.features.faces import Faces
from fccf_pcr_tpu.hypotheses.bases import select_bases
from fccf_pcr_tpu.hypotheses.transforms import generate_hypotheses
from fccf_pcr_tpu.twin import twin
from fccf_pcr_tpu.verify.quick import match_faces


def _random_faces(rng, n, F=16):
    """Build matching twin (list) and jax (Faces) representations."""
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    # slight shrink: face normals in the pipeline are non-unit averages
    normals *= rng.uniform(0.97, 1.0, (n, 1))
    centroids = rng.uniform(-8, 8, (n, 3))
    sizes = rng.uniform(50, 4000, n)
    thetas = rng.uniform(0.2, 4.0, n)

    twin_faces = [
        twin.Face(
            centroid=centroids[i],
            normal=normals[i],
            point_size=float(sizes[i]),
            voxels=[],
        )
        for i in range(n)
    ]
    pad = F - n
    faces = Faces(
        centroid=jnp.asarray(
            np.concatenate([centroids, np.zeros((pad, 3))]), jnp.float32
        ),
        normal=jnp.asarray(
            np.concatenate([normals, np.zeros((pad, 3))]), jnp.float32
        ),
        point_size=jnp.asarray(
            np.concatenate([sizes, np.zeros(pad)]), jnp.float32
        ),
        voxel_count=jnp.asarray(
            np.concatenate([np.ones(n), np.zeros(pad)]), jnp.int32
        ),
        theta=jnp.asarray(np.concatenate([thetas, np.zeros(pad)]), jnp.float32),
        valid=jnp.asarray(np.arange(F) < n),
    )
    return twin_faces, list(thetas), faces


def test_select_bases_matches_twin():
    rng = np.random.default_rng(0)
    params = FCCFParams()
    tf, th, faces = _random_faces(rng, 12)
    tb, tt = twin.select_base(tf, th, params)
    b = select_bases(faces, params)
    got = [
        (int(b.i[k]), int(b.j[k]), int(b.type_[k]))
        for k in range(len(np.asarray(b.valid)))
        if bool(b.valid[k])
    ]
    want = [(i, j, ty) for (i, j, a), ty in zip(tb, tt)]
    assert got == want
    # angles agree
    angmap = {(i, j): a for (i, j, a) in tb}
    for k in range(len(np.asarray(b.valid))):
        if bool(b.valid[k]):
            key = (int(b.i[k]), int(b.j[k]))
            np.testing.assert_allclose(float(b.angle[k]), angmap[key], atol=2e-2)


def test_hypotheses_match_twin():
    rng = np.random.default_rng(1)
    params = FCCFParams()
    caps = TEST_CAPS
    tf1, th1, f1 = _random_faces(rng, 10)
    tf2, th2, f2 = _random_faces(rng, 9)

    tb1, tt1 = twin.select_base(tf1, th1, params)
    tb2, tt2 = twin.select_base(tf2, th2, params)
    want = []
    for b1i, (i1, j1, a1) in enumerate(tb1):
        for b2i, (i2, j2, a2) in enumerate(tb2):
            if abs(a1 - a2) < params.angle_same and tt1[b1i] == tt2[b2i]:
                want.extend(
                    twin.computer_transform(tf1, tf2, i1, j1, i2, j2, params)
                )

    b1 = select_bases(f1, params)
    b2 = select_bases(f2, params)
    hyp = jax.jit(
        lambda f1, f2, b1, b2: generate_hypotheses(f1, f2, b1, b2, params, caps)
    )(f1, f2, b1, b2)
    n = int(hyp.count)
    assert n == len(want), (n, len(want))
    from fccf_pcr_tpu.ops import geometry

    R_got = np.asarray(geometry.quat_to_matrix(hyp.quat[:n]))
    t_got = np.asarray(hyp.t[:n])
    for k, M in enumerate(want):
        # Same enumeration order as the reference loops. Rotations are
        # compared after projecting the twin's raw (slightly
        # non-orthogonal, since face normals are non-unit averages) R to
        # SO(3) through the same quaternion path the pipeline uses — the
        # reference itself round-trips R through Eigen quaternions before
        # clustering (FCCF.cpp:1441-1475), so SO(3) is where parity lives.
        R_proj = np.asarray(
            geometry.quat_to_matrix(
                geometry.matrix_to_quat(jnp.asarray(M[:3, :3], jnp.float32))
            )
        )
        np.testing.assert_allclose(R_got[k], R_proj, atol=5e-3)
        np.testing.assert_allclose(t_got[k], M[:3, 3], atol=5e-2)


def test_per_match_truncation_keeps_first_slots():
    """per_match_hits truncation must keep each match's FIRST hits in
    reference enumeration order (s-major) and flag the overflow — the
    truncated pool is a strict subset of the untruncated one."""
    params = FCCFParams()

    def family_faces(seed):
        """12 faces drawn from 3 nearly-parallel normal families (like a
        pillar hall): any base match then has many third-plane (s, t)
        candidates within the 5-degree gate."""
        r = np.random.default_rng(seed)
        fams = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        normals = np.repeat(fams, 4, axis=0)
        normals = normals + r.normal(0, 0.01, normals.shape)  # ~0.6 deg jitter
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        centroids = r.uniform(-8, 8, (12, 3))
        sizes = r.uniform(50, 4000, 12)
        thetas = r.uniform(0.2, 1.5, 12)  # all smooth: one type lane
        F = 16
        pad = F - 12
        return Faces(
            centroid=jnp.asarray(
                np.concatenate([centroids, np.zeros((pad, 3))]), jnp.float32),
            normal=jnp.asarray(
                np.concatenate([normals, np.zeros((pad, 3))]), jnp.float32),
            point_size=jnp.asarray(
                np.concatenate([sizes, np.zeros(pad)]), jnp.float32),
            voxel_count=jnp.asarray(
                np.concatenate([np.ones(12), np.zeros(pad)]), jnp.int32),
            theta=jnp.asarray(
                np.concatenate([thetas, np.zeros(pad)]), jnp.float32),
            valid=jnp.asarray(np.arange(F) < 12),
        )

    f1 = family_faces(1)
    f2 = family_faces(2)
    b1 = select_bases(f1, params)
    b2 = select_bases(f2, params)

    def run(caps):
        return jax.jit(
            lambda f1, f2, b1, b2: generate_hypotheses(
                f1, f2, b1, b2, params, caps
            )
        )(f1, f2, b1, b2)

    # max_hypotheses is raised so ONLY the per-match width differs
    full = run(TEST_CAPS.replace(
        per_match_hits=257, max_hypotheses=16384, max_matches=4096))
    trunc = run(TEST_CAPS.replace(
        per_match_hits=2, max_hypotheses=16384, max_matches=4096))
    n_full, n_trunc = int(full.count), int(trunc.count)
    assert not bool(full.overflow)
    assert bool(trunc.overflow), "truncation must flag"
    assert n_trunc < n_full

    def rows(h, n):
        q = np.asarray(h.quat[:n])
        t = np.asarray(h.t[:n])
        return {tuple(np.round(np.concatenate([q[k], t[k]]), 5)) for k in range(n)}

    assert rows(trunc, n_trunc) <= rows(full, n_full), (
        "truncated hypotheses must be a subset of the full pool"
    )


def test_quick_verify_score_matches_twin():
    rng = np.random.default_rng(2)
    params = FCCFParams()
    tf1, _, f1 = _random_faces(rng, 8)
    # target = source faces perturbed, under a random transform guess
    tf2, _, f2 = _random_faces(rng, 8)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.5, -0.2, 0.1]

    _, want_score = twin.quick_verify(T.astype(np.float64), tf1, tf2, params)
    got_score, n_pairs, *_ = jax.jit(
        lambda T, f1, f2: match_faces(T, f1, f2, params)
    )(jnp.asarray(T), f1, f2)
    np.testing.assert_allclose(float(got_score), want_score, atol=1e-4)
