"""Scene-family coverage tests: the stairs / hall generators behind the
BASELINE.json "Stairs + Hauptgebaude" config and the sequence generator
behind the full-sweep config (bench.py CONFIGS structured / sweep)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fccf_pcr_tpu import make_register_fn, registration_errors
from fccf_pcr_tpu.io import synthetic
from fccf_pcr_tpu.pipeline.register import STATUS_DEGENERATE


@pytest.fixture(scope="module")
def register(params, caps):
    return make_register_fn(params, caps)


def _register_pair(register, caps, src, tar):
    src_p, src_m = synthetic.pad_points(src, caps.max_points)
    tar_p, tar_m = synthetic.pad_points(tar, caps.max_points)
    return register(src_p, src_m, tar_p, tar_m)


def test_stairs_pair_registers(register, caps):
    src, tar, T_gt = synthetic.make_pair(
        seed=11, scene="stairs", points_per_plane=1200, clutter_points=600
    )
    res = _register_pair(register, caps, src, tar)
    rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
    assert float(rre) < 1.0, f"RRE {float(rre)}"
    assert float(rte) < 0.3, f"RTE {float(rte)}"
    assert int(res.status) & STATUS_DEGENERATE == 0


def test_hall_pair_registers(register, caps):
    src, tar, T_gt = synthetic.make_pair(
        seed=12, scene="hall", points_per_plane=1000, clutter_points=600,
        hall=(12.0, 7.0, 4.0), n_pillars=3,
    )
    res = _register_pair(register, caps, src, tar)
    rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
    assert float(rre) < 1.0, f"RRE {float(rre)}"
    assert float(rte) < 0.3, f"RTE {float(rte)}"
    assert int(res.status) & STATUS_DEGENERATE == 0


def test_sequence_pose_algebra():
    """T_rel[k] must map scan k's frame into scan k+1's frame:
    poses[k+1] @ T_rel[k] == poses[k], and every pose is rigid."""
    scans, T_rel, poses = synthetic.make_sequence(
        seed=4, n_scans=5, points_per_plane=300, clutter_points=120
    )
    assert len(scans) == 5 and len(T_rel) == 4 and len(poses) == 5
    for k in range(4):
        np.testing.assert_allclose(
            poses[k + 1] @ T_rel[k], poses[k], atol=1e-5
        )
    for P in poses:
        R = P[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(P[3], [0, 0, 0, 1], atol=0)
    for s in scans:
        assert np.isfinite(s).all() and s.ndim == 2 and s.shape[1] == 3


def test_sequence_consecutive_pair_registers(register, caps):
    scans, T_rel, _ = synthetic.make_sequence(
        seed=2, n_scans=3, points_per_plane=1500, clutter_points=900
    )
    res = _register_pair(register, caps, scans[0], scans[1])
    rre, rte = registration_errors(res.transform, jnp.asarray(T_rel[0]))
    assert float(rre) < 1.0, f"RRE {float(rre)}"
    assert float(rte) < 0.3, f"RTE {float(rte)}"


@pytest.mark.slow
def test_hall_production_scale_no_hypothesis_overflow():
    """Pillar-hall pairs at the full bench geometry must fit the
    eth-structured preset's hypothesis extraction: measured fan-out is
    <= 11 third-plane hits/match (tools/measure_content.py, 8 seeds)
    against per_match_hits=16, so no hypothesis may be dropped."""
    from fccf_pcr_tpu.models.fccf import get_model
    from fccf_pcr_tpu.pipeline.register import (
        STATUS_HYPOTHESIS_OVERFLOW,
        pre_downsample,
    )

    model = get_model("eth-structured")
    params, mcaps = model.params, model.caps
    fn = make_register_fn(params, mcaps)
    for seed in (1, 7):  # hall seeds of the structured bench batch
        src, tar, T_gt = synthetic.make_pair(
            seed=seed, scene="hall", points_per_plane=14000,
            clutter_points=6000, noise=0.006,
        )
        sp, sm = synthetic.pad_points(src, mcaps.raw_points)
        tp, tm = synthetic.pad_points(tar, mcaps.raw_points)
        sp, sm, s_ovf = pre_downsample(
            jnp.asarray(sp), jnp.asarray(sm), params, mcaps)
        tp, tm, t_ovf = pre_downsample(
            jnp.asarray(tp), jnp.asarray(tm), params, mcaps)
        assert not (bool(s_ovf) or bool(t_ovf))
        res = fn(sp, sm, tp, tm)
        assert int(res.status) & STATUS_HYPOTHESIS_OVERFLOW == 0, (
            f"seed {seed}: hypothesis overflow (status {int(res.status)})"
        )
        rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
        assert float(rre) < 2.0 and float(rte) < 0.2


def test_overlap_default_is_bit_identical():
    """overlap=1.0 (the default) must reproduce the pre-overlap generator
    exactly — every calibrated artifact (capacity presets, golden
    fixtures, bench tables) assumes the full-overlap scenes."""
    a = synthetic.make_pair(seed=5)
    b = synthetic.make_pair(seed=5, overlap=1.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_overlap_windows_share_expected_fraction():
    """overlap=f windows each scan to (1+f)/2 of the extent from opposite
    ends: the shared slab is f of the extent, T_gt is unchanged vs the
    full-overlap pair of the same seed, and both scans lose points."""
    src_full, tar_full, T_full = synthetic.make_pair(seed=7)
    for f in (0.3, 0.5, 0.7):
        src, tar, T = synthetic.make_pair(seed=7, overlap=f)
        np.testing.assert_array_equal(T, T_full)  # pose draw untouched
        assert len(src) < len(src_full) and len(tar) < len(tar_full)
        # undo the pose to compare windows in world coordinates
        src_w = src @ T[:3, :3].T + T[:3, 3]
        full_w = src_full @ T_full[:3, :3].T + T_full[:3, 3]
        # find the windowed axis: the one whose world span shrank
        spans_tar = np.ptp(tar_full, axis=0) - np.ptp(tar, axis=0)
        axis = int(np.argmax(spans_tar))
        assert spans_tar[axis] > 0.5, "no axis was windowed"
        lo = min(tar_full[:, axis].min(), full_w[:, axis].min())
        hi = max(tar_full[:, axis].max(), full_w[:, axis].max())
        cover = (1.0 + f) / 2.0 * (hi - lo)
        # each scan's window spans cover; the shared band is f of extent
        shared_lo = max(tar[:, axis].min(), src_w[:, axis].min())
        shared_hi = min(tar[:, axis].max(), src_w[:, axis].max())
        got = (shared_hi - shared_lo) / (hi - lo)
        assert abs(got - f) < 0.06, (
            f"overlap {f}: shared fraction {got:.3f} (cover {cover:.1f})"
        )


def test_overlap_out_of_range_raises():
    with pytest.raises(ValueError):
        synthetic.make_pair(seed=0, overlap=0.0)
    with pytest.raises(ValueError):
        synthetic.make_pair(seed=0, overlap=-0.2)


def test_partial_overlap_pair_registers(register, caps):
    """A 50%-overlap pair still registers: the shared slab's faces carry
    the match while each scan's one-sided faces must lose at fusion
    (verified at production density by the on-chip overlap sweep,
    docs/EVALUATION.md; this is the miniature CI pin)."""
    src, tar, T_gt = synthetic.make_pair(
        seed=42, points_per_plane=1500, clutter_points=900, overlap=0.5
    )
    res = _register_pair(register, caps, src, tar)
    rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
    assert float(rre) < 1.0, f"RRE {float(rre)}"
    assert float(rte) < 0.3, f"RTE {float(rte)}"
    assert int(res.status) & STATUS_DEGENERATE == 0
