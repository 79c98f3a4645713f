"""Automatic capacity sizing (models/auto.py): exact host-side content
measurement, envelope sizing, wide-extent detection, and a clean
end-to-end run of the pipeline under auto-sized caps."""

import numpy as np

from fccf_pcr_tpu import FCCFParams, make_register_fn, registration_errors
from fccf_pcr_tpu.io import synthetic
from fccf_pcr_tpu.models.auto import (
    auto_caps,
    auto_escalation_caps,
    measure_cloud,
)


def _pair(seed=7):
    return synthetic.make_pair(
        seed=seed, points_per_plane=1500, clutter_points=900
    )


def test_measure_cloud_matches_pipeline_downsample():
    """n_down is exact: one VoxelGrid centroid per occupied leaf cell."""
    from fccf_pcr_tpu.ops.voxelize import voxel_grid_downsample

    src, _, _ = _pair()
    params = FCCFParams(leaf_size=0.25)
    m = measure_cloud(src, params)
    pts, mask, _ = voxel_grid_downsample(
        np.asarray(src, np.float32), np.ones(len(src), bool), 0.25
    )
    assert m["n_down"] == int(np.asarray(mask).sum())
    assert m["n_raw"] == len(src)
    assert m["n_fvox"] >= 1 and (m["span_cells"] >= 1).all()


def test_auto_caps_cover_content_and_run_clean():
    src, tar, T_gt = _pair()
    params = FCCFParams(leaf_size=0.25)
    caps = auto_caps([src, tar], params)
    ms = [measure_cloud(c, params) for c in (src, tar)]
    assert caps.max_points >= max(m["n_down"] for m in ms)
    assert caps.raw_points >= max(m["n_raw"] for m in ms)
    assert caps.max_voxels >= 1.3 * max(m["n_fvox"] for m in ms)
    assert caps.max_voxels % 512 == 0  # Pallas label-prop block contract
    assert not caps.wide_extent

    sp, sm = synthetic.pad_points(src, caps.max_points)
    tp, tm = synthetic.pad_points(tar, caps.max_points)
    res = make_register_fn(params, caps)(sp, sm, tp, tm)
    assert int(res.status) == 0
    rre, rte = registration_errors(res.transform, T_gt.astype(np.float32))
    assert float(rre) < 0.5 and float(rte) < 0.15


def test_auto_caps_detects_wide_extent():
    rng = np.random.default_rng(0)
    # 300 m extent at leaf 0.1 / face 1.0: past the fused single-key
    # budget (127 cells/axis at ratio 10 -> 9 bits within, 7ish per axis)
    pts = rng.uniform(0.0, 300.0, size=(5000, 3)).astype(np.float32)
    params = FCCFParams(leaf_size=0.1, face_voxel_size=1.0)
    assert auto_caps([pts], params).wide_extent
    # same cloud, compact extent: not wide
    assert not auto_caps([pts * 0.1], params).wide_extent


def test_auto_escalation_envelope_dominates():
    import dataclasses

    src, tar, _ = _pair()
    params = FCCFParams(leaf_size=0.25)
    caps = auto_caps([src, tar], params)
    esc = auto_escalation_caps(caps)
    for f in dataclasses.fields(caps):
        lo, hi = getattr(caps, f.name), getattr(esc, f.name)
        if f.name == "max_raw_points":
            lo, hi = caps.raw_points, esc.raw_points
        if isinstance(lo, bool):
            assert hi or not lo
        else:
            assert hi >= lo, f.name
    # and the run_sweep guard accepts it (no pairs: check only)
    from fccf_pcr_tpu.pipeline.sweep import run_sweep

    records, summary = run_sweep([], params, caps, escalate_caps=esc)
    assert records == []


def test_measure_cloud_degenerate():
    params = FCCFParams(leaf_size=0.25)
    m = measure_cloud(np.zeros((0, 3), np.float32), params)
    assert m["n_raw"] == 0 and m["n_down"] == 0
    nanpts = np.full((4, 3), np.nan, np.float32)
    m = measure_cloud(nanpts, params)
    assert m["n_down"] == 0 and m["n_raw"] == 4
