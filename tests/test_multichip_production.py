"""Multi-chip sharding at PRODUCTION capacities (VERDICT r3 item 7).

The dryrun (__graft_entry__.dryrun_multichip) and the sharding tests in
test_sweep.py run tiny capacities; these tests validate the v5e-8 story
at the real eth-office preset shapes on the 8-virtual-device CPU mesh
(conftest.py forces xla_force_host_platform_device_count=8):

  - sharded == unsharded on every result field for a full bench batch
    (seeds 0-7, 12k points/plane — the shapes the driver measures);
  - a sharded 2-batch sweep through pipeline/sweep.py produces
    accuracy-clean records at the office gate.
"""

import numpy as np
import pytest


def _office():
    import bench
    from fccf_pcr_tpu.models.fccf import get_model

    cfg = bench.CONFIGS["office"]
    model = get_model(cfg["model"])
    return bench, cfg, model


@pytest.mark.slow
def test_sharded_equals_unsharded_at_office_preset():
    import jax

    from fccf_pcr_tpu.io import synthetic
    from fccf_pcr_tpu.parallel.mesh import make_mesh, make_sharded_register_fn
    from fccf_pcr_tpu.pipeline.register import make_register_fn, pre_downsample

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    bench, cfg, model = _office()
    params, caps = model.params, model.caps
    pairs = bench.pairs_for_config(cfg, list(range(8)))
    pre = jax.jit(jax.vmap(lambda p, m: pre_downsample(p, m, params, caps)))
    sp = np.stack([synthetic.pad_points(p[0], caps.raw_points)[0] for p in pairs])
    sm = np.stack([synthetic.pad_points(p[0], caps.raw_points)[1] for p in pairs])
    tp = np.stack([synthetic.pad_points(p[1], caps.raw_points)[0] for p in pairs])
    tm = np.stack([synthetic.pad_points(p[1], caps.raw_points)[1] for p in pairs])
    spd, smd, _ = pre(sp, sm)
    tpd, tmd, _ = pre(tp, tm)

    rs = make_sharded_register_fn(params, caps, make_mesh())(spd, smd, tpd, tmd)
    ru = make_register_fn(params, caps, batched=True)(spd, smd, tpd, tmd)
    # same bands as test_sweep.test_sharded_equals_unsharded: integer-
    # quantized fine occupancy can step a count under different fusion
    # choices; anything larger is a real sharding bug
    score_fields = {"quick_score", "fine_score", "type_score"}
    for name, a, b in zip(rs._fields, rs, ru):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=5e-4 if name in score_fields else 1e-5,
            err_msg=f"field {name} diverges at production capacities",
        )
    # and the result is actually good, not just consistent
    from fccf_pcr_tpu import registration_errors

    T_gt = np.stack([p[2] for p in pairs]).astype(np.float32)
    rre, rte = registration_errors(rs.transform, T_gt)
    assert float(np.max(np.asarray(rre))) < 0.5
    assert float(np.max(np.asarray(rte))) < 0.08


@pytest.mark.slow
def test_sharded_production_sweep_two_batches(tmp_path):
    import jax

    from fccf_pcr_tpu.pipeline.sweep import run_sweep

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    bench, cfg, model = _office()
    pairs = bench.pairs_for_config(cfg, list(range(16)))
    records, summary = run_sweep(
        [(p[0], p[1]) for p in pairs],
        model.params,
        model.caps,
        batch_size=8,
        ground_truth=[p[2] for p in pairs],
        use_mesh=True,
        out_path=str(tmp_path / "office_sweep.jsonl"),
    )
    assert summary["n_pairs"] == 16
    assert len(records) == 16
    for r in records:
        assert r["rre_deg"] < 0.5 and r["rte_m"] < 0.08, r
        assert r["status"] == 0, r
