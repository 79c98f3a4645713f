"""Evaluation harness (tools/evaluate.py): raw-truncation detection.

pad_points subsamples host-side when a raw cloud exceeds
caps.raw_points; pre_downsample's overflow flag cannot see that, so the
harness must detect it itself (a silently truncated input must never
masquerade as a clean evaluation row)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_evaluate_flags_raw_truncation():
    from tools.evaluate import evaluate_config

    # 1500/900 rooms have ~13.5k raw points; TEST_CAPS raw capacity is
    # 8192, so every pair is subsampled at load — each row must carry
    # bit 1 even though the pipeline itself runs clean on the subsample.
    cfg = dict(
        model="tiny",
        scene=dict(points_per_plane=1500, clutter_points=900),
        pair=dict(),
    )
    r = evaluate_config("raw-trunc", cfg, seeds=2, batch=2)
    assert r["nonzero_status"] == 2
    assert all(st & 1 for st in r["flagged_seeds"].values())
    assert r["n_escalated"] == 0  # no escalate_caps given


def test_evaluate_escalate_caps_auto():
    """escalate_caps='auto' resolves to auto_escalation_caps(model.caps)
    per config and re-runs exactly the flagged seeds. With raw
    truncation (a host-side load limit auto-escalation deliberately does
    NOT raise — the cloud cannot grow, the cap is exact), the re-run
    happens but the flag persists: n_escalated counts the attempt, the
    status keeps the truth."""
    from tools.evaluate import evaluate_config

    cfg = dict(
        model="tiny",
        scene=dict(points_per_plane=1500, clutter_points=900),
        pair=dict(),
    )
    r = evaluate_config("raw-trunc-esc", cfg, seeds=2, batch=2,
                        escalate_caps="auto")
    assert r["n_escalated"] == 2
    assert all(st & 1 for st in r["flagged_seeds"].values())
