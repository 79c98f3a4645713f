"""The benchmark's headline record must be gated on the accuracy check:
a fast-but-wrong pipeline may not report a clean pairs/s number."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_good_accuracy_emits_metric():
    rec = bench.make_record(40.0, np.array([0.1, 0.2]), np.array([0.01, 0.02]))
    assert rec["accuracy_ok"] is True
    assert rec["value"] == 40.0
    assert rec["vs_baseline"] > 2.0
    assert rec["rre_mean_deg"] == 0.15


def test_broken_transform_fails_loudly():
    # one pair 90 degrees off: the metric must be zeroed, not reported
    rec = bench.make_record(40.0, np.array([0.1, 90.0]), np.array([0.01, 0.02]))
    assert rec["accuracy_ok"] is False
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert rec["measured_pairs_per_s"] == 40.0  # still visible for debugging


def test_translation_failure_also_gates():
    rec = bench.make_record(40.0, np.array([0.1]), np.array([5.0]))
    assert rec["accuracy_ok"] is False
    assert rec["value"] == 0.0
