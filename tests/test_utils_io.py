"""Visualization exports and record appenders."""

import numpy as np

from fccf_pcr_tpu.io import ply
from fccf_pcr_tpu.io.visualize import export_faces, export_registration
from fccf_pcr_tpu.utils.records import append_csv_cell, append_jsonl


def test_export_faces_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    face = rng.integers(-1, 4, 500)
    p = tmp_path / "faces.ply"
    export_faces(str(p), pts, face, n_faces=4)
    back = ply.read_ply(str(p), use_native=False)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_export_registration(tmp_path):
    rng = np.random.default_rng(1)
    src = rng.normal(size=(100, 3)).astype(np.float32)
    tar = rng.normal(size=(80, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 2, 3]
    p = tmp_path / "reg.ply"
    export_registration(str(p), src, tar, T)
    back = ply.read_ply(str(p), use_native=False)
    assert back.shape == (180, 3)
    np.testing.assert_allclose(back[80:], src + T[:3, 3], atol=1e-5)


def test_append_csv_cell(tmp_path):
    p = str(tmp_path / "r.csv")
    append_csv_cell(p, 0, 1.5)
    append_csv_cell(p, 1, "office")
    append_csv_cell(p, 0, 2.5)
    with open(p) as f:
        lines = f.read().splitlines()
    assert lines[0] == "1.5,2.5"
    assert lines[1] == "office"


def test_append_jsonl(tmp_path):
    p = str(tmp_path / "r.jsonl")
    append_jsonl(p, {"a": 1})
    append_jsonl(p, {"b": [1, 2]})
    import json

    rows = [json.loads(x) for x in open(p)]
    assert rows == [{"a": 1}, {"b": [1, 2]}]
