"""PLY I/O: python/native parity, format coverage, CLI smoke."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from fccf_pcr_tpu.io import ply
from fccf_pcr_tpu.io.native import load_library


def test_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    p = tmp_path / "b.ply"
    ply.write_ply(str(p), pts, binary=True)
    got_py = ply.read_ply(str(p), use_native=False)
    np.testing.assert_array_equal(got_py, pts)
    if load_library() is not None:
        got_nat = ply.read_ply(str(p), use_native=True)
        np.testing.assert_array_equal(got_nat, pts)


def test_ascii_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    p = tmp_path / "a.ply"
    ply.write_ply(str(p), pts, binary=False)
    got = ply.read_ply(str(p), use_native=False)
    np.testing.assert_allclose(got, pts, atol=1e-4)
    if load_library() is not None:
        got_nat = ply.read_ply(str(p), use_native=True)
        np.testing.assert_allclose(got_nat, pts, atol=1e-4)


def test_mixed_properties(tmp_path):
    """Vertices with double coords + extra scalar properties, like many
    real scanner exports."""
    p = tmp_path / "c.ply"
    n = 64
    with open(p, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\n"
            b"comment scanner export\n"
            b"element vertex 64\n"
            b"property float intensity\n"
            b"property double x\nproperty double y\nproperty double z\n"
            b"property uchar red\n"
            b"end_header\n"
        )
        for i in range(n):
            f.write(struct.pack("<fdddB", 0.5, i * 0.1, i * 0.2, i * 0.3, 7))
    want = np.stack(
        [np.arange(n) * 0.1, np.arange(n) * 0.2, np.arange(n) * 0.3], axis=-1
    ).astype(np.float32)
    np.testing.assert_allclose(ply.read_ply(str(p), use_native=False), want, atol=1e-5)
    if load_library() is not None:
        np.testing.assert_allclose(ply.read_ply(str(p)), want, atol=1e-5)


def test_not_a_ply(tmp_path):
    p = tmp_path / "x.ply"
    p.write_bytes(b"hello world\n")
    with pytest.raises(ValueError):
        ply.read_ply(str(p), use_native=False)


def test_native_batch_subsample_matches_pad_points(tmp_path):
    """The C batch loader's overflow subsample must be BIT-IDENTICAL to
    the Python fallback's np.linspace(0, m-1, cap).astype(int64)
    (synthetic.pad_points), or results differ by whether libfccf_io.so
    is built. Cases include prior integer-division mismatches (136/100)
    and the capacity==1 division-by-zero."""
    from fccf_pcr_tpu.io.native import native_read_ply_batch
    from fccf_pcr_tpu.io.synthetic import pad_points

    if load_library() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    for m, cap in [(136, 100), (1000, 137), (5, 1), (7, 3), (8192, 8191)]:
        pts = rng.normal(size=(m, 3)).astype(np.float32)
        path = str(tmp_path / f"p{m}_{cap}.ply")
        ply.write_ply(path, pts)
        npts, nmask, ncnt = native_read_ply_batch([path], cap)
        want, wmask = pad_points(pts, cap)
        np.testing.assert_array_equal(npts[0], want, err_msg=f"{m}/{cap}")
        np.testing.assert_array_equal(nmask[0], wmask)
        assert int(ncnt[0]) == m  # true size reported even when subsampled


def test_native_rejects_malformed_headers(tmp_path):
    """Corrupt headers must fail into the Python fallback (None), never
    parse into garbage: a truncated property line would shift every
    binary column offset, and an absurd element count would wrap the
    allocation size and overrun the heap."""
    from fccf_pcr_tpu.io.native import native_read_ply_batch

    if load_library() is None:
        pytest.skip("native library not built")
    bad = tmp_path / "bad.ply"
    bad.write_text(
        "ply\nformat binary_little_endian 1.0\nelement vertex 4\n"
        "property float\nproperty float y\nproperty float z\nend_header\n"
    )
    assert native_read_ply_batch([str(bad)], 8) is None
    huge = tmp_path / "huge.ply"
    huge.write_text(
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 1537228672809129302\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n" + "\x00" * 120
    )
    assert native_read_ply_batch([str(huge)], 8) is None


@pytest.mark.slow
def test_cli_smoke(tmp_path):
    """Drive the CLI end-to-end on a tiny synthetic pair (CPU)."""
    from fccf_pcr_tpu.io import synthetic

    src, tar, _ = synthetic.make_pair(
        seed=1, points_per_plane=400, clutter_points=200, room=(7.0, 5.0, 3.0)
    )
    ply.write_ply(str(tmp_path / "src.ply"), src)
    ply.write_ply(str(tmp_path / "tar.ply"), tar)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "fccf_pcr_tpu",
            str(tmp_path / "src.ply"),
            str(tmp_path / "tar.ply"),
            "0.25",
            "--caps",
            "tiny",
            "--device",
            "cpu",
            "--json",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    rec = json.loads(out.stdout.strip().splitlines()[-1])
    T = np.asarray(rec["transform"])
    assert T.shape == (4, 4)
    assert np.isfinite(T).all()


def test_cli_caps_presets_resolve():
    """--caps accepts every registry preset name and resolves to that
    model's measured capacities (plus the generic envelopes)."""
    from fccf_pcr_tpu.cli import _caps_preset
    from fccf_pcr_tpu.config import TEST_CAPS
    from fccf_pcr_tpu.models.fccf import REGISTRY

    assert _caps_preset("tiny") == TEST_CAPS
    for name, model in REGISTRY.items():
        if name == "tiny":
            continue
        assert _caps_preset(name) == model.caps, name
    assert _caps_preset("large").max_hypotheses == 16384
    assert _caps_preset("default").max_points >= TEST_CAPS.max_points
