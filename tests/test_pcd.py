"""PCD reader/writer (reference includes pcl/io/pcd_io.h, FCCF.cpp:7)."""

import numpy as np
import pytest

from fccf_pcr_tpu.io import pcd


@pytest.fixture
def cloud():
    rng = np.random.default_rng(0)
    return rng.uniform(-20, 20, (257, 3)).astype(np.float32)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("binary", [True, False])
def test_roundtrip(tmp_path, cloud, binary, use_native):
    p = str(tmp_path / "c.pcd")
    pcd.write_pcd(p, cloud, binary=binary)
    out = pcd.read_pcd(p, use_native=use_native)
    np.testing.assert_allclose(out, cloud, atol=1e-5)


def test_native_matches_python(tmp_path, cloud):
    from fccf_pcr_tpu.io.native import native_read_pcd

    p = str(tmp_path / "c.pcd")
    pcd.write_pcd(p, cloud, binary=True)
    native = native_read_pcd(p)
    if native is None:
        pytest.skip("native library not built")
    np.testing.assert_array_equal(native, pcd.read_pcd(p, use_native=False))


def test_extra_fields_and_order(tmp_path, cloud):
    # PCL clouds often carry intensity/rgb; x/y/z must still extract
    n = len(cloud)
    inten = np.arange(n, dtype=np.float32)
    header = (
        "VERSION 0.7\nFIELDS intensity x y z\nSIZE 4 4 4 4\n"
        f"TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH {n}\nHEIGHT 1\n"
        f"POINTS {n}\nDATA binary\n"
    )
    p = str(tmp_path / "c.pcd")
    data = np.concatenate([inten[:, None], cloud], axis=1).astype("<f4")
    with open(p, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())
    np.testing.assert_allclose(pcd.read_pcd(p), cloud, atol=1e-5)


def test_pcl_padding_fields(tmp_path, cloud):
    # PCL PointNormal-style layout: multiple padding fields all named "_"
    n = len(cloud)
    header = (
        "VERSION 0.7\nFIELDS x y z _ normal_x _\nSIZE 4 4 4 4 4 4\n"
        f"TYPE F F F F F F\nCOUNT 1 1 1 1 1 1\nWIDTH {n}\nHEIGHT 1\n"
        f"POINTS {n}\nDATA binary\n"
    )
    pad = np.zeros((n, 1), np.float32)
    data = np.concatenate([cloud, pad, pad + 7.0, pad], axis=1).astype("<f4")
    p = str(tmp_path / "c.pcd")
    with open(p, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())
    np.testing.assert_allclose(pcd.read_pcd(p, use_native=False), cloud, atol=1e-5)
    from fccf_pcr_tpu.io.native import native_read_pcd

    native = native_read_pcd(p)
    if native is not None:
        np.testing.assert_allclose(native, cloud, atol=1e-5)


def _lzf_compress_literals(data: bytes) -> bytes:
    """Minimal valid LZF stream: literal runs only (ctrl < 32)."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i : i + 32]
        out.append(len(chunk) - 1)
        out.extend(chunk)
    return bytes(out)


def test_binary_compressed(tmp_path, cloud):
    n = len(cloud)
    # field-major blob: all x, all y, all z
    blob = b"".join(cloud[:, k].astype("<f4").tobytes() for k in range(3))
    comp = _lzf_compress_literals(blob)
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        f"COUNT 1 1 1\nWIDTH {n}\nHEIGHT 1\nPOINTS {n}\n"
        "DATA binary_compressed\n"
    )
    p = str(tmp_path / "c.pcd")
    with open(p, "wb") as f:
        f.write(header.encode())
        f.write(np.array([len(comp), len(blob)], "<u4").tobytes())
        f.write(comp)
    np.testing.assert_allclose(pcd.read_pcd(p), cloud, atol=1e-5)
    np.testing.assert_allclose(
        pcd.read_pcd(p, use_native=False), cloud, atol=1e-5
    )


def test_lzf_back_references():
    # handcrafted stream: 8 literals then a length-6 overlapping copy
    lit = bytes(range(1, 9))
    # ctrl for backref: length code L = real_len - 2 = 4 -> ctrl = (4<<5) | hi(offset)
    # offset encoding: ref = o - ((ctrl & 31) << 8) - src[i] - 1; want ref = o - 4
    stream = bytes([7]) + lit + bytes([(4 << 5) | 0, 3])
    out = pcd._lzf_decompress(stream, 14)
    assert out == lit + lit[4:8] + lit[4:6]


def test_lzf_rejects_corrupt_streams():
    """Corrupt LZF must raise, never silently return garbage: a negative
    back-reference would wrap via Python indexing, and a short literal
    slice would SHRINK the bytearray, shifting later field offsets."""
    # back reference pointing before the start of the output
    with pytest.raises(ValueError, match="back reference"):
        pcd._lzf_decompress(bytes([0, 1, (4 << 5) | 0, 200]), 8)
    # literal run longer than the remaining input
    with pytest.raises(ValueError, match="literal"):
        pcd._lzf_decompress(bytes([7, 1, 2]), 8)
    # truncated back-reference offset byte
    with pytest.raises(ValueError, match="truncated"):
        pcd._lzf_decompress(bytes([0, 1, (4 << 5) | 0]), 8)


def test_count_header_optional(tmp_path, cloud):
    """COUNT is optional per the PCD spec (defaults to 1) — the native
    reader already accepted such files; the Python path must too."""
    p = str(tmp_path / "nocount.pcd")
    pcd.write_pcd(p, cloud, binary=False)
    lines = [
        l for l in open(p).read().splitlines() if not l.startswith("COUNT")
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    np.testing.assert_allclose(
        pcd.read_pcd(p, use_native=False), cloud, atol=1e-4
    )


def test_xyz_with_count_gt1_rejected_cleanly(tmp_path):
    """x/y/z with COUNT != 1 is an unsupported layout: both readers must
    say so (native rc=3 -> fallback -> ValueError), not crash with a
    KeyError from a renamed structured-dtype field."""
    p = str(tmp_path / "c2.pcd")
    with open(p, "w") as f:
        f.write(
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            "COUNT 2 1 1\nWIDTH 1\nHEIGHT 1\nPOINTS 1\nDATA ascii\n"
            "0 0 1 2\n"
        )
    with pytest.raises(ValueError, match="COUNT"):
        pcd.read_pcd(p, use_native=False)


def test_read_cloud_dispatches(tmp_path, cloud):
    from fccf_pcr_tpu.io.pcd import read_cloud

    p1 = str(tmp_path / "c.pcd")
    pcd.write_pcd(p1, cloud)
    np.testing.assert_allclose(read_cloud(p1), cloud, atol=1e-5)

    from fccf_pcr_tpu.io import ply

    p2 = str(tmp_path / "c.ply")
    ply.write_ply(p2, cloud)
    np.testing.assert_allclose(read_cloud(p2), cloud, atol=1e-5)
