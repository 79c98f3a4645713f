"""Rotation-consistency fusion gate (FCCFParams.fuse_rotation_gate_deg, default 10 deg)."""

import numpy as np
import jax.numpy as jnp

from fccf_pcr_tpu.fuse.fuse import fuse_transforms
from fccf_pcr_tpu.ops import geometry


def test_gate_semantics_via_fuse():
    """A disagreeing (90 deg off) candidate in the kept set tilts the
    blind axis-mean average; masking it (what the rotation gate does
    upstream) recovers the answer. (Pure 180-deg flips largely cancel in
    the normalized axis mean — the corruption mode is partial rotations.)
    """
    R_good = np.eye(3, dtype=np.float32)
    c, sn = 0.0, 1.0  # 90 deg about z
    R_off = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]], np.float32)
    quats = geometry.matrix_to_quat(jnp.asarray(np.stack([R_good, R_good, R_off])))
    ts = jnp.asarray(np.array([[0, 0, 0], [0, 0, 0], [5, 5, 0]], np.float32))
    scores = jnp.asarray(np.array([1.0, 0.9, 0.85], np.float32))

    # blind (reference) fusion: tilted by the disagreeing candidate
    T_blind = fuse_transforms(quats, ts, scores, jnp.array([True, True, True]))
    err_blind = float(geometry.rotation_error_deg(T_blind[:3, :3], jnp.eye(3)))
    assert err_blind > 20.0

    # gated fusion (disagreement masked out) recovers
    T_gated = fuse_transforms(quats, ts, scores, jnp.array([True, True, False]))
    err_gated = float(geometry.rotation_error_deg(T_gated[:3, :3], jnp.eye(3)))
    assert err_gated < 0.1


def test_pipeline_gate_param_wires_through(params, caps):
    """The param compiles and runs through register_pair."""
    import numpy as np

    from fccf_pcr_tpu import make_register_fn, registration_errors
    from fccf_pcr_tpu.io import synthetic

    p2 = params.replace(fuse_rotation_gate_deg=10.0)
    fn = make_register_fn(p2, caps)
    # NOTE: near-square rooms (e.g. 9 x 7 m) are genuinely 90-deg
    # ambiguous at the reference's 2 m plane-offset gate — use the default
    # 14 x 10 m room whose wall offsets differ by more than the gate.
    src, tar, T_gt = synthetic.make_pair(
        seed=23, points_per_plane=900, clutter_points=400
    )
    sp, sm = synthetic.pad_points(src, caps.max_points)
    tp, tm = synthetic.pad_points(tar, caps.max_points)
    res = fn(sp, sm, tp, tm)
    rre, rte = registration_errors(res.transform, jnp.asarray(T_gt))
    assert float(rre) < 0.5 and float(rte) < 0.15
