"""Score-weighted fusion of the per-type best transforms.

Rebuild of ``weight_normal`` (FCCF.cpp:1253-1289) and ``fuse_answer``
(FCCF.cpp:1291-1368, C17): translation is the score-weighted mean; rotation
is rebuilt (two Rodrigues steps) from the score-weighted, normalized means
of the rotated x/y axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import geometry

_XHAT = np.array([1.0, 0.0, 0.0], np.float32)
_YHAT = np.array([0.0, 1.0, 0.0], np.float32)


def fuse_transforms(quat, t, score, valid):
    """quat (K,4), t (K,3), score (K,), valid (K,) -> fused 4x4.

    Weights are score / sum(score) over the kept set (:1298-1300, :1272).
    Callers guarantee at least one valid entry with positive score; a fully
    degenerate set yields identity (documented fix of the reference's
    0/0 -> NaN behavior).
    """
    w = jnp.where(valid, score, 0.0)
    s = jnp.sum(w)
    w = w / jnp.maximum(s, 1e-20)
    mean_t = w @ t
    K = quat.shape[0]
    x = geometry.quat_rotate(quat, jnp.broadcast_to(_XHAT, (K, 3)))
    y = geometry.quat_rotate(quat, jnp.broadcast_to(_YHAT, (K, 3)))
    nt1 = geometry.normalize(w @ x)
    nt2 = geometry.normalize(w @ y)
    R = geometry.rotation_from_two_axes(nt1, nt2)
    T = geometry.make_transform(R, mean_t)
    return jnp.where(s > 0, T, jnp.eye(4, dtype=T.dtype))
