"""Padding invariance (SURVEY.md §4): the registered transform must not
depend on the fixed-shape capacities as long as nothing overflows."""

import numpy as np
import jax.numpy as jnp
import pytest

from fccf_pcr_tpu import make_register_fn, registration_errors
from fccf_pcr_tpu.io import synthetic


@pytest.mark.slow
def test_transform_invariant_under_capacity_padding(params, caps):
    src, tar, T_gt = synthetic.make_pair(
        seed=17, points_per_plane=900, clutter_points=400, room=(9.0, 7.0, 3.0)
    )

    results = []
    for c in [
        caps,
        caps.replace(
            max_points=caps.max_points * 2,
            max_voxels=caps.max_voxels * 2,
            max_hypotheses=caps.max_hypotheses * 2,
            max_clusters=caps.max_clusters * 2,
            max_residual=caps.max_residual * 2,
            max_fine_voxels=caps.max_fine_voxels * 2,
        ),
    ]:
        fn = make_register_fn(params, c)
        sp, sm = synthetic.pad_points(src, c.max_points)
        tp, tm = synthetic.pad_points(tar, c.max_points)
        res = fn(sp, sm, tp, tm)
        assert int(res.status) == 0, f"overflow at caps {c}"
        results.append(np.asarray(res.transform))

    # Both capacity configurations must recover the ground truth; the
    # cross-difference is bounded by algorithmic robustness, not bitwise
    # (longer arrays change cumsum tree shapes -> borderline predicate
    # flips can move one voxel/hypothesis).
    for T in results:
        rre, rte = registration_errors(jnp.asarray(T), jnp.asarray(T_gt))
        assert float(rre) < 0.5, float(rre)
        assert float(rte) < 0.05, float(rte)
    rre, rte = registration_errors(
        jnp.asarray(results[0]), jnp.asarray(results[1])
    )
    assert float(rre) < 0.5, float(rre)
    assert float(rte) < 0.05, float(rte)
