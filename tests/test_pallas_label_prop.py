"""Pallas fused affinity+label-prop kernel vs the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fccf_pcr_tpu.features.faces import _label_propagate, _pairwise_affinity
from fccf_pcr_tpu.ops.pallas.label_prop import label_propagate_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_xla_path(seed):
    rng = np.random.default_rng(seed)
    V = 512
    # clustered normals/centroids so real components form
    n_groups = 6
    gn = rng.normal(size=(n_groups, 3))
    gn /= np.linalg.norm(gn, axis=1, keepdims=True)
    gc = rng.uniform(-10, 10, (n_groups, 3))
    which = rng.integers(0, n_groups, V)
    # place centroids in the group plane so compare_plane holds in-group
    normal = (gn[which] + rng.normal(0, 0.01, (V, 3))).astype(np.float32)
    offsets = rng.uniform(-4, 4, (V, 3)).astype(np.float32)
    offsets -= (offsets * gn[which]).sum(1, keepdims=True) * gn[which]
    centroid = (gc[which] + offsets).astype(np.float32)
    valid = rng.uniform(size=V) > 0.15

    args = (
        jnp.asarray(normal),
        jnp.asarray(centroid),
        jnp.asarray(valid),
        5.0,
        0.5,
        5.0,
    )
    aff = _pairwise_affinity(*args)
    want = np.asarray(_label_propagate(aff, jnp.asarray(valid), 64))
    got = np.asarray(
        label_propagate_pallas(*args, sweeps_per_call=2, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("prefix", [1, 130, 512])
def test_kernel_bound_prunes_identically(prefix):
    """A runtime occupancy bound covering all valid slots must not change
    the fixpoint (slots past the bound are invalid by contract)."""
    rng = np.random.default_rng(7)
    V = 512
    n_groups = 5
    gn = rng.normal(size=(n_groups, 3))
    gn /= np.linalg.norm(gn, axis=1, keepdims=True)
    gc = rng.uniform(-10, 10, (n_groups, 3))
    which = rng.integers(0, n_groups, V)
    normal = (gn[which] + rng.normal(0, 0.01, (V, 3))).astype(np.float32)
    offsets = rng.uniform(-4, 4, (V, 3)).astype(np.float32)
    offsets -= (offsets * gn[which]).sum(1, keepdims=True) * gn[which]
    centroid = (gc[which] + offsets).astype(np.float32)
    valid = np.arange(V) < prefix  # prefix-compacted occupancy

    args = (
        jnp.asarray(normal),
        jnp.asarray(centroid),
        jnp.asarray(valid),
        5.0,
        0.5,
        5.0,
    )
    aff = _pairwise_affinity(*args)
    want = np.asarray(_label_propagate(aff, jnp.asarray(valid), 64))
    got = np.asarray(
        label_propagate_pallas(
            *args, sweeps_per_call=2, interpret=True,
            bound=jnp.int32(prefix),
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("schedule", [(2, 0), (1, 2), (4, 1)])
def test_schedule_invariance(schedule):
    """Labels are an exact integer fixpoint: ANY (sweeps_per_call,
    jump_rounds) schedule must converge to the identical component-min
    labels (the convergence loop only stops when a full sweep is a no-op,
    which implies per-component-constant labels)."""
    sweeps, jumps = schedule
    rng = np.random.default_rng(3)
    V = 512
    n_groups = 6
    gn = rng.normal(size=(n_groups, 3))
    gn /= np.linalg.norm(gn, axis=1, keepdims=True)
    gc = rng.uniform(-10, 10, (n_groups, 3))
    which = rng.integers(0, n_groups, V)
    normal = (gn[which] + rng.normal(0, 0.01, (V, 3))).astype(np.float32)
    offsets = rng.uniform(-4, 4, (V, 3)).astype(np.float32)
    offsets -= (offsets * gn[which]).sum(1, keepdims=True) * gn[which]
    centroid = (gc[which] + offsets).astype(np.float32)
    valid = rng.uniform(size=V) > 0.15

    args = (
        jnp.asarray(normal),
        jnp.asarray(centroid),
        jnp.asarray(valid),
        5.0,
        0.5,
        5.0,
    )
    want = np.asarray(
        label_propagate_pallas(*args, interpret=True)  # default schedule
    )
    got = np.asarray(
        label_propagate_pallas(
            *args, sweeps_per_call=sweeps, jump_rounds=jumps, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)
