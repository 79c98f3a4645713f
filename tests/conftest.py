"""Test configuration: force an 8-virtual-device CPU backend.

Must run before any jax import (SURVEY.md §4: CPU-backend jax makes the
whole suite runnable without a TPU; sharding tests use the virtual mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocess-spawning tests inherit os.environ; with the remote-TPU tunnel
# down, axon's sitecustomize register() retries forever at interpreter
# BOOT, so a child python would hang before running any test code. The
# suite is CPU-only by design — strip the trigger so children boot clean.
# (Too late for THIS interpreter — sitecustomize already ran — which is
# why a tunnel-down suite launch must itself unset it: see docs/ROADMAP.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The container's sitecustomize registers a remote-TPU ("axon") PJRT plugin
# and force-selects jax_platforms="axon,cpu" at interpreter start; tests must
# run on the local CPU backend (8 virtual devices) regardless.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: the heavy pipeline compiles once per
# (params, caps) config and is reused across test runs. Host-keyed: a
# stale cross-container cache entry (different CPU features) loads with
# a different f32 reduction order and trips the golden bands — see
# fccf_pcr_tpu/utils/cache.py.
from fccf_pcr_tpu.utils.cache import host_keyed_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", host_keyed_cache_dir("tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fccf_pcr_tpu.config import TEST_CAPS, FCCFParams  # noqa: E402
from fccf_pcr_tpu.io import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def params():
    # leaf 0.25 m on the synthetic room keeps point counts inside TEST_CAPS.
    return FCCFParams(leaf_size=0.25)


@pytest.fixture(scope="session")
def caps():
    return TEST_CAPS


@pytest.fixture(scope="session")
def small_pair(caps):
    src, tar, T_gt = synthetic.make_pair(
        seed=3, points_per_plane=1500, clutter_points=900
    )
    src_p, src_m = synthetic.pad_points(src, caps.max_points)
    tar_p, tar_m = synthetic.pad_points(tar, caps.max_points)
    return src_p, src_m, tar_p, tar_m, np.asarray(T_gt)
