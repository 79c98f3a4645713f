"""Model registry: named pipeline configurations.

The reference is a single hard-coded parameterization (FCCF.cpp:120-176)
tuned per dataset only through the CLI leaf size (README.md:17). The
framework's "model family" equivalent is a registry of (params, capacities)
presets sized for the benchmark configurations in BASELINE.md / BASELINE.json:

  eth-office      ETH "Office", 0.1 m leaf (README demo config)
  eth-apartment   ETH "Apartment", 0.05 m leaf (denser indoor)
  eth-outdoor     Gazebo/Wood cross-season (larger extents, more clutter)
  resso           RESSO scenes (building-scale)
  heritage        Heritage (largest scene in Table I)
  tiny            CI/test-sized
"""

from __future__ import annotations

import dataclasses

from ..config import Capacities, FCCFParams, TEST_CAPS


@dataclasses.dataclass(frozen=True)
class FCCFModel:
    """A named, fully-specified registration pipeline configuration."""

    name: str
    params: FCCFParams
    caps: Capacities

    def make_fn(self, batched: bool = False):
        from ..pipeline.register import make_register_fn

        return make_register_fn(self.params, self.caps, batched=batched)


_STANDARD_CAPS = Capacities(
    max_points=1 << 17,
    max_voxels=2048,
    max_matches=2048,
    max_hypotheses=8192,
    max_reps=256,
    max_clusters=2048,
    max_residual=1 << 15,
    max_fine_voxels=1 << 14,
)

_DENSE_CAPS = dataclasses.replace(
    _STANDARD_CAPS,
    max_points=1 << 18,
    max_voxels=4096,
    max_residual=1 << 16,
    max_fine_voxels=1 << 15,
)

_LARGE_CAPS = dataclasses.replace(
    _DENSE_CAPS,
    max_points=1 << 19,
    max_voxels=8192,
    max_matches=4096,
    max_hypotheses=16384,
)

REGISTRY = {
    "eth-office": FCCFModel(
        "eth-office", FCCFParams(leaf_size=0.1), _STANDARD_CAPS
    ),
    "eth-apartment": FCCFModel(
        "eth-apartment", FCCFParams(leaf_size=0.05), _DENSE_CAPS
    ),
    "eth-outdoor": FCCFModel(
        "eth-outdoor", FCCFParams(leaf_size=0.1), _DENSE_CAPS
    ),
    "resso": FCCFModel("resso", FCCFParams(leaf_size=0.1), _LARGE_CAPS),
    "heritage": FCCFModel("heritage", FCCFParams(leaf_size=0.2), _LARGE_CAPS),
    "tiny": FCCFModel("tiny", FCCFParams(leaf_size=0.25), TEST_CAPS),
}


def get_model(name: str) -> FCCFModel:
    if name not in REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(REGISTRY)}"
        )
    return REGISTRY[name]
