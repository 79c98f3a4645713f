"""Model registry: named pipeline configurations.

The reference is a single hard-coded parameterization (FCCF.cpp:120-176)
tuned per dataset only through the CLI leaf size (README.md:17). The
framework's "model family" equivalent is a registry of (params, capacities)
presets sized for the benchmark configurations in BASELINE.md / BASELINE.json:

  eth-office      ETH "Office", 0.1 m leaf (README demo config)
  eth-apartment   ETH "Apartment", 0.05 m leaf (denser indoor)
  eth-structured  Stairs + Hauptgebaude mixed batches (small-plane flights
                  and building-scale halls in one vmap batch)
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


# Capacity presets are sized from measured content statistics of the
# benchmark scene families (see docs/PERFORMANCE.md). Stage capacities
# (voxels/hypotheses/residual/fine) carry >= 1.4x headroom over observed
# maxima; the point capacities are tighter (~1.07x — they set the hot
# sort volume directly). EVERY bound is guarded at runtime: stage
# overflow raises a status bit, and pre_downsample's truncation flag is
# surfaced by every caller (CLI warning + record field, sweep records,
# bench/evaluate hard-fail). max_points is the POST-pre-downsample
# capacity (the hot pipeline's sort volume); max_raw_points is the
# raw-load capacity consumed by the untimed CLI-level first VoxelGrid
# pass (pre_downsample).
_STANDARD_CAPS = Capacities(      # office: raw<=124k, down<=61k, vox<=1012,
    max_points=1 << 16,           #   hyp<=1461, res<=16.3k, fine<=1133
    max_raw_points=1 << 17,
    max_voxels=1536,
    max_matches=2048,
    max_hypotheses=2048,
    max_reps=256,
    max_clusters=2048,
    max_residual=1 << 15,
    max_fine_voxels=2048,
)

_DENSE_CAPS = dataclasses.replace(  # apartment: raw<=248k, down<=122k,
    _STANDARD_CAPS,                 #   vox<=482, hyp>2048 on some scenes
    max_points=1 << 17,             #   (seed-3 clipped at 2048),
    max_raw_points=1 << 18,         #   res<=46.5k, fine<=1016
    max_voxels=1024,
    max_hypotheses=4096,
    max_residual=1 << 16,
    max_fine_voxels=2048,
)

_STRUCTURED_CAPS = dataclasses.replace(  # stairs: raw<=112k, down<=31.2k,
    _STANDARD_CAPS,                      #   vox<=260, hyp<=715, res<=9.0k,
    max_points=98304,                    #   fine<=310
    max_raw_points=147456,               # hall: raw<=132k, down<=91.4k,
    max_voxels=4096,                     #   vox<=2856, hyp<=4177,
    max_matches=4096,                    #   res<=22.0k, fine<=1921,
    max_hypotheses=6144,                 #   <=10 third-plane hits/match
    max_clusters=4096,                   # (6 seeds x 2 clouds per family)
    max_residual=1 << 15,
    max_fine_voxels=3072,
)

_OUTDOOR_CAPS = dataclasses.replace(  # cross-season: raw<=102k, down<=57k,
    _STANDARD_CAPS,                   #   vox<=1023, hyp<=1306, res<=20k,
    max_raw_points=1 << 18,           #   fine<=1230
    max_residual=1 << 15,
    max_fine_voxels=2048,
)

_LARGE_CAPS = dataclasses.replace(  # building-scale scenes: unmeasured,
    _DENSE_CAPS,                    # generous bounds
    max_points=1 << 18,
    max_raw_points=1 << 19,
    max_voxels=8192,
    max_matches=4096,
    max_hypotheses=16384,
    max_fine_voxels=1 << 15,        # sparse outdoor residuals spread wide
    wide_extent=True,               # full 2047-cell face extent (two-key sort)
)

REGISTRY = {
    "eth-office": FCCFModel(
        "eth-office", FCCFParams(leaf_size=0.1), _STANDARD_CAPS
    ),
    "eth-apartment": FCCFModel(
        "eth-apartment", FCCFParams(leaf_size=0.05), _DENSE_CAPS
    ),
    "eth-structured": FCCFModel(
        "eth-structured", FCCFParams(leaf_size=0.1), _STRUCTURED_CAPS
    ),
    "eth-outdoor": FCCFModel(
        "eth-outdoor", FCCFParams(leaf_size=0.1), _OUTDOOR_CAPS
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
