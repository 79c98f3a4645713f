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
_STANDARD_CAPS = Capacities(      # office: raw<=124k, down<=61k, vox<=1019,
    max_points=1 << 16,           #   match<=1610, hyp<=1954, res<=18.6k,
    max_raw_points=1 << 17,       #   fine<=1408, span<=30 cells
    max_voxels=1536,              # (8 bench seeds, tools/measure_content.py)
    # match/hyp lanes run TIGHT (1.27x/1.05x over the bench-seed maxima,
    # under the 1.4x envelope policy): the round-3 on-chip A/B measured
    # +9.6% pairs/s (tightcaps/office, tpu_ab_results.jsonl) with
    # bit-identical accuracy. Tight lanes are policy-legal only because
    # overflow raises a status bit and sweep drivers re-run flagged pairs
    # at auto_escalation_caps (evaluate.py --escalate-caps auto).
    max_matches=2048,
    max_hypotheses=2048,
    max_reps=256,
    max_clusters=2048,
    # Residual feeds the fine-verify join (12 sorted joins of
    # max_fine_voxels + max_residual rows per pair) — the tightest
    # policy-compliant bound (>= 1.4x measured) cuts dead sort rows.
    max_residual=28672,
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
    _STANDARD_CAPS,                      #   vox<=260, hyp<=925, res<=8.3k,
    max_points=98304,                    #   fine<=386, <=12 hits/match
    max_raw_points=147456,               # hall: raw<=132k, down<=91.4k,
    max_voxels=4096,                     #   vox<=2856, hyp<=4177,
    max_matches=4096,                    #   res<=19.7k, fine<=2578,
    max_hypotheses=6144,                 #   <=11 hits/match
    max_clusters=4096,                   # (8 seeds x 2 clouds per family,
    max_residual=28672,                  #  tools/measure_content.py;
    max_fine_voxels=4096,                #  res cap = 1.45x over 19.7k;
)                                        #  fine cap = 1.59x over 2578)

_OUTDOOR_CAPS = dataclasses.replace(  # cross-season (TPU path, 40 eval
    _STANDARD_CAPS,                   #   seeds): raw<=102k, down<=57k,
    max_raw_points=1 << 18,           #   vox<=1023, match<=1662, hyp<=2238
    # tight lanes (1.23x/1.14x over the 40-seed eval maxima): the round-3
    # A/B measured +19.8% pairs/s (tightcaps/cross-season) at identical
    # accuracy; escalation covers the tail (see _STANDARD_CAPS note).
    # eval seed 6's hyp=2238 exceeded an earlier 2048 cap, hence 2560.
    max_matches=2048,
    max_hypotheses=2560,
    max_residual=28672,               # res 1.43x over eval max
    max_fine_voxels=2048,
)

_RESSO_CAPS = Capacities(   # facade family (tools/measure_content.py over
    max_points=73728,       #   the 8 bench seeds): raw<=73.0k, down<=68.9k,
    max_raw_points=81920,   #   vox<=6613, match<=1052 (seed 5; TPU f32 face
    max_voxels=9216,        #   tie-flips can shift counts further, so 2x
    max_matches=2048,       #   headroom), hyp<=1092, <=5 hits/match,
    max_hypotheses=2048,    #   res<=6.5k, fine<=1802, span<=120 cells
    max_reps=256,
    max_clusters=1024,
    max_residual=10240,     # 1.57x over the 6.5k measured max
    max_fine_voxels=4096,
    wide_extent=True,       # RESSO blocks can span past the ~127 m
)                           #   single-key budget (leaf 0.1 / face 1.0)

_HERITAGE_CAPS = Capacities(  # courtyard family (measure_content, 8
    max_points=245760,        #   seeds, leaf 0.2 / face 2.0): raw<=283k,
    max_raw_points=294912,    #   down<=238k, vox<=8526, match<=960,
    # 9216 = 1.08x over the observed 8526 voxel max (O(V^2) label-prop
    # work scales with this cap): round-3 A/B +5.9% (tightcaps/heritage)
    # at identical accuracy; overflow is flagged + escalated like every
    # other bound. V must stay a multiple of 1024 for the Pallas j-chunk.
    max_voxels=9216,          #   hyp<=1299, seeds<=954, res<=36.5k (40-
    max_matches=2048,         #   seed eval max; 30.5k on the bench
    max_hypotheses=3072,      #   seeds), fine<=22.9k, span<=281 cells
    max_reps=256,             #   (0.5 m fine voxel, no aliasing).
    max_clusters=2048,        # Colonnade parallel-plane fan-out reaches
    max_residual=53248,       #   30 third-plane hits on one match (eval
    per_match_hits=48,        #   seed 38, TPU face path) — cap 48 (1.6x).
    max_fine_voxels=1 << 15,  # res 1.46x over the observed maximum
    wide_extent=True,
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
    # Building-scale presets. The heritage feature voxel scales with its
    # leaf (2.0 m at 0.2 m leaf, the same 10x ratio as office) — the
    # reference hard-codes 1 m (FCCF.cpp:134) because it never re-tunes
    # per dataset beyond the CLI leaf; at a >100 m extent a 1 m feature
    # grid yields ~21k voxels of O(V^2) face-growth work for no accuracy
    # gain over coarser plane patches.
    "resso": FCCFModel("resso", FCCFParams(leaf_size=0.1), _RESSO_CAPS),
    "heritage": FCCFModel(
        "heritage",
        FCCFParams(leaf_size=0.2, face_voxel_size=2.0),
        _HERITAGE_CAPS,
    ),
    "tiny": FCCFModel("tiny", FCCFParams(leaf_size=0.25), TEST_CAPS),
}


def get_model(name: str) -> FCCFModel:
    if name not in REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(REGISTRY)}"
        )
    return REGISTRY[name]
