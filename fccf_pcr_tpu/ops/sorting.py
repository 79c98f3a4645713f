"""Sort-implementation dispatch for the hot co-sorts.

Every hot stage moves payloads through a key sort (``payloads ride the
sort network`` — post-hoc permutation gathers measured ~60 ms per 131k
rows on v5e, ops/voxelize.py). Two interchangeable implementations:

  xla     ``jax.lax.sort`` (default) — the measured round-1..3 baseline.
  pallas  ``ops.pallas.sort.bitonic_cosort`` — one VMEM-resident bitonic
          network kernel per sort (TPU backends only; falls back to xla
          elsewhere). Pending an on-chip A/B (tools/tpu_ab.py
          sort-pallas/* steps); see the kernel docstring for the cost
          argument.

Selected once per process via FCCF_SORT_IMPL (utils/tuning.py), with
optional per-call-site overrides FCCF_SORT_IMPL_<SITE> (sites:
DOWNSAMPLE, STATS, FUSED, TABLE, JOIN — the five hot call sites below).
The sites differ in row count, key dtype/count and payload count, so the
kernel can win at one and lose at another; per-site selection lets the
on-chip A/B adopt exactly the winning subset. Exactness:
``stable=True`` (the default here AND in lax.sort — every pipeline call
site uses it) makes the pallas path BIT-IDENTICAL to lax.sort: the
row-index tie-break key gives the network the same unique total order, so
flipping the knob cannot change any pipeline output, only its speed.
``stable=False`` drops the index operand (one less array through the
network) at the cost of an implementation-defined within-tie order; no
pipeline call site uses it.
"""

from __future__ import annotations

import jax

from ..utils.tuning import env_choice

_SORT_IMPL = env_choice("FCCF_SORT_IMPL", "xla", ("xla", "pallas"))

SITES = ("downsample", "stats", "fused", "table", "join")

# Per-site override: empty/unset = inherit the global knob. Read once at
# import like every tuning knob (one process = one setting).
_SITE_IMPL = {
    s: env_choice(f"FCCF_SORT_IMPL_{s.upper()}", "", ("", "xla", "pallas"))
    for s in SITES
}


def _impl(site):
    if site is None:
        return _SORT_IMPL
    if site not in _SITE_IMPL:
        raise ValueError(f"unknown sort site {site!r}: expected one of {SITES}")
    return _SITE_IMPL[site] or _SORT_IMPL


def _use_pallas(site):
    return _impl(site) == "pallas" and jax.default_backend() in (
        "tpu", "axon"
    )


def cosort(keys, payloads=(), stable: bool = True, site: str | None = None):
    """Sort ``(*keys, *payloads)`` by the lexicographic ``keys``.

    Equivalent to ``jax.lax.sort((*keys, *payloads),
    num_keys=len(keys), is_stable=stable)``; returns the same tuple.
    ``site`` names the hot call site for the per-site implementation
    override (see module docstring); None always uses the global knob.
    """
    keys = tuple(keys)
    payloads = tuple(payloads)
    if _use_pallas(site):
        from .pallas.sort import bitonic_cosort

        return bitonic_cosort(keys, payloads, stable=stable)
    return jax.lax.sort(
        (*keys, *payloads), num_keys=len(keys), is_stable=stable
    )
