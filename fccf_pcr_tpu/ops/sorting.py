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

Selected once per process via FCCF_SORT_IMPL (utils/tuning.py). Exactness:
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


def _use_pallas():
    return _SORT_IMPL == "pallas" and jax.default_backend() in ("tpu", "axon")


def cosort(keys, payloads=(), stable: bool = True):
    """Sort ``(*keys, *payloads)`` by the lexicographic ``keys``.

    Equivalent to ``jax.lax.sort((*keys, *payloads),
    num_keys=len(keys), is_stable=stable)``; returns the same tuple.
    """
    keys = tuple(keys)
    payloads = tuple(payloads)
    if _use_pallas():
        from .pallas.sort import bitonic_cosort

        return bitonic_cosort(keys, payloads, stable=stable)
    return jax.lax.sort(
        (*keys, *payloads), num_keys=len(keys), is_stable=stable
    )
