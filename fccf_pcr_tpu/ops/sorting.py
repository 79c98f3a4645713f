"""The hot co-sorts: one entry point for every key-sort that moves
payloads ("payloads ride the sort network" — post-hoc permutation
gathers measured ~60 ms per 131k rows on v5e, ops/voxelize.py).

``jax.lax.sort`` is the implementation, by measurement. A Pallas
bitonic co-sort kernel (whole network VMEM-resident, XOR partners as
two ``pltpu.roll``s, payloads riding the swap mask, stable mode
bit-identical to ``lax.sort(is_stable=True)``) was built in round 3 and
REMOVED in round 4 after the on-chip A/B: at the primary call-site
shape (office fused voxelize, 65536 rows, 1 int32 key + 3 f32 payloads)
it measured 0.400 ms vs lax.sort's 0.203 ms on v5e — 2x SLOWER, with a
~13-minute Mosaic compile at that size (tools/tpu_ab.py probe history,
2026-08-19). XLA's variadic sort is simply the right tool on TPU: an
O(n log n)-pass implementation the bitonic O(n log^2 n) network cannot
beat once n reaches the shapes that matter, and the sort machinery that
trace-attribution flags (~16-20 ms/batch) is sort *volume* (row count x
call count), which capacity tightening attacks directly
(models/fccf.py tightcaps notes) — not per-sort overhead.

``site`` names the hot call site (downsample | stats | fused | table |
join); it is retained in the signature so call sites stay
self-documenting and a future per-site implementation experiment has
its hooks, but it selects nothing today.
"""

from __future__ import annotations

import jax

SITES = ("downsample", "stats", "fused", "table", "join")


def cosort(keys, payloads=(), stable: bool = True, site: str | None = None):
    """Sort ``(*keys, *payloads)`` by the lexicographic ``keys``;
    equivalent to ``jax.lax.sort((*keys, *payloads), num_keys=len(keys),
    is_stable=stable)`` and returns the same tuple."""
    if site is not None and site not in SITES:
        raise ValueError(f"unknown sort site {site!r}: expected one of {SITES}")
    keys = tuple(keys)
    payloads = tuple(payloads)
    return jax.lax.sort(
        (*keys, *payloads), num_keys=len(keys), is_stable=stable
    )
