"""Bitonic co-sort Pallas TPU kernel.

Drop-in replacement for the hot ``jax.lax.sort((key, *payloads),
num_keys=k)`` calls (ops/voxelize.py fused voxelization, verify/fine.py
join): the whole sort runs in one kernel with every operand VMEM-resident,
instead of XLA's generic variadic sort. Sorts are the largest single
remaining cost at bench shapes (~16 ms/batch-8 at office N=65536, ~20 ms
at heritage N=262144 — docs/ROADMAP.md), and they are row-count-bound
(payload width measured free), which is exactly the profile of a
comparison network paying HBM round-trips per stage.

Structure (classic bitonic network, ascending):
  for k in 0..log2(N)-1:         # phase: sorted runs of 2^(k+1)
    for d in 2^k, 2^(k-1), .. 1: # substage: compare-exchange distance d
      partner(i) = i XOR d       # never crosses the 128-lane boundary
                                  # for d < 128 (flat = row*128 + lane)
The XOR partner fetch is two ``pltpu.roll``s + an iota-bit select —
lane-dim rolls for d < 128, sublane-dim rolls for d >= 128 — so the
kernel needs no in-kernel gather/scatter/sort primitive at all.

Comparator: lexicographic over the key operands; with ``stable=True`` a
row-index operand is appended to the key chain, which makes the total
order strict and the output BIT-IDENTICAL to
``jax.lax.sort(..., is_stable=True)`` (ties broken by input position).
Payloads move under the same swap mask (the network IS the permutation,
matching the "payloads ride the sort" design rule — post-hoc permutation
gathers measured ~60 ms per 131k rows on v5e).

Feasibility of the Mosaic lowering (rolls on both axes at every
power-of-two shift) is a hardware question — tools/tpu_ab.py measures it
as the sort-pallas/* steps; exactness is pinned in interpret mode either
way (tests/test_pallas_sort.py). Selected per process via
FCCF_SORT_IMPL=pallas (utils/tuning.py; default keeps lax.sort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _iota_flat(R):
    """(R, 128) int32 of the flattened element index r*128 + c."""
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    return row * _LANES + col


def _partner(x, d, R):
    """value at the XOR partner: out[i] = x[i ^ d] (flat = row*128+lane).

    d < 128: i^d only flips lane bits, so the partner sits in the same
    row at lane c +/- d (c & d clear/set) — two lane rolls + select.
    d >= 128: the partner sits in row r +/- dr at the same lane — two
    sublane rolls + select. No wraparound is ever *used*: the selected
    direction always stays inside the array (c & d == 0 => c + d < 128).
    """
    if d < _LANES:
        fwd = pltpu.roll(x, _LANES - d, axis=1)  # out[c] = x[c + d mod 128]
        bwd = pltpu.roll(x, d, axis=1)           # out[c] = x[c - d mod 128]
        col = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
        return jnp.where((col & d) == 0, fwd, bwd)
    dr = d // _LANES
    fwd = pltpu.roll(x, R - dr, axis=0)
    bwd = pltpu.roll(x, dr, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    return jnp.where((row & dr) == 0, fwd, bwd)


def _stage(arrs, n_cmp, d, block, iota, R):
    """One compare-exchange pass at distance d within bitonic blocks of
    ``block``; the first ``n_cmp`` arrays form the lexicographic key."""
    partners = [_partner(a, d, R) for a in arrs]
    gt = jnp.zeros((R, _LANES), jnp.bool_)
    lt = jnp.zeros((R, _LANES), jnp.bool_)
    eq = jnp.ones((R, _LANES), jnp.bool_)
    for a, p in zip(arrs[:n_cmp], partners[:n_cmp]):
        gt = gt | (eq & (a > p))
        lt = lt | (eq & (a < p))
        eq = eq & (a == p)
    is_lo = (iota & d) == 0
    asc = (iota & block) == 0
    lo_eff = is_lo == asc
    # the lower element of an ascending pair keeps the min (swap on gt),
    # the upper keeps the max (swap on lt); ties never swap (consistent
    # on both sides of the pair by symmetry of gt/lt)
    swap = jnp.where(lo_eff, gt, lt)
    return [jnp.where(swap, p, a) for a, p in zip(arrs, partners)]


def _sort_kernel(*refs, N: int, n_cmp: int, n_arr: int):
    R = N // _LANES
    iota = _iota_flat(R)
    arrs = [refs[i][...] for i in range(n_arr)]
    log2n = N.bit_length() - 1
    for k in range(log2n):
        block = 1 << (k + 1)
        for j in range(k, -1, -1):
            arrs = _stage(arrs, n_cmp, 1 << j, block, iota, R)
    for i in range(n_arr):
        refs[n_arr + i][...] = arrs[i]


def _next_pow2(n):
    return 1 << max((n - 1).bit_length(), 8)  # >= 256 (two full rows)


def bitonic_cosort(
    keys, payloads=(), stable: bool = True, interpret: bool = False
):
    """Co-sort ``payloads`` by the lexicographic ``keys`` (a sequence of
    one or more (N,) int32/uint32 operands).

    Equivalent to ``jax.lax.sort((*keys, *payloads),
    num_keys=len(keys))`` — bit-identical to ``is_stable=True`` when
    ``stable`` (a row-index tie-break key rides the comparator; it is
    dropped from the output). Inputs of any length are padded to a
    power of two (>= 256) with maximal keys and sliced back, so padding
    can never displace real rows.
    """
    keys = list(keys)
    payloads = list(payloads)
    N = keys[0].shape[0]
    Np = _next_pow2(N)

    def pad_max(k):
        if Np == N:
            return k
        fill = jnp.full((Np - N,), jnp.iinfo(k.dtype).max, dtype=k.dtype)
        return jnp.concatenate([k, fill])

    def pad_zero(p):
        if Np == N:
            return p
        return jnp.pad(p, (0, Np - N))

    # order-preserving int32 view of uint32 keys (flip the sign bit):
    # Mosaic compare support is safest on i32, and the padded max key
    # stays maximal under the same map.
    cmp_keys = []
    u32_slots = []
    for i, k in enumerate(keys):
        k = pad_max(k)
        if k.dtype == jnp.uint32:
            u32_slots.append(i)
            k = jax.lax.bitcast_convert_type(
                k ^ jnp.uint32(0x80000000), jnp.int32
            )
        elif k.dtype != jnp.int32:
            raise TypeError(f"key dtype {k.dtype} not supported")
        cmp_keys.append(k)
    # The index operand also guarantees padding rows sort strictly AFTER
    # real rows of equal (sentinel) key, so the [:N] slice below can never
    # swap a real row's payload for a filler's — keep it whenever the
    # input was padded, even for unstable sorts.
    if stable or Np != N:
        cmp_keys.append(jnp.arange(Np, dtype=jnp.int32))
    n_cmp = len(cmp_keys)
    arrs = cmp_keys + [pad_zero(p) for p in payloads]
    n_arr = len(arrs)
    R = Np // _LANES
    arrs2d = [a.reshape(R, _LANES) for a in arrs]

    out = pl.pallas_call(
        functools.partial(_sort_kernel, N=Np, n_cmp=n_cmp, n_arr=n_arr),
        in_specs=[
            pl.BlockSpec(a.shape, memory_space=pltpu.VMEM) for a in arrs2d
        ],
        out_specs=tuple(
            pl.BlockSpec(a.shape, memory_space=pltpu.VMEM) for a in arrs2d
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*arrs2d)

    res = [a.reshape(Np)[:N] for a in out]
    out_keys = res[: len(keys)]
    for i in u32_slots:
        out_keys[i] = (
            jax.lax.bitcast_convert_type(out_keys[i], jnp.uint32)
            ^ jnp.uint32(0x80000000)
        )
    out_payloads = res[n_cmp:]
    return tuple(out_keys) + tuple(out_payloads)
