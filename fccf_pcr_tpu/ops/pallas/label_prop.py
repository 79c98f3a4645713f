"""Fused affinity + min-label-propagation Pallas TPU kernel.

Replaces the XLA path in features/faces.py (build a (V, V) boolean affinity,
then sweep `labels <- min(labels, affinity-neighbor labels)`) with a single
kernel that

  - computes the compare_normal / compare_plane predicates (FCCF.cpp:369-407)
    on the fly from per-voxel stats resident in VMEM — the (V, V) affinity
    never exists in HBM;
  - performs Gauss-Seidel sweeps: the TPU grid executes sequentially, and
    labels are updated in place, so later row blocks see earlier updates
    within the same sweep (faster convergence than the XLA Jacobi sweeps);
  - reports whether the final sweep changed anything, so the caller can run
    a convergence loop on top of a fixed in-kernel sweep count.

Layouts: stats are passed both voxel-major (V, 8) and field-major (8, V) so
the i-block loads columns and the j-chunks load rows without in-kernel
transposes of large tiles.

Field order: [nhx, nhy, nhz, cx, cy, cz, rdotc, c2] where nh* is the
normal scaled for the angle gate, c* the centroid, rdotc = raw_n . c and
c2 = |c|^2. The plane gate uses the *raw* normal, passed via a second
field block [rnx, rny, rnz, valid, 0, 0, 0, 0].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.tuning import env_int

# A/B overrides for the sweep schedule (any schedule reaches the same
# fixpoint — tests/test_pallas_label_prop.py pins schedule invariance;
# see utils/tuning.py and the jump() comment below for the measurements).
# An in-kernel path-halving variant (FCCF_JUMP_IN_KERNEL) was built and
# REMOVED round 4: label[label] is an arbitrary-index gather over the
# whole (V,) vector and Mosaic lowers neither 1D gathers ("Only 2D
# gather is supported", tools/probe_gather.py on v5e) nor the two-level
# row+lane composition the 2D take_along_axis form would need.
_DEFAULT_SWEEPS = env_int("FCCF_SWEEPS_PER_CALL", 2)
# JUMP default 1 (was 2): the round-3 on-chip A/B measured +4.0% pairs/s
# on heritage (sched-s2j1, tpu_ab_results.jsonl) with identical accuracy,
# and the convergence simulation (jump() comment below) says call counts
# are identical for J in {1, 2, 4, 8} — J=1 keeps the chain-shortcut
# safety margin at half the gather cost. J=0 costs one extra O(V^2) call
# (sched-s4j0 measured -2.0%/-6.7%).
_DEFAULT_JUMP = env_int("FCCF_JUMP_ROUNDS", 1)

_BIG = 2**30  # python int: jnp scalars become captured consts in kernels

BI = 128   # default i-block (rows updated per grid step)
BJ = 512   # default j-chunk (lanes scanned per inner iteration)


def _block_sizes(V):
    """Block sizes for V (must divide it). Measured on v5e at heritage
    scale (V=11264, batch 4): widening the j-chunk to 1024 amortizes the
    per-chunk field loads (198 -> 192 ms full step); GROWING BI is a
    measured dead end — (256, 512) ran 215 ms, worse than the (128, 512)
    baseline's 198 (coarser Gauss-Seidel blocks + a VMEM stack that
    scales with BI: ~16 live (BI, BJ) f32 temps, needing the raised
    vmem_limit_bytes below even at BJ=512). Keep BI=128."""
    bj = 1024 if V % 1024 == 0 else BJ
    return BI, bj


def _sweep_kernel(
    statsT_ref,  # (V, 16) voxel-major fields
    stats_ref,   # (16, V) field-major fields
    params_ref,  # (1, 4) SMEM: cos_gate, l, k, n_sweeps(unused)
    bound_ref,   # (1, 1) SMEM int32: occupied-slot prefix length (<= V)
    labels_in_ref,   # (1, V) int32 (aliased to labels_ref; unused directly)
    labels_ref,  # (1, V) int32 output, updated in place across grid steps
    changed_ref,  # (1, 1) int32 SMEM out
    *,
    V: int,
    BI: int,
    BJ: int,
):
    s = pl.program_id(0)
    ib = pl.program_id(1)
    n_s = pl.num_programs(0)
    i0 = ib * BI

    cos_gate = params_ref[0, 0]
    l = params_ref[0, 1]
    k = params_ref[0, 2]
    bound = bound_ref[0, 0]

    @pl.when((s == 0) & (ib == 0))
    def _():
        changed_ref[0, 0] = 0
        # The output VMEM block is NOT initialized from the aliased input
        # buffer on hardware (only final write-back is aliased) — seed it
        # explicitly before the first sweep reads it.
        labels_ref[...] = labels_in_ref[...]

    # Slots at index >= bound are all invalid (callers pass the occupied
    # prefix length): their labels stay at the seeded value and they can
    # never join an affinity, so both the i-block update and the j-chunk
    # scan stop at the bound. With prefix-compacted voxel slots this
    # skips the (V - bound)^2 dead corner of every sweep at runtime.
    @pl.when(i0 < bound)
    def _active_block():
        # i-block columns (BI, 1)
        nhx_i = statsT_ref[pl.ds(i0, BI), 0:1]
        nhy_i = statsT_ref[pl.ds(i0, BI), 1:2]
        nhz_i = statsT_ref[pl.ds(i0, BI), 2:3]
        cx_i = statsT_ref[pl.ds(i0, BI), 3:4]
        cy_i = statsT_ref[pl.ds(i0, BI), 4:5]
        cz_i = statsT_ref[pl.ds(i0, BI), 5:6]
        rdc_i = statsT_ref[pl.ds(i0, BI), 6:7]
        c2_i = statsT_ref[pl.ds(i0, BI), 7:8]
        rnx_i = statsT_ref[pl.ds(i0, BI), 8:9]
        rny_i = statsT_ref[pl.ds(i0, BI), 9:10]
        rnz_i = statsT_ref[pl.ds(i0, BI), 10:11]
        valid_i = statsT_ref[pl.ds(i0, BI), 11:12]

        def j_chunk(jc, cand):
            j0 = jc * BJ
            nhx_j = stats_ref[0:1, pl.ds(j0, BJ)]
            nhy_j = stats_ref[1:2, pl.ds(j0, BJ)]
            nhz_j = stats_ref[2:3, pl.ds(j0, BJ)]
            cx_j = stats_ref[3:4, pl.ds(j0, BJ)]
            cy_j = stats_ref[4:5, pl.ds(j0, BJ)]
            cz_j = stats_ref[5:6, pl.ds(j0, BJ)]
            rdc_j = stats_ref[6:7, pl.ds(j0, BJ)]
            c2_j = stats_ref[7:8, pl.ds(j0, BJ)]
            rnx_j = stats_ref[8:9, pl.ds(j0, BJ)]
            rny_j = stats_ref[9:10, pl.ds(j0, BJ)]
            rnz_j = stats_ref[10:11, pl.ds(j0, BJ)]
            valid_j = stats_ref[11:12, pl.ds(j0, BJ)]

            # (BI, BJ) broadcasting: column (BI,1) x row (1,BJ)
            cosm = nhx_i * nhx_j + nhy_i * nhy_j + nhz_i * nhz_j
            cicj = cx_i * cx_j + cy_i * cy_j + cz_i * cz_j
            d2 = jnp.maximum(c2_i + c2_j - 2.0 * cicj, 0.0)
            dist = jnp.sqrt(d2)
            # m1 = rn_i . (c_i - c_j); m2 = rn_j . (c_i - c_j)
            m1 = rdc_i - (rnx_i * cx_j + rny_i * cy_j + rnz_i * cz_j)
            m2 = (rnx_j * cx_i + rny_j * cy_i + rnz_j * cz_i) - rdc_j
            # |m| * (k*dist + 1) < l * dist  <=>  |m|/dist < l/(k*dist+1)
            lim = l * dist
            kd = k * dist + 1.0
            plane_ok = (jnp.abs(m1) * kd < lim) & (jnp.abs(m2) * kd < lim)
            plane_ok = plane_ok | (dist <= 1e-9)
            aff = (
                (cosm >= cos_gate)
                & plane_ok
                & (valid_i > 0.5)
                & (valid_j > 0.5)
            )

            lbl_j = labels_ref[0:1, pl.ds(j0, BJ)]
            c = jnp.min(
                jnp.where(aff, lbl_j, jnp.int32(_BIG)), axis=1, keepdims=True
            )
            return jnp.minimum(cand, c)

        nb = (bound + BJ - 1) // BJ
        cand = jax.lax.fori_loop(
            0, nb, j_chunk, jnp.full((BI, 1), _BIG, jnp.int32)
        )

        cur = labels_ref[0:1, pl.ds(i0, BI)]
        new = jnp.minimum(cur, cand.reshape(1, BI))
        any_change = jnp.any(new != cur)

        @pl.when((s == n_s - 1) & any_change)
        def _():
            changed_ref[0, 0] = 1

        labels_ref[0:1, pl.ds(i0, BI)] = new


def _pack_stats(normal, centroid, valid, angle_thresh_deg):
    """Build the two stat layouts consumed by the kernel."""
    V = normal.shape[0]
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    nh = normal / jnp.maximum(nrm, 1e-12)
    rdotc = jnp.sum(normal * centroid, axis=-1)
    c2 = jnp.sum(centroid * centroid, axis=-1)
    fields = jnp.stack(
        [
            nh[:, 0], nh[:, 1], nh[:, 2],
            centroid[:, 0], centroid[:, 1], centroid[:, 2],
            rdotc, c2,
            normal[:, 0], normal[:, 1], normal[:, 2],
            valid.astype(normal.dtype),
            jnp.zeros((V,), normal.dtype),
            jnp.zeros((V,), normal.dtype),
            jnp.zeros((V,), normal.dtype),
            jnp.zeros((V,), normal.dtype),
        ],
        axis=-1,
    )  # (V, 16)
    return fields, fields.T


def label_propagate_pallas(
    normal, centroid, valid, angle_thresh_deg, l, k,
    sweeps_per_call: int | None = None, max_calls: int = 32,
    interpret: bool = False, bound=None, jump_rounds: int | None = None,
):
    """Connected-component min labels of the affinity graph, via the fused
    kernel. Semantically identical to features.faces._pairwise_affinity +
    _label_propagate (Gauss-Seidel ordering reaches the same fixpoint).

    ``bound`` (traced int32, optional): every valid slot index is < bound.
    With prefix-compacted slots this prunes each sweep to the occupied
    (bound, bound) corner at runtime; semantics are unchanged because
    out-of-bound slots are invalid by contract (asserted in interpret/test
    paths by the caller).

    ``sweeps_per_call`` / ``jump_rounds`` default to the module schedule
    (2/2, overridable per process via FCCF_SWEEPS_PER_CALL /
    FCCF_JUMP_ROUNDS for on-chip A/Bs — any schedule is exact)."""
    if sweeps_per_call is None:
        sweeps_per_call = _DEFAULT_SWEEPS
    if jump_rounds is None:
        jump_rounds = _DEFAULT_JUMP
    V = normal.shape[0]
    bi, bj = _block_sizes(V)
    assert V % bi == 0 and V % bj == 0, f"V={V} must be a multiple of {bj}"
    statsT, stats = _pack_stats(normal, centroid, valid, angle_thresh_deg)
    cos_gate = jnp.cos(jnp.deg2rad(angle_thresh_deg)).astype(normal.dtype)
    params = jnp.array([[cos_gate, l, k, 0.0]], normal.dtype)
    if bound is None:
        bound = jnp.int32(V)
    bound_arr = jnp.asarray(bound, jnp.int32).reshape(1, 1)
    labels0 = jnp.where(valid, jnp.arange(V, dtype=jnp.int32), _BIG).reshape(1, V)

    call = pl.pallas_call(
        functools.partial(_sweep_kernel, V=V, BI=bi, BJ=bj),
        grid=(sweeps_per_call, V // bi),
        in_specs=[
            pl.BlockSpec((V, 16), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, V), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda s, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda s, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, V), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, V), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda s, i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, V), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            # The affinity expression keeps ~16 (BI, BJ) f32 temps live
            # on the VMEM stack; (128, 1024) tiles sit near Mosaic's
            # default 16 MB scoped limit. Raise the cap (v5e has 128 MB
            # physical VMEM) so tile-size tuning can't flip into a
            # compile-time OOM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def jump(labels):
        # Path-halving between kernel calls: shortcut chains with O(V)
        # gathers so only a few O(V^2) sweep calls are needed (see
        # features.faces.pointer_jump). Each round is a V-element random
        # gather (~10 ns/element) at the STATIC V — pass 2's compacted
        # call pays it at full V despite its tiny occupancy bound — so
        # rounds are a measurable cost at building-scale V. A Gauss-Seidel
        # convergence simulation on heritage-courtyard affinity graphs
        # (6 instances, V=11264, 5.3-7.9k occupied) measured call counts
        # IDENTICAL for J in {1, 2, 4, 8} (2-3 calls) and only +1 call at
        # J=0 — the components are near-cliques (coplanar voxels are
        # mutually affine at any distance), so long chains never form and
        # 8 rounds were pure overhead (~0.9 ms/round/batch-4 at heritage).
        # Default 2 keeps a margin; ANY schedule is exact (the convergence
        # loop stops only when a full sweep is a no-op, which implies
        # per-component-constant labels).
        if jump_rounds == 0:
            return labels
        l = labels.reshape(V)

        def body(_, x):
            return jnp.minimum(x, x[jnp.minimum(x, V - 1)])

        l = jax.lax.fori_loop(0, jump_rounds, body, l)
        return jnp.where(valid, l, jnp.int32(_BIG)).reshape(1, V)

    def body(state):
        labels, _, it = state
        labels, changed = call(statsT, stats, params, bound_arr, labels)
        return jump(labels), changed[0, 0] > 0, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_calls)

    labels, changed0 = call(statsT, stats, params, bound_arr, labels0)
    labels, _, _ = jax.lax.while_loop(
        cond, body, (jump(labels), changed0[0, 0] > 0, jnp.int32(1))
    )
    return labels.reshape(V)
