"""Probe: does Mosaic lower per-lane dynamic gathers inside a Pallas TPU
kernel?

Decides feasibility of moving the label-prop pointer jump into the kernel
(VMEM-speed ``label[label]``, worth ~1-3 ms/step at building-scale V —
docs/ROADMAP.md item 7). A fine-join binary-search kernel built on the
same primitive was already rejected on paper: scoring needs a per-cell
target histogram and Mosaic has no scatter/sort primitive, so the
sort-join remains the TPU-shaped structure (verify/fine.py).

Run on the axon TPU backend:  python tools/probe_gather.py
(tools/tpu_ab.py runs it as its ``probe/gather`` step).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[0, :]          # (1024,) values in VMEM
    idx = idx_ref[0, :]          # (1024,) int32 indices
    # per-lane gather: out[i] = tbl[idx[i]]
    out_ref[0, :] = jnp.take(tbl, idx, axis=0)


def main():
    N = 1024
    tbl = jnp.arange(N, dtype=jnp.int32) * 7
    idx = jnp.asarray(np.random.default_rng(0).integers(0, N, N), jnp.int32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, N), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N), lambda: (0, 0), memory_space=pltpu.VMEM),
    )
    try:
        out = fn(tbl.reshape(1, N), idx.reshape(1, N))
        want = np.asarray(tbl)[np.asarray(idx)]
        ok = np.array_equal(np.asarray(out).ravel(), want)
        print("GATHER LOWERS:", ok)
    except Exception as e:  # noqa: BLE001 — report, don't crash the runner
        print("GATHER FAILED TO LOWER:", type(e).__name__, str(e)[:500])


if __name__ == "__main__":
    main()
