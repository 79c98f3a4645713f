"""Probe: Pallas bitonic co-sort vs lax.sort at bench shapes, standalone.

Times ONLY the sort (device-pinned inputs, steady state) so the kernel can
be iterated on without full bench runs. Shapes mirror the five hot call
sites (ops/sorting.SITES — each has a per-site adoption knob
FCCF_SORT_IMPL_<SITE>):
  - (65536,)  i32 key + 3 f32 payloads   (office fused/downsample/stats)
  - (262144,) i32 key + 3 f32 payloads   (heritage raw/leaf sorts)
  - (65536,)  2 i32 keys + 3 f32 payloads (fused two-key lexicographic path)
  - (131072,) u32 key, no payloads       (fine-verify source-table sort)
  - (61440,)  u32 key + 1 f32 payload    (fine-verify join, padded to 64k)

Run on the axon TPU backend:  python tools/probe_sort.py
(tools/tpu_ab.py runs it as its ``probe/sort`` step.)
"""

import json
import os
import sys
import time

# Runnable as ``python tools/probe_sort.py`` from anywhere: the package
# lives at the repo root, not next to this script.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from fccf_pcr_tpu.ops.pallas.sort import bitonic_cosort

    rng = np.random.default_rng(0)
    # (name, n, key dtypes, payload count) — one case per sort site shape
    cases = [
        ("office-voxelize-64k", 65536, (np.int32,), 3),
        ("heritage-voxelize-256k", 262144, (np.int32,), 3),
        ("fused-2key-64k", 65536, (np.int32, np.int32), 3),
        ("fine-table-128k", 131072, (np.uint32,), 0),
        ("fine-join-60k", 61440, (np.uint32,), 1),
    ]
    for name, n, kdts, n_pay in cases:
        ks = []
        for kdt in kdts:
            if kdt is np.uint32:
                ks.append(rng.integers(0, 2**31, n, dtype=np.uint32))
            else:
                ks.append(rng.integers(0, 2**30, n).astype(np.int32))
        pays = [rng.normal(size=n).astype(np.float32) for _ in range(n_pay)]
        dk = [jax.device_put(jnp.asarray(k)) for k in ks]
        dp = [jax.device_put(jnp.asarray(p)) for p in pays]
        nk = len(ks)

        lax_fn = jax.jit(
            lambda *ops, _nk=nk: jax.lax.sort(ops, num_keys=_nk)
        )
        # stable=True on both sides — that is the pipeline configuration
        # (lax.sort's default) and makes the outputs bit-comparable.
        pal_fn = jax.jit(
            lambda *ops, _nk=nk: bitonic_cosort(
                list(ops[:_nk]), list(ops[_nk:]), stable=True
            )
        )
        rec = {"probe": name, "n": n, "keys": nk, "payloads": n_pay}
        want = None
        try:
            rec["lax_ms"] = round(_time(lax_fn, (*dk, *dp)), 4)
            want = lax_fn(*dk, *dp)
        except Exception as e:  # noqa: BLE001
            rec["lax_error"] = f"{type(e).__name__}: {e}"[:300]
        try:
            rec["pallas_ms"] = round(_time(pal_fn, (*dk, *dp)), 4)
            got = pal_fn(*dk, *dp)
            assert (np.diff(np.asarray(got[0]).astype(np.int64)) >= 0).all()
            if "lax_ms" in rec:
                rec["speedup"] = round(rec["lax_ms"] / rec["pallas_ms"], 3)
            if want is not None:
                # reuse the already-computed outputs; a failure here is a
                # pallas failure and must not abort the remaining cases
                rec["bit_identical"] = bool(
                    all(np.array_equal(np.asarray(x), np.asarray(y))
                        for x, y in zip(want, got))
                )
        except Exception as e:  # noqa: BLE001
            rec["pallas_error"] = f"{type(e).__name__}: {e}"[:300]
            rec.pop("speedup", None)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
