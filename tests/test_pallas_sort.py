"""Bitonic co-sort kernel (ops/pallas/sort.py) vs lax.sort, and the
FCCF_SORT_IMPL dispatch (ops/sorting.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fccf_pcr_tpu.ops.pallas.sort import bitonic_cosort
from fccf_pcr_tpu.ops.sorting import cosort


def _ref(keys, payloads, stable):
    return jax.lax.sort(
        (*keys, *payloads), num_keys=len(keys), is_stable=stable
    )


@pytest.mark.parametrize("n", [256, 777, 1024, 4096])
def test_stable_single_key_bit_identical(n):
    """stable=True must match lax.sort(is_stable=True) exactly, including
    within-tie payload order, at power-of-two and padded sizes."""
    rng = np.random.default_rng(n)
    k = jnp.asarray(rng.integers(0, 37, n).astype(np.int32))  # heavy ties
    p1 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    p2 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int32))
    got = bitonic_cosort([k], [p1, p2], stable=True, interpret=True)
    want = _ref([k], [p1, p2], stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_unstable_is_a_valid_sort_with_consistent_rows():
    """stable=False: keys sorted; (key, payload) multiset preserved (rows
    move together even when the within-tie order differs from XLA's)."""
    rng = np.random.default_rng(5)
    n = 2048
    k = rng.integers(0, 100, n).astype(np.int32)
    p = rng.permutation(n).astype(np.float32)  # distinct -> row pairing checkable
    gk, gp = bitonic_cosort(
        [jnp.asarray(k)], [jnp.asarray(p)], stable=False, interpret=True
    )
    gk, gp = np.asarray(gk), np.asarray(gp)
    assert (np.diff(gk) >= 0).all()
    got_rows = sorted(zip(gk.tolist(), gp.tolist()))
    want_rows = sorted(zip(k.tolist(), p.tolist()))
    assert got_rows == want_rows


def test_uint32_keys_with_sentinel():
    """uint32 keys spanning the full range (incl. the 0xFFFFFFFF sentinel
    used by verify/fine.py) order correctly through the sign-flip map."""
    rng = np.random.default_rng(9)
    n = 1500
    k = rng.integers(0, 2**32, n, dtype=np.uint32)
    k[::5] = np.uint32(0xFFFFFFFF)
    p = rng.normal(size=n).astype(np.float32)
    got = bitonic_cosort(
        [jnp.asarray(k)], [jnp.asarray(p)], stable=True, interpret=True
    )
    want = _ref([jnp.asarray(k)], [jnp.asarray(p)], stable=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_two_key_lexicographic():
    """num_keys=2 (the wide-extent voxelize sort): lexicographic over
    (fkey, wkey), payloads ride."""
    rng = np.random.default_rng(3)
    n = 1024
    k1 = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    k2 = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    p = jnp.asarray(rng.normal(size=n).astype(np.float32))
    got = bitonic_cosort([k1, k2], [p], stable=True, interpret=True)
    want = _ref([k1, k2], [p], stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_vmap_batches_like_the_pipeline():
    """The register pipeline vmaps over pairs; the kernel must batch."""
    rng = np.random.default_rng(1)
    kb = jnp.asarray(rng.integers(0, 50, (4, 512)).astype(np.int32))
    pb = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
    got = jax.vmap(
        lambda k, p: bitonic_cosort([k], [p], stable=True, interpret=True)
    )(kb, pb)
    want = jax.vmap(lambda k, p: _ref([k], [p], stable=True))(kb, pb)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_key_only_sort():
    rng = np.random.default_rng(2)
    k = rng.integers(0, 2**31 - 1, 4096).astype(np.int32)
    (got,) = bitonic_cosort([jnp.asarray(k)], [], stable=False,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.sort(k))


def test_presorted_and_reverse_inputs():
    """Adversarial orders (already sorted, reversed, all-equal)."""
    n = 512
    asc = jnp.arange(n, dtype=jnp.int32)
    p = jnp.asarray(np.random.default_rng(0).normal(size=n).astype(np.float32))
    for k in (asc, asc[::-1], jnp.zeros(n, jnp.int32)):
        got = bitonic_cosort([k], [p], stable=True, interpret=True)
        want = _ref([k], [p], stable=True)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_bench_shape_office_sort():
    """The exact office fused-voxelize shape: 65536 rows, one int32 key
    with a sentinel tail, three f32 payloads, stable — bit-identical to
    lax.sort (this is the configuration the sort-pallas A/B flips)."""
    rng = np.random.default_rng(42)
    n = 65536
    k = rng.integers(0, 1 << 30, n).astype(np.int32)
    k[60000:] = np.iinfo(np.int32).max  # sentinel tail like masked points
    pays = [jnp.asarray(rng.normal(size=n).astype(np.float32))
            for _ in range(3)]
    got = bitonic_cosort([jnp.asarray(k)], pays, stable=True, interpret=True)
    want = _ref([jnp.asarray(k)], pays, stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_dispatch_default_is_lax_sort():
    """cosort with the default knob must be exactly lax.sort (the measured
    baseline) on every backend."""
    rng = np.random.default_rng(4)
    k = jnp.asarray(rng.integers(0, 20, 300).astype(np.int32))
    p = jnp.asarray(rng.normal(size=300).astype(np.float32))
    got = cosort((k,), (p,), stable=True)
    want = _ref([k], [p], stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_per_site_impl_resolution():
    """FCCF_SORT_IMPL_<SITE> overrides the global knob at exactly that
    site; empty/unset inherits; unknown sites are rejected (fresh import
    in a subprocess — the knobs are read once at module import)."""
    import subprocess
    import sys

    code = (
        "from fccf_pcr_tpu.ops import sorting as s\n"
        "assert s._impl(None) == 'xla'\n"
        "assert s._impl('join') == 'pallas'\n"
        "assert s._impl('fused') == 'xla'\n"
        "for site in s.SITES:\n"
        "    s._impl(site)\n"
        "try:\n"
        "    s._impl('nope')\n"
        "except ValueError:\n"
        "    print('OK')\n"
    )
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               FCCF_SORT_IMPL="xla",
               FCCF_SORT_IMPL_JOIN="pallas")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "OK"
