"""u64 emulation property tests vs the numpy-uint64 oracle (hard part #1)."""

import numpy as np

import jax.numpy as jnp

from miekki_tpu.ops import u64
from miekki_tpu.oracle import nthash


def rand_u64(rng, n):
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


class TestSplitJoin:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rand_u64(rng, 1000)
        hi, lo = u64.split(x)
        np.testing.assert_array_equal(u64.join(hi, lo), x)


class TestRotate:
    def test_rol_static_matches_oracle(self):
        rng = np.random.default_rng(1)
        x = rand_u64(rng, 200)
        pair = tuple(map(jnp.asarray, u64.split(x)))
        for r in [0, 1, 5, 31, 32, 33, 63, 64, 95]:
            got = u64.join(*map(np.asarray, u64.rol(pair, r)))
            np.testing.assert_array_equal(got, nthash.rol64(x, r), err_msg=f"r={r}")

    def test_rol_variable_matches_oracle(self):
        rng = np.random.default_rng(2)
        x = rand_u64(rng, 256)
        r = rng.integers(0, 64, size=256)
        pair = tuple(map(jnp.asarray, u64.split(x)))
        got = u64.join(*map(np.asarray, u64.rol(pair, jnp.asarray(r))))
        np.testing.assert_array_equal(got, nthash.rol64(x, r))

    def test_ror_variable_matches_oracle(self):
        rng = np.random.default_rng(3)
        x = rand_u64(rng, 256)
        r = rng.integers(0, 64, size=256)
        pair = tuple(map(jnp.asarray, u64.split(x)))
        got = u64.join(*map(np.asarray, u64.ror(pair, jnp.asarray(r))))
        np.testing.assert_array_equal(got, nthash.ror64(x, r))


class TestCompareMinSort:
    def test_less_and_min(self):
        rng = np.random.default_rng(4)
        a, b = rand_u64(rng, 500), rand_u64(rng, 500)
        # force some hi-equal cases to exercise the lo tiebreak
        b[:100] = (a[:100] & ~np.uint64(0xFFFFFFFF)) | (b[:100] & np.uint64(0xFFFFFFFF))
        pa = tuple(map(jnp.asarray, u64.split(a)))
        pb = tuple(map(jnp.asarray, u64.split(b)))
        np.testing.assert_array_equal(np.asarray(u64.less(pa, pb)), a < b)
        got_min = u64.join(*map(np.asarray, u64.minimum(pa, pb)))
        np.testing.assert_array_equal(got_min, np.minimum(a, b))

    def test_sort_matches_numpy(self):
        rng = np.random.default_rng(5)
        x = rand_u64(rng, 1000)
        x[::7] = x[0]  # duplicates
        pair = tuple(map(jnp.asarray, u64.split(x)))
        hi, lo = u64.sort(pair)
        got = u64.join(np.asarray(hi), np.asarray(lo))
        np.testing.assert_array_equal(got, np.sort(x))

    def test_sort_with_payload(self):
        rng = np.random.default_rng(6)
        x = rand_u64(rng, 100)
        payload = jnp.arange(100, dtype=jnp.int32)
        pair = tuple(map(jnp.asarray, u64.split(x)))
        hi, lo, pl = u64.sort(pair, payload)
        order = np.argsort(x, kind="stable")
        np.testing.assert_array_equal(np.asarray(pl), order)

    def test_inf_sentinel(self):
        pair = u64.inf_like((4,))
        assert bool(u64.is_inf(pair).all())
        assert u64.join(np.asarray(pair[0]), np.asarray(pair[1]))[0] == nthash.UINT64_MAX
