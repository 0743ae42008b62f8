"""Pallas kernel parity vs the XLA reference paths, run in interpreter mode
on CPU (the same kernels are exercised compiled-on-TPU by tools/tpu_eval.py,
which also checks them against the numpy oracle on device)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miekki_tpu.ops import hash as H
from miekki_tpu.ops import intersect as I
from miekki_tpu.ops import pallas_hash as PH
from miekki_tpu.ops import pallas_intersect as PI
from miekki_tpu.ops import u64

INTERPRET = jax.default_backend() != "tpu"


def test_hash_kernel_matches_xla():
    rng = np.random.default_rng(0)
    k = 31
    codes = jnp.asarray(
        rng.integers(0, 5, size=(16, 512 + k - 1), dtype=np.int64), jnp.int32
    )
    (h0, l0), v0 = H.hash_windows(codes, k)
    (h1, l1), v1 = PH.hash_windows_pallas(codes, k, interpret=INTERPRET)
    assert np.array_equal(np.asarray(h0), np.asarray(h1))
    assert np.array_equal(np.asarray(l0), np.asarray(l1))
    assert np.array_equal(np.asarray(v0), np.asarray(v1))


def test_hash_kernel_row_padding():
    """Row counts not divisible by the block size are INF-padded."""
    rng = np.random.default_rng(1)
    k = 21
    codes = jnp.asarray(
        rng.integers(0, 4, size=(5, 256 + k - 1), dtype=np.int64), jnp.int32
    )
    (h0, l0), _ = H.hash_windows(codes, k)
    (h1, l1), _ = PH.hash_windows_pallas(codes, k, interpret=INTERPRET)
    assert np.array_equal(np.asarray(h0), np.asarray(h1))
    assert np.array_equal(np.asarray(l0), np.asarray(l1))


@pytest.mark.parametrize("ti,tj,s", [(13, 10, 50), (8, 16, 64), (3, 3, 17)])
def test_intersect_kernel_matches_xla(ti, tj, s):
    rng = np.random.default_rng(ti * 100 + tj)
    pad = np.uint64(0xFFFFFFFFFFFFFFFF)
    pool = np.unique(rng.integers(0, 2**52, size=6 * s, dtype=np.uint64))
    tab = np.full((ti + tj, s), pad, np.uint64)
    for i in range(ti + tj):
        n = rng.integers(1, s + 1)
        tab[i, :n] = np.sort(rng.choice(pool, size=n, replace=False))
    hi = jnp.asarray((tab >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((tab & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    rows, cols = (hi[:ti], lo[:ti]), (hi[ti:], lo[ti:])
    got = PI.tile_counts_pallas(
        I._pad_pow2(rows), I._pad_pow2(cols), s, interpret=INTERPRET
    )
    want = I.tile_counts(rows, cols, s)
    for key in ("shared_in_x", "union_size", "inter_full"):
        assert np.array_equal(np.asarray(got[key]), np.asarray(want[key])), key


@pytest.mark.parametrize("k", [15, 33, 63])
def test_hash_kernel_k_sweep(k):
    rng = np.random.default_rng(k)
    codes = jnp.asarray(
        rng.integers(0, 5, size=(8, 256 + k - 1), dtype=np.int64), jnp.int32
    )
    (h0, l0), _ = H.hash_windows(codes, k)
    (h1, l1), _ = PH.hash_windows_pallas(codes, k, interpret=INTERPRET)
    assert np.array_equal(np.asarray(h0), np.asarray(h1))
    assert np.array_equal(np.asarray(l0), np.asarray(l1))
