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


@pytest.mark.parametrize("s", [300, 1000, 10000])
def test_tile_counts_tight_width_matches_merge(s):
    """The tight (non-pow2 lane-aligned) merge path — `_pad_lane` +
    `_merge_any_width` — must be bit-identical to pair_counts_merge.
    This is the production Pallas layout (VERDICT r1 item 2: no pow2
    padding); the virtual zero-head embedding is exercised whenever
    ceil(s/128)·128 is not a power of two."""
    rng = np.random.default_rng(s)
    pad = np.uint64(0xFFFFFFFFFFFFFFFF)
    ti, tj = 9, 3
    pool = np.unique(rng.integers(0, 4 * s, size=6 * s, dtype=np.uint64))
    tab = np.full((ti + tj, s), pad, np.uint64)
    for i in range(ti + tj):
        n = rng.integers(s // 2, s + 1)
        tab[i, :n] = np.sort(rng.choice(pool, size=n, replace=False))
    hi = jnp.asarray((tab >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((tab & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    rows, cols = (hi[:ti], lo[:ti]), (hi[ti:], lo[ti:])
    got = PI.tile_counts_pallas(
        I._pad_lane(rows), I._pad_lane(cols), s, interpret=INTERPRET
    )
    for i in range(ti):
        for j in range(tj):
            a = (rows[0][i], rows[1][i])
            b = (cols[0][j], cols[1][j])
            want = I.pair_counts_merge(a, b, s)
            for key in ("shared_in_x", "union_size", "inter_full"):
                assert int(got[key][i, j]) == int(want[key]), (s, i, j, key)


def test_merge_any_width_zero_head_ties():
    """Adversarial: real hash value 0 present in both sketches — the
    virtual zero head must not corrupt counts (value-exchangeable ties)."""
    s = 160  # sp_l = 256, p2 = 512: W = 512 = p2?  no: W = 2*256 = 512 pow2.
    s = 300  # sp_l = 384, W = 768, p2 = 1024 → genuine zero-head case
    pad = np.uint64(0xFFFFFFFFFFFFFFFF)
    rng = np.random.default_rng(5)
    a = np.unique(np.concatenate([[0], rng.integers(0, 1000, 280, dtype=np.uint64)]))[:s]
    b = np.unique(np.concatenate([[0, 1], rng.integers(0, 1000, 280, dtype=np.uint64)]))[:s]
    ta = np.full(s, pad, np.uint64); ta[:len(a)] = a
    tb = np.full(s, pad, np.uint64); tb[:len(b)] = b
    ap = tuple(jnp.asarray(x) for x in u64.split(ta[None]))
    bp = tuple(jnp.asarray(x) for x in u64.split(tb[None]))
    got = PI.tile_counts_pallas(I._pad_lane(ap), I._pad_lane(bp), s,
                                interpret=INTERPRET)
    want = I.pair_counts_merge((ap[0][0], ap[1][0]), (bp[0][0], bp[1][0]), s)
    for key in ("shared_in_x", "union_size", "inter_full"):
        assert int(got[key][0, 0]) == int(want[key]), key


@pytest.mark.parametrize("tj", [6, 7])  # even + odd (odd exercises padding)
def test_compact_kernel_unroll2_matches_unroll1(tj):
    """The x2 column-unrolled single-plane kernel (VMEM-feasible at s=10k
    thanks to the halved compact footprint) must be bitwise-identical to
    the unroll=1 kernel, including when tj is odd (caller pads)."""
    rng = np.random.default_rng(tj)
    ti, sp = 9, 256
    s = sp - 16
    tab = np.full((ti + tj, sp), np.uint32(0xFFFFFFFF), np.uint32)
    pool = np.unique(rng.choice(1 << 31, size=4 * sp, replace=False)).astype(np.uint32)
    for i in range(ti + tj):
        n = rng.integers(sp // 2, sp + 1)
        tab[i, :n] = np.sort(rng.choice(pool, size=n, replace=False))
    rows, cols = jnp.asarray(tab[:ti]), jnp.asarray(tab[ti:])
    got1 = PI.tile_counts_pallas32(rows, cols, s, interpret=INTERPRET, unroll=1)
    got2 = PI.tile_counts_pallas32(rows, cols, s, interpret=INTERPRET, unroll=2)
    for key in ("shared_in_x", "union_size", "inter_full", "n_a", "n_b"):
        assert np.array_equal(np.asarray(got1[key]), np.asarray(got2[key])), key
