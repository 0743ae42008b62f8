"""uint64 emulation on TPU as (hi, lo) uint32 plane pairs.

TPU has no native 64-bit integer lanes (SURVEY.md §7 hard part 1), so every
64-bit hash is carried as two uint32 arrays.  All helpers are shape-polymorphic
and jit-safe; lexicographic (hi, lo) order == unsigned u64 order, so sorting
uses `lax.sort(..., num_keys=2)`.

Bit-exactness against the numpy-uint64 oracle (miekki_tpu.oracle.nthash) is
property-tested in tests/test_ops_u64.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32_MASK = np.uint64(0xFFFFFFFF)
INF_HI = np.uint32(0xFFFFFFFF)  # (INF_HI, INF_LO) == UINT64_MAX sentinel (+inf)
INF_LO = np.uint32(0xFFFFFFFF)

Pair = Tuple[jax.Array, jax.Array]  # (hi, lo), both uint32, same shape


def split(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """numpy uint64 → (hi, lo) numpy uint32."""
    x = np.asarray(x, dtype=np.uint64)
    return (x >> np.uint64(32)).astype(np.uint32), (x & U32_MASK).astype(np.uint32)


def join(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) → numpy uint64 (host-side only)."""
    hi = np.asarray(hi, dtype=np.uint64)
    lo = np.asarray(lo, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def inf_like(shape, dtype=jnp.uint32) -> Pair:
    return (jnp.full(shape, INF_HI, dtype), jnp.full(shape, INF_LO, dtype))


def xor(a: Pair, b: Pair) -> Pair:
    return (a[0] ^ b[0], a[1] ^ b[1])


def _rol32pair(hi, lo, r):
    """Rotate the 64-bit value left by r for r in [0, 32) (traced array r)."""
    r = r.astype(jnp.uint32)
    # shift amounts are kept in [0, 31]; the r == 0 wrap term is masked out.
    back = (jnp.uint32(32) - r) & jnp.uint32(31)
    hi_new = (hi << r) | jnp.where(r == 0, jnp.uint32(0), lo >> back)
    lo_new = (lo << r) | jnp.where(r == 0, jnp.uint32(0), hi >> back)
    return hi_new, lo_new


def rol(a: Pair, r) -> Pair:
    """Rotate left by r (mod 64).  r may be a static int or a traced array."""
    hi, lo = a
    if isinstance(r, int):
        r %= 64
        if r == 0:
            return (hi, lo)
        if r >= 32:
            hi, lo = lo, hi
            r -= 32
        if r == 0:
            return (hi, lo)
        return (
            (hi << np.uint32(r)) | (lo >> np.uint32(32 - r)),
            (lo << np.uint32(r)) | (hi >> np.uint32(32 - r)),
        )
    r = jnp.asarray(r) % 64
    swap = r >= 32
    h = jnp.where(swap, lo, hi)
    l = jnp.where(swap, hi, lo)
    return _rol32pair(h, l, (r & 31).astype(jnp.uint32))


def ror(a: Pair, r) -> Pair:
    if isinstance(r, int):
        return rol(a, (-r) % 64)
    return rol(a, (64 - (jnp.asarray(r) % 64)) % 64)


def less(a: Pair, b: Pair) -> jax.Array:
    """Unsigned u64 a < b."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def equal(a: Pair, b: Pair) -> jax.Array:
    return (a[0] == b[0]) & (a[1] == b[1])


def minimum(a: Pair, b: Pair) -> Pair:
    take_a = less(a, b)
    return (jnp.where(take_a, a[0], b[0]), jnp.where(take_a, a[1], b[1]))


def is_inf(a: Pair) -> jax.Array:
    return (a[0] == INF_HI) & (a[1] == INF_LO)


def sort(a: Pair, *payload, dimension: int = -1):
    """Sort by u64 key ascending; payload arrays are permuted alongside.

    Returns (hi, lo, *payload) sorted.  INF sentinels sort to the end.
    """
    return jax.lax.sort((a[0], a[1], *payload), dimension=dimension, num_keys=2)


def where(mask: jax.Array, a: Pair, b: Pair) -> Pair:
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))
