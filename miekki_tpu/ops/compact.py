"""Compact (32-bit) sketch fingerprints — lossy 2x index compression.

SURVEY.md §7 "Open items" flags that the reference may store compressed
fingerprints (the retrieval engine associated HyperMinHash — PAPERS.md,
"HyperMinHash: MinHash in LogLog space", arXiv:1710.08436 — with it).
This module is the bottom-s-compatible analog: each 64-bit hash value is
encoded as a 32-bit *monotone floating-point-like* code,

    code = (msb_index << MANTISSA) | (top MANTISSA bits after the leading 1)

i.e. a 6-bit exponent + 26-bit mantissa.  Monotone (a <= b implies
code(a) <= code(b)), so sorted order, merge intersection, union-bottom-s
rank logic, threshold prefilters, and the ring all work on codes
unchanged — only *equality* becomes approximate (two distinct values can
share a code).

Why this beats HyperMinHash's q+r-bit buckets here: HyperMinHash
compresses k-PARTITION sketches (one min per bucket — collisions governed
by r alone).  A bottom-s sketch must resolve ~2s near-adjacent values
inside the union's bottom range, so the fingerprint needs ~log2(s) bits
of headroom above the per-cell precision; the float-like code gives
*relative* precision 2^-26 at every scale, adapting to any genome size
with no parameter.

Collision math (tested empirically in tests/test_compact.py): in a merged
union bottom-2s list, the value at rank i has relative gap ~1/i to its
neighbor, so P(false equality at rank i) ~ i/2^26; summed over i <= 2s at
s = 10_000 the expected spurious shared count is ~3, a jaccard bias of
~3e-4·(1-j) — 15x below the bottom-s estimator's own sampling noise
sqrt(j(1-j)/s) ~ 5e-3.  We therefore ship the estimator UNCORRECTED and
enforce the bias bound by test; params.compact keys the index header so
compact and raw sketches can never be compared to each other.

The on-disk lo plane is omitted for compact indexes (index/store.py), so
a 10k-genome s=10k DB drops from ~800 MB of planes to ~400 MB; device
kernels currently still run on (code, 0) u64 pairs — a single-plane
intersection kernel is the follow-on perf lever.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MANTISSA = 26  # mantissa bits; exponent (msb index 0..63) uses the top 6

#: Codes equal to UINT32_MAX are reserved as the INF/padding sentinel.
#: Only v >= 2^64·(1 - 2^-27) could produce it (bottom-s sketch values
#: are ~2^64·s/n, nowhere near); encode clamps such values one code down.
_SENTINEL = np.uint32(0xFFFFFFFF)


def encode_u64(vals: np.ndarray) -> np.ndarray:
    """numpy uint64 values → uint32 monotone codes (host side).

    UINT64_MAX maps to the sentinel (it IS the padding value); any other
    value that would hit the sentinel code is clamped one below.
    """
    v = np.asarray(vals, dtype=np.uint64)
    out = np.empty(v.shape, dtype=np.uint32)
    zero = v == 0
    nz = ~zero
    vi = v[nz]
    # msb index via bit_length: uint64 -> object-free float trick is lossy,
    # use np.frexp on float128? No: derive from the hi/lo split exactly.
    e = np.zeros(vi.shape, dtype=np.uint32)
    x = vi.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(shift))
        e[big] += np.uint32(shift)
        x[big] >>= np.uint64(shift)
    # mantissa: bits below the leading 1, left-aligned to MANTISSA bits
    m64 = vi ^ (np.uint64(1) << e.astype(np.uint64))          # strip leading 1
    down = e.astype(np.int64) - MANTISSA
    m = np.where(
        down >= 0,
        (m64 >> np.maximum(down, 0).astype(np.uint64)),
        (m64 << np.maximum(-down, 0).astype(np.uint64)),
    ).astype(np.uint32) & np.uint32((1 << MANTISSA) - 1)
    code = (e << np.uint32(MANTISSA)) | m
    out[nz] = code
    out[zero] = 0
    inf = v == np.uint64(0xFFFFFFFFFFFFFFFF)
    out[(out == _SENTINEL) & ~inf] = _SENTINEL - np.uint32(1)
    out[inf] = _SENTINEL
    return out


def decode_approx(codes: np.ndarray) -> np.ndarray:
    """uint32 codes → approximate uint64 values (cell lower bound).

    Exact enough for scale-dependent estimators (KMV cardinality, p-value
    null models): relative error <= 2^-26.  Sentinel → UINT64_MAX.
    """
    c = np.asarray(codes, dtype=np.uint32)
    e = (c >> np.uint32(MANTISSA)).astype(np.uint64)
    m = (c & np.uint32((1 << MANTISSA) - 1)).astype(np.uint64)
    down = e.astype(np.int64) - MANTISSA
    frac = np.where(
        down >= 0,
        m << np.maximum(down, 0).astype(np.uint64),
        m >> np.maximum(-down, 0).astype(np.uint64),
    )
    v = (np.uint64(1) << e) | frac
    v[c == 0] = np.uint64(0)
    v[c == _SENTINEL] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return v


def _clz32(x: jax.Array) -> jax.Array:
    """Branchless count-leading-zeros on uint32 lanes (clz(0) == 32)."""
    n = jnp.full(x.shape, 32, jnp.uint32)
    for shift in (16, 8, 4, 2, 1):
        big = x >= (jnp.uint32(1) << shift)
        n = jnp.where(big, n - shift, n)
        x = jnp.where(big, x >> shift, x)
    return n - x  # x is 1 where any bit was set, 0 otherwise


def encode_pair(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """(hi, lo) uint32 planes → uint32 monotone codes (device side).

    Bit-identical to encode_u64 on join(hi, lo) — property-tested.
    """
    hi = hi.astype(jnp.uint32)
    lo = lo.astype(jnp.uint32)
    hi_zero = hi == 0
    clz = jnp.where(hi_zero, 32 + _clz32(lo), _clz32(hi))
    e = jnp.uint32(63) - clz  # msb index; garbage for v == 0, masked below
    # 64-bit left shift by (clz + 1) to drop the leading 1 and left-align:
    # sh in [1, 64]; take the top MANTISSA bits of the result's hi word.
    sh = clz + 1
    big = sh >= 32  # value fits entirely in lo after the shift crosses words
    sh32 = jnp.where(big, sh - 32, sh) & jnp.uint32(31)
    back = (jnp.uint32(32) - sh32) & jnp.uint32(31)
    lo_part = jnp.where(sh32 == 0, jnp.uint32(0), lo >> back)
    top = jnp.where(big, lo << sh32, (hi << sh32) | lo_part)
    # sh == 64 (v == 1): lo << 32 is UB-ish; force 0 mantissa
    top = jnp.where(sh == 64, jnp.uint32(0), top)
    m = top >> jnp.uint32(32 - MANTISSA)
    code = (e << jnp.uint32(MANTISSA)) | m
    code = jnp.where(hi_zero & (lo == 0), jnp.uint32(0), code)
    inf = (hi == jnp.uint32(0xFFFFFFFF)) & (lo == jnp.uint32(0xFFFFFFFF))
    code = jnp.where((code == jnp.uint32(0xFFFFFFFF)) & ~inf,
                     jnp.uint32(0xFFFFFFFE), code)
    return jnp.where(inf, jnp.uint32(0xFFFFFFFF), code)


@jax.jit
def compact_rows(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Device-side row compaction: sorted (hi, lo) sketch rows → sorted
    deduplicated uint32 code rows, bit-identical to
    SketchIndex.to_compact's host pipeline (encode → within-row dup →
    sentinel → re-sort; parity-tested).  Lets a DB that was GENERATED on
    device become a compact device-resident table without ever crossing
    the host link (tools/scale100k_tpu.py r5)."""
    codes = encode_pair(hi, lo)
    dup = jnp.concatenate(
        [jnp.zeros_like(codes[..., :1], jnp.bool_),
         codes[..., 1:] == codes[..., :-1]], axis=-1)
    codes = jnp.where(dup, jnp.uint32(0xFFFFFFFF), codes)
    return jax.lax.sort(codes, dimension=-1)


def lo_plane_np(codes: np.ndarray) -> np.ndarray:
    """Host: the derived lo plane for compact codes — 0 for values, INF for
    the sentinel (one definition; used by store save/load and the engine)."""
    return np.where(codes == _SENTINEL, np.uint32(0xFFFFFFFF),
                    np.uint32(0)).astype(np.uint32)


def lo_plane(codes: jax.Array) -> jax.Array:
    """Device version of lo_plane_np."""
    return jnp.where(codes == jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
