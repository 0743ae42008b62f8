"""Vectorized canonical k-mer hashing on device (components C2-C4, SURVEY.md §2).

Implements the closed form of the ntHash recurrence (spec frozen in
miekki_tpu.oracle.nthash; SURVEY.md §7 design item 1): with
  u[j] = ror^{j mod 64}(SEEDS[s_j]),  v[j] = rol^{j mod 64}(SEEDS[comp(s_j)]),
  F(p) = rol^{(k-1+p) mod 64}( XOR_{j=p}^{p+k-1} u[j] )
  R(p) = ror^{p mod 64}      ( XOR_{j=p}^{p+k-1} v[j] )
  H(p) = min(F, R), masked to the UINT64_MAX sentinel when any base in the
  window is invalid (or in the 2^-64 case H == UINT64_MAX itself).

TPU mapping (all VPU-friendly, no gathers, no global scans):
  * per-base seeds via a 4-way `where` select chain (codes ∈ {0..3});
  * the position rotation ror^{j mod 64} as a single variable-amount rotate
    (TPU vector shifts take per-lane shift amounts);
  * the k-window XOR by log2(k) shift-XOR doubling levels — O(log k) passes
    instead of the O(log L) associative-scan prefix form;
  * window validity by the same doubling on an OR monoid.

Everything is branch-free and static-shape; XLA fuses the whole pipeline
into a few elementwise loops over the chunk.  A fused Pallas version lives
in miekki_tpu.ops.pallas_hash.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import nthash as _oracle
from . import u64

INVALID_CODE = 4

# (hi, lo) uint32 planes of the 4 per-base seeds, forward and complement.
_SEED_F_HI, _SEED_F_LO = u64.split(_oracle.SEEDS)
_SEED_R_HI, _SEED_R_LO = u64.split(_oracle.SEEDS[::-1])  # SEEDS[3 - b]


def _select_seed(codes: jax.Array, consts: np.ndarray) -> jax.Array:
    """Per-position seed plane via a 3-deep select chain (codes in 0..3)."""
    c0, c1, c2, c3 = (jnp.uint32(int(x)) for x in consts)
    return jnp.where(
        codes < 2,
        jnp.where(codes == 0, c0, c1),
        jnp.where(codes == 2, c2, c3),
    )


def _window_xor(hi: jax.Array, lo: jax.Array, k: int, n: int):
    """XOR over each k-window: out[p] = XOR_{t<k} in[p+t], for p in [0, n).

    Shift-XOR doubling: A_{2m}[p] = A_m[p] ^ A_m[p+m]; combine the binary
    decomposition of k.  All slices are static; tail garbage never reaches
    the combined [0, n) range (index bound p + offset <= L - m).
    """

    def shift(x, m):
        pad = jnp.zeros(x.shape[:-1] + (m,), x.dtype)
        return jnp.concatenate([x[..., m:], pad], axis=-1)

    res_hi = jnp.zeros(hi.shape[:-1] + (n,), hi.dtype)
    res_lo = jnp.zeros(lo.shape[:-1] + (n,), lo.dtype)
    offset, m = 0, 1
    while m <= k:
        if k & m:
            res_hi = res_hi ^ jax.lax.slice_in_dim(hi, offset, offset + n, axis=-1)
            res_lo = res_lo ^ jax.lax.slice_in_dim(lo, offset, offset + n, axis=-1)
            offset += m
        if (m << 1) <= k:
            hi = hi ^ shift(hi, m)
            lo = lo ^ shift(lo, m)
        m <<= 1
    return res_hi, res_lo


def _window_any(flags: jax.Array, k: int, n: int) -> jax.Array:
    """OR over each k-window of a 0/1 int32 array (same doubling scheme).

    Works in int32 rather than bool: Mosaic cannot concatenate/bitcast i1
    vector registers, and this helper is traced inside the Pallas kernel.
    Returns bool[..., n].
    """

    def shift(x, m):
        pad = jnp.zeros(x.shape[:-1] + (m,), x.dtype)
        return jnp.concatenate([x[..., m:], pad], axis=-1)

    res = jnp.zeros(flags.shape[:-1] + (n,), jnp.int32)
    offset, m = 0, 1
    while m <= k:
        if k & m:
            res = res | jax.lax.slice_in_dim(flags, offset, offset + n, axis=-1)
            offset += m
        if (m << 1) <= k:
            flags = flags | shift(flags, m)
        m <<= 1
    return res > 0


def hash_block_math(codes: jax.Array, k: int):
    """Core hash pipeline on an int32 code block [..., L] → INF-masked
    (hi, lo) uint32 [..., n].  Pure jnp — shared verbatim between the XLA
    path (hash_windows) and the Pallas kernel (ops.pallas_hash), so bitwise
    parity between the two is by construction."""
    L = codes.shape[-1]
    n = L - k + 1
    invalid = (codes < 0) | (codes >= 4)
    invalid_i = jnp.where(invalid, 1, 0)
    safe = jnp.where(invalid, 0, codes)

    j = jax.lax.broadcasted_iota(jnp.int32, codes.shape, codes.ndim - 1)
    jr = (j % 64).astype(jnp.uint32)
    u = u64.ror((_select_seed(safe, _SEED_F_HI), _select_seed(safe, _SEED_F_LO)), jr)
    v = u64.rol((_select_seed(safe, _SEED_R_HI), _select_seed(safe, _SEED_R_LO)), jr)

    wu = _window_xor(u[0], u[1], k, n)
    wv = _window_xor(v[0], v[1], k, n)

    p = jax.lax.broadcasted_iota(jnp.int32, codes.shape[:-1] + (n,), codes.ndim - 1)
    fh = u64.rol(wu, (k - 1 + p) % 64)
    rh = u64.ror(wv, p % 64)
    h = u64.minimum(fh, rh)

    bad = _window_any(invalid_i, k, n) | u64.is_inf(h)
    return u64.where(bad, u64.inf_like(h[0].shape), h)


@partial(jax.jit, static_argnames=("k",))
def hash_windows(codes: jax.Array, k: int):
    """Canonical hashes of every k-window of `codes` (int array, 0..4; any
    leading batch dims; uint8 input is fine and minimizes HBM traffic).

    Returns ((hi, lo) uint32[..., n], valid bool[..., n]) with
    n = codes.shape[-1] - k + 1; invalid windows carry the UINT64_MAX
    sentinel (so valid ≡ ~is_inf(h)).  Bitwise equal to
    oracle.nthash.hash_kmers.
    """
    L = codes.shape[-1]
    if L - k + 1 <= 0:
        raise ValueError(f"sequence shorter than k: {L} < {k}")
    h = hash_block_math(codes.astype(jnp.int32), k)
    return h, ~u64.is_inf(h)
