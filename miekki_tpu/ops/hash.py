"""Vectorized canonical k-mer hashing on device (components C2-C4, SURVEY.md §2).

Implements the closed form of the ntHash recurrence (spec frozen in
miekki_tpu.oracle.nthash; SURVEY.md §7 design item 1): with
  u[j] = ror^{j mod 64}(SEEDS[s_j]),  v[j] = rol^{j mod 64}(SEEDS[comp(s_j)]),
  F(p) = rol^{(k-1+p) mod 64}( XOR_{j=p}^{p+k-1} u[j] )
  R(p) = ror^{p mod 64}      ( XOR_{j=p}^{p+k-1} v[j] )
  H(p) = min(F, R), masked to the UINT64_MAX sentinel when any base in the
  window is invalid (or in the 2^-64 case H == UINT64_MAX itself).

TPU mapping (all VPU-friendly, no gathers, no global scans):
  * per-position pre-rotated seeds baked into lane-constant [4, L] tables
    (_pos_seed_tables), picked by a 4-way `where` select chain — the input
    rotations cost zero runtime ops;
  * the k-window XOR by log2(k) shift-XOR doubling levels — O(log k) passes
    instead of the O(log L) associative-scan prefix form;
  * the two output rotations (lane-static amounts) as variable-amount
    vector rotates (per-lane shift amounts are a TPU VPU feature);
  * window validity by the same doubling on an OR monoid.

Everything is branch-free and static-shape; XLA fuses the whole pipeline
into a few elementwise loops over the chunk.  A fused Pallas version lives
in miekki_tpu.ops.pallas_hash.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import nthash as _oracle
from . import u64

INVALID_CODE = 4

@lru_cache(maxsize=64)
def _pos_seed_tables(length: int):
    """Lane-constant pre-rotated seed tables for a row of `length` positions.

    u[j] = ror^{j mod 64}(SEEDS[b]) and v[j] = rol^{j mod 64}(SEEDS[3-b])
    depend on the base letter AND the (static) position, so the rotation can
    be baked into eight [4, length] uint32 constant planes — replacing two
    variable-amount 64-bit rotates per base (~24 VPU ops) with pure selects.
    Returns numpy arrays (u_hi, u_lo, v_hi, v_lo), each [4, length]."""
    j = np.arange(length, dtype=np.int64)[None, :]
    bases = np.arange(4, dtype=np.int64)[:, None]
    u = _oracle.ror64(_oracle.SEEDS[bases], j)        # [4, L] uint64
    v = _oracle.rol64(_oracle.SEEDS[3 - bases], j)
    u_hi, u_lo = u64.split(u)
    v_hi, v_lo = u64.split(v)
    return u_hi, u_lo, v_hi, v_lo


def _select_table(codes: jax.Array, tab: np.ndarray) -> jax.Array:
    """Per-position value from a [4, L] lane-constant table by base code."""
    t = jnp.asarray(tab)
    return jnp.where(
        codes < 2,
        jnp.where(codes == 0, t[0], t[1]),
        jnp.where(codes == 2, t[2], t[3]),
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


def hash_block_math(codes: jax.Array, k: int, tables=None):
    """Core hash pipeline on an int32 code block [..., L] → INF-masked
    (hi, lo) uint32 [..., n].  Pure jnp — shared verbatim between the XLA
    path (hash_windows) and the Pallas kernel (ops.pallas_hash), so bitwise
    parity between the two is by construction.

    `tables` are the four [4, L] lane-constant seed planes from
    _pos_seed_tables; XLA callers may omit them (embedded as constants),
    Pallas kernels must pass them as inputs (kernels can't capture
    large constants)."""
    L = codes.shape[-1]
    n = L - k + 1
    invalid = (codes < 0) | (codes >= 4)
    invalid_i = jnp.where(invalid, 1, 0)
    safe = jnp.where(invalid, 0, codes)

    u_hi_t, u_lo_t, v_hi_t, v_lo_t = (
        tables if tables is not None else _pos_seed_tables(L)
    )
    u = (_select_table(safe, u_hi_t), _select_table(safe, u_lo_t))
    v = (_select_table(safe, v_hi_t), _select_table(safe, v_lo_t))

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
