"""Vectorized canonical k-mer hashing on device (components C2-C4, SURVEY.md §2).

Implements the closed form of the ntHash recurrence (spec frozen in
miekki_tpu.oracle.nthash; SURVEY.md §7 design item 1): with
  u[j] = ror^{j mod 64}(SEEDS[s_j]),  v[j] = rol^{j mod 64}(SEEDS[comp(s_j)]),
and P, Q their exclusive prefix-XORs,
  F(p) = rol^{(k-1+p) mod 64}(P[p+k] ^ P[p])
  R(p) = ror^{p mod 64}      (Q[p+k] ^ Q[p])
  H(p) = min(F, R), masked to the UINT64_MAX sentinel when any base in the
  window is invalid (or in the 2^-64 case H == UINT64_MAX itself).

The per-position rotated seeds are pure gathers from two (64, 4) tables
precomputed on the host; the prefix-XOR is a `lax.associative_scan`, so the
whole pass is branch-free, static-shape, and XLA-fusible.  A fused Pallas
version lives in miekki_tpu.ops.pallas_hash.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import nthash as _oracle
from . import u64

INVALID_CODE = 4


def _build_tables():
    """(64, 4) uint32 hi/lo tables for u and v, flattened to [256] for gather.

    Kept as numpy constants (module-level) so they are safely closed over by
    any jit trace; XLA constant-folds the transfer.
    """
    j = np.arange(64, dtype=np.int64)[:, None]
    bases = np.arange(4, dtype=np.int64)[None, :]
    u_tab = _oracle.ror64(_oracle.SEEDS[bases], j)          # [64, 4] uint64
    v_tab = _oracle.rol64(_oracle.SEEDS[3 - bases], j)      # [64, 4] uint64
    u_hi, u_lo = u64.split(u_tab.reshape(-1))
    v_hi, v_lo = u64.split(v_tab.reshape(-1))
    return u_hi, u_lo, v_hi, v_lo


TABLES = _build_tables()


def _exclusive_prefix_xor(pair):
    hi, lo = pair
    inc = jax.lax.associative_scan(
        lambda a, b: (a[0] ^ b[0], a[1] ^ b[1]), (hi, lo), axis=-1
    )
    zero = jnp.zeros(hi.shape[:-1] + (1,), hi.dtype)
    return (
        jnp.concatenate([zero, inc[0]], axis=-1),
        jnp.concatenate([zero, inc[1]], axis=-1),
    )


@partial(jax.jit, static_argnames=("k",))
def hash_windows(codes: jax.Array, k: int):
    """Canonical hashes of every k-window of `codes` (1-D int array, 0..4).

    Returns ((hi, lo) uint32[n], valid bool[n]) with n = len(codes) - k + 1;
    invalid windows carry the UINT64_MAX sentinel.  Bitwise equal to
    oracle.nthash.hash_kmers.
    """
    L = codes.shape[-1]
    n = L - k + 1
    if n <= 0:
        raise ValueError(f"sequence shorter than k: {L} < {k}")
    codes = codes.astype(jnp.int32)
    valid_base = (codes >= 0) & (codes < 4)
    safe = jnp.where(valid_base, codes, 0)

    u_hi, u_lo, v_hi, v_lo = (jnp.asarray(t) for t in TABLES)
    j = jax.lax.broadcasted_iota(jnp.int32, codes.shape, codes.ndim - 1)
    idx = (j % 64) * 4 + safe
    u = (u_hi[idx], u_lo[idx])
    v = (v_hi[idx], v_lo[idx])

    P = _exclusive_prefix_xor(u)  # [..., L+1]
    Q = _exclusive_prefix_xor(v)

    def win(pair):
        return (
            pair[0][..., k:] ^ pair[0][..., :-k][..., :n],
            pair[1][..., k:] ^ pair[1][..., :-k][..., :n],
        )

    p = jax.lax.broadcasted_iota(jnp.int32, codes.shape[:-1] + (n,), codes.ndim - 1)
    fh = u64.rol(win(P), (k - 1 + p) % 64)
    rh = u64.ror(win(Q), p % 64)
    h = u64.minimum(fh, rh)

    bad = (~valid_base).astype(jnp.int32)
    cbad = jnp.cumsum(bad, axis=-1)
    zero = jnp.zeros(bad.shape[:-1] + (1,), jnp.int32)
    cbad = jnp.concatenate([zero, cbad], axis=-1)
    window_ok = (cbad[..., k:] - cbad[..., :-k][..., :n]) == 0
    valid = window_ok & ~u64.is_inf(h)
    h = u64.where(valid, h, u64.inf_like(h[0].shape))
    return h, valid
