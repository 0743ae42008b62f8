"""Byte-granular reformulation of the ntHash closed form (round-2 design
validation — NOT yet used on device).

The device hash (ops/hash.py) pays ~100+ VPU ops per BASE.  This prototype
proves the algebra for paying per BYTE (4 bases) instead: the XOR window

    W(p) = XOR_{j=p}^{p+k-1} ror^{j mod 64}(SEED[s_j])

decomposes into fully-covered byte terms plus one partial-prefix and one
partial-suffix byte term.  Because ror^{j mod 64} has period 64 positions =
16 bytes, every term is a pure table lookup:

    FULL[t mod 16][B_t]    = XOR of all 4 rotated seeds of byte value B_t
    PRE[a][t mod 16][B_t]  = XOR of positions a..3 of the byte (window head)
    SUF[r][t mod 16][B_t]  = XOR of positions 0..r-1 of the byte (tail)

and W(p) = PRE[p%4][...] ^ XOR(full bytes) ^ SUF[(p+k)%4][...].

On device the FULL-term window XOR would run over L/4 byte positions
(log(k/4) doubling levels), a ~4x op reduction for the window stage; the
open problem is the lookup itself (gathers are scalarized on TPU — viable
routes are a GF(2) one-hot int8 matmul per bit-plane or 255-way selects,
both costed in docs/DESIGN.md).  This module exists so the algebra is
already bit-proven when that lands.

Validated bit-for-bit against hash_kmers in tests/test_oracle_bytes.py.
"""

from __future__ import annotations

import numpy as np

from . import nthash as _n

U64 = np.uint64


def _build_tables(k_unused: int = 0):
    """FULL[16, 256], PRE[4][16, 256], SUF[4][16, 256] uint64 tables.

    PRE[a] covers byte positions a..3 (empty when a == 0 would mean the
    whole byte — by convention PRE[0] is the zero table and the byte is
    counted as FULL instead).  SUF[r] covers positions 0..r-1 (SUF[0] = 0).
    """
    full = np.zeros((16, 256), dtype=U64)
    pre = np.zeros((4, 16, 256), dtype=U64)
    suf = np.zeros((4, 16, 256), dtype=U64)
    for tmod in range(16):
        base_pos = 4 * tmod  # position offset within the 64-period
        for byte in range(256):
            codes = [(byte >> (2 * i)) & 3 for i in range(4)]
            rots = [
                _n.ror64(_n.SEEDS[codes[i]], (base_pos + i) % 64)
                for i in range(4)
            ]
            full[tmod, byte] = np.bitwise_xor.reduce(np.array(rots, dtype=U64))
            for a in range(1, 4):
                pre[a, tmod, byte] = np.bitwise_xor.reduce(
                    np.array(rots[a:], dtype=U64)
                )
            for r in range(1, 4):
                suf[r, tmod, byte] = np.bitwise_xor.reduce(
                    np.array(rots[:r], dtype=U64)
                )
    return full, pre, suf


_FULL, _PRE, _SUF = _build_tables()


def pack_bytes(codes: np.ndarray) -> np.ndarray:
    """2-bit codes (must be valid, length multiple of 4) → byte values."""
    c = np.asarray(codes, dtype=np.int64).reshape(-1, 4)
    return (c[:, 0] | (c[:, 1] << 2) | (c[:, 2] << 4) | (c[:, 3] << 6)).astype(
        np.int64
    )


def forward_window_bytes(codes: np.ndarray, k: int, p: int) -> np.uint64:
    """W(p) for one window via byte tables (codes all-valid), then the
    forward hash F(p) = rol^{(k-1+p) mod 64}(W(p))."""
    bytes_vals = pack_bytes(
        np.pad(codes, (0, (-len(codes)) % 4), constant_values=0)
    )
    a = p % 4
    end = p + k
    r = end % 4
    t_first = (p + 3) // 4          # first fully-covered byte
    t_last = end // 4 - 1           # last fully-covered byte
    acc = U64(0)
    if a:
        tb = p // 4
        acc ^= _PRE[a, tb % 16, bytes_vals[tb]]
    for t in range(t_first, t_last + 1):
        acc ^= _FULL[t % 16, bytes_vals[t]]
    if r:
        tb = end // 4
        acc ^= _SUF[r, tb % 16, bytes_vals[tb]]
    return _n.rol64(acc, (k - 1 + p) % 64)
