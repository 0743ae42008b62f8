"""MXU-based tile intersection counting (round-2/3 perf lever; NEXT_ROUND.md
item 2, SURVEY.md §7 item 4).

The bitonic/Pallas pair kernels pay O(sp·log sp) VPU compare-exchanges per
pair (~1.9 µs/pair floor at s=10k).  This module counts ALL pairs of a tile
in one pass over the tile's *globally sorted value stream*, turning the
per-pair work into one-hot matmuls that run on the MXU:

  stream   = sort(concat(all row-sketch values, all col-sketch values))
             with a (side, sketch_id) payload riding along.
  matches  = equal values at stream distance w ∈ [1, band]  (equal values
             are adjacent after the sort; a run of m duplicates spans m
             consecutive slots, so band ≥ m−1 sees every cross-side pair;
             longer runs are DETECTED and the tile falls back).
  inter    = Σ_w  (onehot_row ⊙ eq_w)ᵀ · shift_w(onehot_col)  — accumulated
             as two [Ti,c]×[c,Tj] bf16→f32 matmuls per stream chunk.

Exact Mash `shared_in_x` (matches with union-rank < s) without per-element
rank bookkeeping: the union-rank of a match in chunk t is bounded by the
pair's cumulative distinct-union count at the chunk's edges
(distinct = cumA[a] + cumB[b] − cumMatches[a,b], all per-chunk matmul
byproducts).  Chunks whose END count ≤ s contribute all their matches
(lower bound); chunks whose START count ≥ s contribute none (upper bound).
Since a pair's distinct count crosses s in exactly one chunk, lb == ub for
every pair with no match inside its crossing chunk — the common case — and
the few ambiguous pairs are resolved exactly by the existing bitwise-proven
bitonic kernel (`tile_counts_mxu_exact`).

All counts accumulate in f32 (exact integers < 2^24 ≫ any tile count).
Bit-exactness vs pair_counts_merge: tests/test_mxu_intersect.py.

Long-run (band-overflow) analysis — why band is the knob, not a quadratic
correction: sketches are distinct, so each sketch contributes at most ONE
slot to any value-run, and the exact per-run contribution to inter is the
rank-1 outer product a_R ⊗ b_R (a_R ∈ {0,1}^Ti = rows present in run R).
The banded counter is exactly the W-truncation of that segmented rank-1
accumulation: runs of length ≤ band+1 are counted fully.  The exact
untruncated form needs per-RUN (not per-offset) one-hot aggregation — a
[c, c] segment matmul per chunk, ~256x the VPU work of band=8 and only
needed on the rare chunks containing a long run, whose data-dependent
selection would force host sync inside the pass.  Raising `band` (cost
linear in W) covers panels where a core k-mer is shared by up to band+1
tile members; beyond that the overflow flag triggers the exact
bitwise-proven fallback.  Measured on 8-member mutated families: band=8
never overflows (DESIGN.md r2 row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import u64
from .intersect import pair_counts_bitonic, _pad_pow2

DEFAULT_CHUNK = 2048
DEFAULT_BAND = 8
_COL_TAG = np.uint32(1 << 16)  # payload bit marking column-side elements


@partial(jax.jit, static_argnames=("is_col",))
def sketch_stream(p: u64.Pair, is_col: bool):
    """Flatten a [(N, sp)] sketch block into one sorted value stream
    [(N*sp,)] (hi, lo, payload) with payload = sketch_id | COL_TAG.

    Sorted once per row/column BLOCK and reused across every tile that
    block participates in (the per-tile cost is then only the cheap
    merge-by-sort of two presorted streams in _tile_counts_mxu).
    """
    n, sp = p[0].shape
    pay = jax.lax.broadcasted_iota(jnp.uint32, (n, sp), 0)
    if is_col:
        pay = pay | _COL_TAG
    hi, lo, pay = u64.sort((p[0].reshape(-1), p[1].reshape(-1)), pay.reshape(-1))
    return hi, lo, pay


def tile_counts_mxu(rows: u64.Pair, cols: u64.Pair, s: int, *,
                    chunk: int = DEFAULT_CHUNK, band: int = DEFAULT_BAND,
                    row_stream=None, col_stream=None):
    """All-pairs counts for a tile via the MXU stream pass.

    Returns dict of device arrays: inter_full / n_a / n_b / union_size
    (exact int32), shared_lb / shared_ub (int32 bounds on shared_in_x,
    equal for every pair without a match in its s-crossing chunk), and
    overflow (bool scalar: some value-run exceeded band+1 — counts for
    runs longer than the band are NOT complete and the tile must fall
    back).  Pass precomputed sketch_stream results to amortize the sort.
    """
    if row_stream is None:
        row_stream = sketch_stream(rows, False)
    if col_stream is None:
        col_stream = sketch_stream(cols, True)
    ti = rows[0].shape[0]
    tj = cols[0].shape[0]
    out = _tile_counts_mxu(row_stream, col_stream, ti, tj, s, chunk, band)
    n_a = jnp.sum((~u64.is_inf(rows)).astype(jnp.int32), axis=-1)
    n_b = jnp.sum((~u64.is_inf(cols)).astype(jnp.int32), axis=-1)
    out["union_size"] = jnp.minimum(
        n_a[:, None] + n_b[None, :] - out["inter_full"], s
    )
    # [Ti, Tj] broadcast to match the tile_counts contract
    out["n_a"] = jnp.broadcast_to(n_a[:, None], (ti, tj))
    out["n_b"] = jnp.broadcast_to(n_b[None, :], (ti, tj))
    return out


@partial(jax.jit, static_argnames=("ti", "tj", "s", "chunk", "band"))
def _tile_counts_mxu(row_stream, col_stream, ti: int, tj: int, s: int,
                     chunk: int, band: int):
    rh, rl, rp = row_stream
    ch, cl, cp = col_stream
    hi, lo, pay = u64.sort(  # merge of two presorted streams
        (jnp.concatenate([rh, ch]), jnp.concatenate([rl, cl])),
        jnp.concatenate([rp, cp]),
    )
    n = hi.shape[0]
    n_chunks = -(-n // chunk)
    # Pad so every dynamic window [c + band + 1] is in-bounds; INF tail
    # never matches (validity is checked on both slots of a candidate).
    pad = n_chunks * chunk + band + 1 - n
    hi = jnp.pad(hi, (0, pad), constant_values=u64.INF_HI)
    lo = jnp.pad(lo, (0, pad), constant_values=u64.INF_LO)
    pay = jnp.pad(pay, (0, pad))

    iota_i = jnp.arange(ti, dtype=jnp.uint32)
    iota_j = jnp.arange(tj, dtype=jnp.uint32) | _COL_TAG
    zero_mat = jnp.zeros((ti, tj), jnp.float32)
    zeros_a = jnp.zeros((ti,), jnp.float32)
    zeros_b = jnp.zeros((tj,), jnp.float32)

    def body(carry, start):
        c_mat, cum_a, cum_b, lb, ub, ov = carry
        cw = chunk + band + 1
        whi = jax.lax.dynamic_slice(hi, (start,), (cw,))
        wlo = jax.lax.dynamic_slice(lo, (start,), (cw,))
        wpay = jax.lax.dynamic_slice(pay, (start,), (cw,))
        valid = ~((whi == u64.INF_HI) & (wlo == u64.INF_LO))
        # valid-masked: INF sketch padding (and the stream tail pad, whose
        # payload 0 would alias row id 0) must not enter one-hots/counts.
        oh_row = ((wpay[:, None] == iota_i[None, :])
                  & valid[:, None]).astype(jnp.bfloat16)
        oh_col = ((wpay[:, None] == iota_j[None, :])
                  & valid[:, None]).astype(jnp.bfloat16)
        t_b = jnp.zeros((chunk, tj), jnp.bfloat16)
        t_a = jnp.zeros((chunk, ti), jnp.bfloat16)
        for w in range(1, band + 1):
            eq = ((whi[:chunk] == whi[w:w + chunk])
                  & (wlo[:chunk] == wlo[w:w + chunk])
                  & valid[:chunk] & valid[w:w + chunk])
            e = eq.astype(jnp.bfloat16)[:, None]
            t_b = t_b + e * oh_col[w:w + chunk]
            t_a = t_a + e * oh_row[w:w + chunk]
        m_c = (
            jnp.dot(oh_row[:chunk].T, t_b,
                    preferred_element_type=jnp.float32)
            + jnp.dot(t_a.T, oh_col[:chunk],
                      preferred_element_type=jnp.float32)
        )
        cnt_a = jnp.sum(oh_row[:chunk].astype(jnp.float32), axis=0)
        cnt_b = jnp.sum(oh_col[:chunk].astype(jnp.float32), axis=0)
        start_distinct = cum_a[:, None] + cum_b[None, :] - c_mat
        c1 = c_mat + m_c
        ca1 = cum_a + cnt_a
        cb1 = cum_b + cnt_b
        end_distinct = ca1[:, None] + cb1[None, :] - c1
        # Strict < s: a matched value straddling the chunk edge makes the
        # attributed-count distinct estimate undercount the true distinct
        # count by exactly one, so end_distinct == s could hide a match
        # whose true union-rank is s (not < s).  end_distinct < s is safe:
        # true rank <= end_distinct <= s-1.  start_distinct >= s remains a
        # safe excluder (true rank >= start_distinct).
        lb = lb + m_c * (end_distinct < s)
        ub = ub + m_c * (start_distinct < s)
        ov = ov | jnp.any(
            (whi[:chunk] == whi[band + 1:band + 1 + chunk])
            & (wlo[:chunk] == wlo[band + 1:band + 1 + chunk])
            & valid[:chunk] & valid[band + 1:band + 1 + chunk]
        )
        return (c1, ca1, cb1, lb, ub, ov), None

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (c_mat, _, _, lb, ub, ov), _ = jax.lax.scan(
        body, (zero_mat, zeros_a, zeros_b, zero_mat, zero_mat,
               jnp.zeros((), jnp.bool_)), starts)
    return {
        "inter_full": c_mat.astype(jnp.int32),
        "shared_lb": lb.astype(jnp.int32),
        "shared_ub": ub.astype(jnp.int32),
        "overflow": ov,
    }


@partial(jax.jit, static_argnames=("ti", "tj", "s", "chunk", "band"))
def _mxu_exact_packed(row_stream, col_stream, rows: u64.Pair,
                      cols: u64.Pair, ti: int, tj: int, s: int,
                      chunk: int, band: int):
    """The full exact-path device computation as ONE dispatch returning ONE
    flat int32 array [4*ti*tj + ti + tj + 1]: (lb | ub | inter | union |
    n_a | n_b | overflow).  The tunneled platform charges a ~40 ms fixed
    cost per device execution AND per host transfer; the previous
    dict-of-arrays epilogue (eager jnp sums/broadcasts + 7 np.asarray
    pulls) measured 494k pairs/s at tile 512 where the raw MXU pass
    benches 818k — the gap was almost entirely those fixed costs."""
    out = _tile_counts_mxu(row_stream, col_stream, ti, tj, s, chunk, band)
    n_a = jnp.sum((~u64.is_inf(rows)).astype(jnp.int32), axis=-1)
    n_b = jnp.sum((~u64.is_inf(cols)).astype(jnp.int32), axis=-1)
    union = jnp.minimum(n_a[:, None] + n_b[None, :] - out["inter_full"], s)
    return jnp.concatenate([
        out["shared_lb"].reshape(-1), out["shared_ub"].reshape(-1),
        out["inter_full"].reshape(-1), union.reshape(-1),
        n_a, n_b, out["overflow"].astype(jnp.int32)[None],
    ])


def tile_counts_mxu_exact(rows: u64.Pair, cols: u64.Pair, s: int, *,
                          chunk: int = DEFAULT_CHUNK, band: int = DEFAULT_BAND,
                          row_stream=None, col_stream=None):
    """tile_counts-compatible exact counts: the MXU pass for the bulk, the
    bitwise-proven bitonic pair kernel for ambiguous pairs (lb != ub) or
    for the whole tile on band overflow.  Returns the same dict of int32
    [Ti, Tj] arrays as intersect.tile_counts (host-synchronized)."""
    if row_stream is None:
        row_stream = sketch_stream(rows, False)
    if col_stream is None:
        col_stream = sketch_stream(cols, True)
    ti = rows[0].shape[0]
    tj = cols[0].shape[0]
    flat = np.asarray(_mxu_exact_packed(row_stream, col_stream, rows, cols,
                                        ti, tj, s, chunk, band))
    if bool(flat[-1]):  # overflow
        # _intersect_impl() would return "mxu" here (that's how we were
        # reached); resolve to the backend's traceable kernel instead —
        # _tile_counts has no mxu branch and its else-branch is the
        # scalarized-gather searchsorted path, pathological on TPU.
        from .intersect import _tile_counts, _intersect_impl_traced
        return jax.tree.map(
            np.asarray, _tile_counts(rows, cols, s, _intersect_impl_traced()))
    m = ti * tj
    lb = flat[:m].reshape(ti, tj)
    ub = flat[m:2 * m].reshape(ti, tj)
    n_a = flat[4 * m:4 * m + ti]
    n_b = flat[4 * m + ti:4 * m + ti + tj]
    res = {
        "inter_full": flat[2 * m:3 * m].reshape(ti, tj),
        "n_a": np.broadcast_to(n_a[:, None], (ti, tj)),
        "n_b": np.broadcast_to(n_b[None, :], (ti, tj)),
        "union_size": flat[3 * m:4 * m].reshape(ti, tj),
        "shared_in_x": lb.copy(),
    }
    amb_i, amb_j = np.nonzero(lb != ub)
    if amb_i.size:
        k = amb_i.size
        kp = max(8, 1 << (k - 1).bit_length())  # pow2 bucket bounds compiles
        pi = np.pad(amb_i, (0, kp - k))
        pj = np.pad(amb_j, (0, kp - k))
        a = (rows[0][pi], rows[1][pi])
        b = (cols[0][pj], cols[1][pj])
        fixed = _resolve_pairs(_pad_pow2(a), _pad_pow2(b), s)
        res["shared_in_x"][amb_i, amb_j] = np.asarray(fixed)[:k]
    return res


@partial(jax.jit, static_argnames=("s",))
def _resolve_pairs(a: u64.Pair, b: u64.Pair, s: int):
    return pair_counts_bitonic(a, b, s)["shared_in_x"]
