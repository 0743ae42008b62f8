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

DEFAULT_CHUNK = 2048
DEFAULT_BAND = 8
_COL_TAG = np.uint32(1 << 16)  # payload bit marking column-side elements
_PAY_SENTINEL = np.uint32(0xFFFFFFFF)  # payload for INF/pad elements: no
# sketch iota (ids < 2^16, | COL_TAG < 2^17) ever equals it, so one-hot
# masks drop such elements without explicit validity logic


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


@jax.jit
def stream_with_col_tag(stream):
    """Derive the column-role stream from a row-role `sketch_stream`
    result.  The two roles differ only by the COL_TAG payload bit, and
    the payload is NOT a sort key (u64.sort compares num_keys=2 planes
    only), so the sort permutation is identical for both roles — one
    elementwise OR replaces a second multi-million-element sort per
    block.  Bitwise-equal to sketch_stream(p, True) by construction
    (tested in tests/test_mxu_intersect.py)."""
    hi, lo, pay = stream
    return hi, lo, pay | _COL_TAG


_INF32 = np.uint32(0xFFFFFFFF)


@partial(jax.jit, static_argnames=("is_col",))
def sketch_stream32(codes: jax.Array, is_col: bool):
    """Single-plane analog of sketch_stream for COMPACT code sketches:
    one 1-key sort over (code, payload) — a third less sort traffic than
    the (hi, lo, payload) pair streams the compact path previously paid
    by deriving a fake lo plane (r4)."""
    n, sp = codes.shape
    pay = jax.lax.broadcasted_iota(jnp.uint32, (n, sp), 0)
    if is_col:
        pay = pay | _COL_TAG
    code, pay = jax.lax.sort((codes.reshape(-1), pay.reshape(-1)),
                             num_keys=1)
    return code, pay


@jax.jit
def stream_with_col_tag32(stream):
    """Column-role derivation for sketch_stream32 results (lax.sort is
    stable and the payload is not a key, so the permutation is
    role-independent — same argument as stream_with_col_tag)."""
    code, pay = stream
    return code, pay | _COL_TAG


# (Round-4 prune: the MIEKKI_MXU_MODE env knob was removed — `full` is the
# production mode; the legacy banded pass remains reachable only through
# the explicit `mode="band"` argument for comparison benchmarks/tests.)


def tile_counts_mxu(rows: u64.Pair, cols: u64.Pair, s: int, *,
                    chunk: int = DEFAULT_CHUNK, band: int = DEFAULT_BAND,
                    row_stream=None, col_stream=None, mode: str = None):
    """All-pairs counts for a tile via the MXU stream pass.

    Returns dict of device arrays: inter_full / n_a / n_b / union_size
    (exact int32), shared_lb / shared_ub (int32 bounds on shared_in_x,
    equal for every pair without a match in its s-crossing chunk), and
    overflow (bool scalar; always False in the default `full` mode — in
    the legacy `band` mode it flags a value-run exceeding band+1, whose
    counts are then incomplete and the tile must fall back).  Pass
    precomputed sketch_stream results to amortize the sort.
    """
    if row_stream is None:
        row_stream = sketch_stream(rows, False)
    if col_stream is None:
        col_stream = sketch_stream(cols, True)
    ti = rows[0].shape[0]
    tj = cols[0].shape[0]
    mode = mode or "full"
    if mode == "full":
        # chunk = ti + tj: the minimum satisfying the run-spans-<=2-chunks
        # invariant, and the measured optimum — the E-matmul cost is LINEAR
        # in chunk (L·chunk·ti flops), so the smallest legal chunk wins:
        # 286 vs 380 ms/tile family, 316 vs 369 random (tile 512, s=10k).
        out = _tile_counts_mxu_full(row_stream, col_stream, ti, tj, s,
                                    ti + tj)
    else:
        out = _tile_counts_mxu(row_stream, col_stream, ti, tj, s, chunk,
                               band)
    n_a = jnp.sum((~u64.is_inf(rows)).astype(jnp.int32), axis=-1)
    n_b = jnp.sum((~u64.is_inf(cols)).astype(jnp.int32), axis=-1)
    out["union_size"] = jnp.minimum(
        n_a[:, None] + n_b[None, :] - out["inter_full"], s
    )
    # [Ti, Tj] broadcast to match the tile_counts contract
    out["n_a"] = jnp.broadcast_to(n_a[:, None], (ti, tj))
    out["n_b"] = jnp.broadcast_to(n_b[None, :], (ti, tj))
    return out


@partial(jax.jit, static_argnames=("ti", "tj", "s", "chunk"))
def _tile_counts_mxu_full(row_stream, col_stream, ti: int, tj: int, s: int,
                          chunk: int):
    """Exact stream pass for ANY value-run length (r3; supersedes the
    banded pass as the default).

    Within a chunk, cross-side matches come from the full equality matrix
    E[p,q] = (val_p == val_q) driven through the MXU:
        m1 = ohRᵀ·E   ∈ {0,1}^[Ti,c]   (sketch values are DISTINCT, so a
                                         row sketch has ≤ 1 element per
                                         value — exact in bf16)
        mᵢ = m1·ohC   ∈ f32^[Ti,Tj]    (counts < 2^24, exact)
    This is the segmented rank-1 accumulation the module docstring costed
    as "~256x the VPU work of band=8" — reformulated as two matmuls it is
    MXU work instead, and the 10k-genome family run (r3) measured the band
    assumption failing at production scale (runs up to 109 ≫ band=8; every
    tile overflowed into the pallas fallback, 228k pairs/s effective).

    Across chunk edges: a run has ≤ ti+tj ≤ chunk elements, so it spans at
    most TWO chunks; the only value that can cross is the previous chunk's
    LAST one.  The correction is the pair of rank-1 outer products
    a_prev⊗b_head + a_head⊗b_prev on {0,1} per-sketch membership vectors
    of that single value.  Rank bracketing for those matches is EXACT: the
    crossing value is the largest seen through the previous chunk's end,
    so its union rank equals the pair's end-of-previous-chunk distinct
    count — both lb and ub use that one indicator (no new ambiguity).
    """
    assert ti + tj <= chunk, (ti, tj, chunk)
    rh, rl, rp = row_stream
    ch, cl, cp = col_stream
    hi, lo, pay = u64.sort(  # merge of two presorted streams
        (jnp.concatenate([rh, ch]), jnp.concatenate([rl, cl])),
        jnp.concatenate([rp, cp]),
    )
    n = hi.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    hi = jnp.pad(hi, (0, pad), constant_values=u64.INF_HI)
    lo = jnp.pad(lo, (0, pad), constant_values=u64.INF_LO)
    # Sentinel payload for INF elements (sketch INF-padding AND chunk
    # padding): no iota ever equals it, so the one-hot masks exclude them
    # with no per-chunk validity logic at all.
    pay = jnp.pad(pay, (0, pad), constant_values=_PAY_SENTINEL)
    pay = jnp.where((hi == u64.INF_HI) & (lo == u64.INF_LO),
                    _PAY_SENTINEL, pay)
    # Global run ids (ONE cumsum over the stream) replace the per-chunk
    # two-plane value compares: within/across-chunk equality is a single
    # int32 compare on rid, and the boundary head test needs no carried
    # (hi, lo) value.  Measured on the family tile 512×512 at s=10k:
    # 431 → 369 ms (~15%), bitwise-identical outputs.
    newrun = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        ((hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])).astype(jnp.int32)])
    rid = jnp.cumsum(newrun, dtype=jnp.int32)
    return _mxu_pass_from_rid(rid, pay, ti, tj, s, chunk, n_chunks)


@partial(jax.jit, static_argnames=("ti", "tj", "s", "chunk"))
def _tile_counts_mxu_full32(row_stream, col_stream, ti: int, tj: int,
                            s: int, chunk: int):
    """Single-plane (compact code) front-end of the full stream pass:
    merge two presorted (code, payload) streams with one 2-array 1-key
    sort, build run ids from code equality, and run the shared
    plane-free core.  Codes are distinct per sketch (store.to_compact
    dedups), so the same exactness argument applies verbatim."""
    assert ti + tj <= chunk, (ti, tj, chunk)
    rc, rp = row_stream
    cc, cp = col_stream
    code, pay = jax.lax.sort(
        (jnp.concatenate([rc, cc]), jnp.concatenate([rp, cp])), num_keys=1)
    n = code.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    code = jnp.pad(code, (0, pad), constant_values=_INF32)
    pay = jnp.pad(pay, (0, pad), constant_values=_PAY_SENTINEL)
    pay = jnp.where(code == _INF32, _PAY_SENTINEL, pay)
    newrun = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (code[1:] != code[:-1]).astype(jnp.int32)])
    rid = jnp.cumsum(newrun, dtype=jnp.int32)
    return _mxu_pass_from_rid(rid, pay, ti, tj, s, chunk, n_chunks)


def _mxu_pass_from_rid(rid, pay, ti: int, tj: int, s: int, chunk: int,
                       n_chunks: int):
    """The value-plane-free core of the full stream pass: everything after
    run-id construction depends only on (rid, pay) — shared verbatim by
    the u64 and the single-plane compact front-ends, so both stay
    bitwise-equivalent by construction."""
    iota_i = jnp.arange(ti, dtype=jnp.uint32)
    iota_j = jnp.arange(tj, dtype=jnp.uint32) | _COL_TAG
    zero_mat = jnp.zeros((ti, tj), jnp.float32)
    zeros_a = jnp.zeros((ti,), jnp.float32)
    zeros_b = jnp.zeros((tj,), jnp.float32)

    def body(carry, start):
        (c_mat, cum_a, cum_b, lb, ub,
         a_carry, b_carry, rid_carry, prev_end_le) = carry
        wrid = jax.lax.dynamic_slice(rid, (start,), (chunk,))
        wpay = jax.lax.dynamic_slice(pay, (start,), (chunk,))
        oh_row = (wpay[:, None] == iota_i[None, :]).astype(jnp.bfloat16)
        oh_col = (wpay[:, None] == iota_j[None, :]).astype(jnp.bfloat16)

        # boundary correction: continuation of the carried open run
        head = (wrid == rid_carry)
        hb = head.astype(jnp.bfloat16)[:, None]
        a_head = jnp.sum((hb * oh_row).astype(jnp.float32), axis=0)
        b_head = jnp.sum((hb * oh_col).astype(jnp.float32), axis=0)
        # The crossing value is the largest seen through the previous
        # chunk's end AND was counted there (one side holds it in prev), so
        # its 1-based union rank EQUALS prev end_distinct: qualification is
        # end <= s, the same indicator for lb and ub (no new ambiguity).
        corr = (a_carry[:, None] * b_head[None, :]
                + a_head[:, None] * b_carry[None, :])
        lb = lb + corr * prev_end_le
        ub = ub + corr * prev_end_le

        # within-chunk matches via the equality matrix on the MXU.  INF
        # elements share a rid and so match each other here, but their
        # sentinel payload zeroes both one-hot operands, so they
        # contribute nothing.
        eq = (wrid[:, None] == wrid[None, :]).astype(jnp.bfloat16)
        m1 = jnp.dot(oh_row.T, eq,
                     preferred_element_type=jnp.float32)  # {0,1}
        m_in = jnp.dot(m1.astype(jnp.bfloat16), oh_col,
                       preferred_element_type=jnp.float32)

        cnt_a = jnp.sum(oh_row.astype(jnp.float32), axis=0)
        cnt_b = jnp.sum(oh_col.astype(jnp.float32), axis=0)
        start_distinct = cum_a[:, None] + cum_b[None, :] - c_mat
        c1 = c_mat + corr + m_in
        ca1 = cum_a + cnt_a
        cb1 = cum_b + cnt_b
        end_distinct = ca1[:, None] + cb1[None, :] - c1
        # in-chunk brackets: start_distinct + 1 <= rank <= end_distinct
        # (both elements of an in-chunk match enter the pair's union inside
        # this chunk), so lb needs end < s... no: qualify iff rank <= s;
        # end_distinct <= s => rank <= s (safe lb); start_distinct >= s =>
        # rank >= s + 1 (safe ub excluder).
        lb = lb + m_in * (end_distinct <= s)
        ub = ub + m_in * (start_distinct < s)

        # open-run carry: membership vectors of this chunk's LAST value
        tail = (wrid == wrid[-1])
        tb = tail.astype(jnp.bfloat16)[:, None]
        a_tail = jnp.sum((tb * oh_row).astype(jnp.float32), axis=0)
        b_tail = jnp.sum((tb * oh_col).astype(jnp.float32), axis=0)
        end_le = (end_distinct <= s).astype(jnp.float32)
        return (c1, ca1, cb1, lb, ub,
                a_tail, b_tail, wrid[-1], end_le), None

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    init = (zero_mat, zeros_a, zeros_b, zero_mat, zero_mat,
            zeros_a, zeros_b, jnp.int32(-2 ** 30),
            jnp.zeros((ti, tj), jnp.float32))
    (c_mat, _, _, lb, ub, *_), _ = jax.lax.scan(body, init, starts)
    return {
        "inter_full": c_mat.astype(jnp.int32),
        "shared_lb": lb.astype(jnp.int32),
        "shared_ub": ub.astype(jnp.int32),
        "overflow": jnp.zeros((), jnp.bool_),
    }


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


@partial(jax.jit, static_argnames=("ti", "tj", "s", "chunk", "band", "mode",
                                   "slim"))
def _mxu_exact_packed(row_stream, col_stream, rows: u64.Pair,
                      cols: u64.Pair, ti: int, tj: int, s: int,
                      chunk: int, band: int, mode: str, slim: bool = False):
    """The full exact-path device computation as ONE dispatch returning ONE
    flat int32 array [4*ti*tj + ti + tj + 1]: (lb | ub | inter | union |
    n_a | n_b | overflow).  The tunneled platform charges a ~40 ms fixed
    cost per device execution AND per host transfer; the previous
    dict-of-arrays epilogue (eager jnp sums/broadcasts + 7 np.asarray
    pulls) measured 494k pairs/s at tile 512 where the raw MXU pass
    benches 818k — the gap was almost entirely those fixed costs.

    slim=True (the r4 deferred bulk path) returns only
    [3*ti*tj + 1]: (lb | ub | inter | overflow) — union/n_a/n_b are
    host-derivable from the index sizes, and dropping them cuts the
    per-tile pull by 25%."""
    if mode == "full":
        out = _tile_counts_mxu_full(row_stream, col_stream, ti, tj, s,
                                    ti + tj)
    else:
        out = _tile_counts_mxu(row_stream, col_stream, ti, tj, s, chunk,
                               band)
    if slim:
        return jnp.concatenate([
            out["shared_lb"].reshape(-1), out["shared_ub"].reshape(-1),
            out["inter_full"].reshape(-1),
            out["overflow"].astype(jnp.int32)[None],
        ])
    n_a = jnp.sum((~u64.is_inf(rows)).astype(jnp.int32), axis=-1)
    n_b = jnp.sum((~u64.is_inf(cols)).astype(jnp.int32), axis=-1)
    union = jnp.minimum(n_a[:, None] + n_b[None, :] - out["inter_full"], s)
    return jnp.concatenate([
        out["shared_lb"].reshape(-1), out["shared_ub"].reshape(-1),
        out["inter_full"].reshape(-1), union.reshape(-1),
        n_a, n_b, out["overflow"].astype(jnp.int32)[None],
    ])


@partial(jax.jit, static_argnames=("ti", "tj", "s", "slim"))
def _mxu_exact_packed32(row_stream, col_stream, codes_rows, codes_cols,
                        ti: int, tj: int, s: int, slim: bool = False):
    """Single-plane analog of _mxu_exact_packed (full mode only — the
    legacy band pass never grew a 32-bit variant)."""
    out = _tile_counts_mxu_full32(row_stream, col_stream, ti, tj, s,
                                  ti + tj)
    if slim:
        return jnp.concatenate([
            out["shared_lb"].reshape(-1), out["shared_ub"].reshape(-1),
            out["inter_full"].reshape(-1),
            out["overflow"].astype(jnp.int32)[None],
        ])
    n_a = jnp.sum((codes_rows != _INF32).astype(jnp.int32), axis=-1)
    n_b = jnp.sum((codes_cols != _INF32).astype(jnp.int32), axis=-1)
    union = jnp.minimum(n_a[:, None] + n_b[None, :] - out["inter_full"], s)
    return jnp.concatenate([
        out["shared_lb"].reshape(-1), out["shared_ub"].reshape(-1),
        out["inter_full"].reshape(-1), union.reshape(-1),
        n_a, n_b, out["overflow"].astype(jnp.int32)[None],
    ])


def tile_counts_mxu_start32(codes_rows: jax.Array, codes_cols: jax.Array,
                            s: int, *, row_stream=None, col_stream=None,
                            slim: bool = False):
    """tile_counts_mxu_start for single-plane compact code sketches.
    Returns a pending handle for tile_counts_mxu_finish(_deferred); the
    finish epilogue derives the (code, lo) pair view only if ambiguity
    resolution actually needs it."""
    if row_stream is None:
        row_stream = sketch_stream32(codes_rows, False)
    if col_stream is None:
        col_stream = sketch_stream32(codes_cols, True)
    ti = codes_rows.shape[0]
    tj = codes_cols.shape[0]
    flat_dev = _mxu_exact_packed32(row_stream, col_stream, codes_rows,
                                   codes_cols, ti, tj, s, slim)
    return (flat_dev, codes_rows, codes_cols, s, slim, "32")


def _pair_view(planes):
    """(hi, lo) u64-pair view of a handle's row/col entry: u64 pairs pass
    through; single code planes get the derived lo plane
    (ops.compact.lo_plane_np — one definition)."""
    if isinstance(planes, tuple):
        return planes
    from .compact import lo_plane_np

    codes = np.asarray(planes)
    return codes, lo_plane_np(codes)


def tile_counts_mxu_start(rows: u64.Pair, cols: u64.Pair, s: int, *,
                          chunk: int = DEFAULT_CHUNK, band: int = DEFAULT_BAND,
                          row_stream=None, col_stream=None,
                          slim: bool = False):
    """Dispatch the MXU pass for a tile WITHOUT waiting for it.

    Returns an opaque pending handle for `tile_counts_mxu_finish`.  JAX
    dispatch is asynchronous, so the caller can enqueue the next tile's
    pass (and its block uploads/sorts) while this one executes — the
    pipelining lever behind engine.dist_tiles' sustained throughput (the
    synchronous loop paid dispatch + ~40 ms tunnel pull + ambiguity
    resolution in series with an idle device)."""
    if row_stream is None:
        row_stream = sketch_stream(rows, False)
    if col_stream is None:
        col_stream = sketch_stream(cols, True)
    ti = rows[0].shape[0]
    tj = cols[0].shape[0]
    flat_dev = _mxu_exact_packed(row_stream, col_stream, rows, cols,
                                 ti, tj, s, chunk, band, "full", slim)
    return (flat_dev, rows, cols, s, slim)


def tile_counts_mxu_exact32(codes_rows: jax.Array, codes_cols: jax.Array,
                            s: int, *, row_stream=None, col_stream=None):
    """tile_counts-compatible exact counts on single code planes (the
    compact analog of tile_counts_mxu_exact)."""
    return tile_counts_mxu_finish(tile_counts_mxu_start32(
        codes_rows, codes_cols, s, row_stream=row_stream,
        col_stream=col_stream))


def tile_counts_mxu_exact(rows: u64.Pair, cols: u64.Pair, s: int, *,
                          chunk: int = DEFAULT_CHUNK, band: int = DEFAULT_BAND,
                          row_stream=None, col_stream=None):
    """tile_counts-compatible exact counts: the MXU pass for the bulk, the
    bitwise-proven bitonic pair kernel for ambiguous pairs (lb != ub) or
    for the whole tile on band overflow.  Returns the same dict of int32
    [Ti, Tj] arrays as intersect.tile_counts (host-synchronized)."""
    return tile_counts_mxu_finish(tile_counts_mxu_start(
        rows, cols, s, chunk=chunk, band=band,
        row_stream=row_stream, col_stream=col_stream))


def tile_counts_mxu_finish(pending):
    """Synchronize a `tile_counts_mxu_start` handle and run the host
    epilogue (overflow fallback, ambiguity resolution).  Bitwise-identical
    to the fused `tile_counts_mxu_exact` call by construction."""
    res, amb_i, amb_j = tile_counts_mxu_finish_deferred(pending)
    if amb_i.size:
        _, rows, cols, s = pending[:4]
        res["shared_in_x"][amb_i, amb_j] = resolve_pairs_host(
            _pair_view(rows), _pair_view(cols), amb_i, amb_j, s)
    return res


def tile_counts_mxu_finish_deferred(pending):
    """Synchronize a `tile_counts_mxu_start` handle WITHOUT resolving
    ambiguous pairs: returns (res, amb_i, amb_j) where res["shared_in_x"]
    holds the lb bracket and the (amb_i, amb_j) tile-local coordinates
    mark pairs with lb != ub.  Callers that sweep many tiles (engine
    dist_counts_matrix) collect the ambiguity across ALL tiles and resolve
    it in a few large batched dispatches at the end — per-tile resolve
    dispatches enqueue BEHIND the already-in-flight next tile passes, so
    each one stalled the pipeline by up to a full tile pass (r3 sustained
    360-408k pairs/s vs 760-818k through the bare dispatch).

    On band overflow (legacy mode only; impossible in full mode) the tile
    falls back to the exact traceable kernel — no ambiguity to defer.

    Slim handles (tile_counts_mxu_start(slim=True)) carry only
    lb/ub/inter; the returned dict then has union_size/n_a/n_b = None —
    the bulk callers derive union host-side from the index sizes."""
    flat_dev, rows, cols, s = pending[:4]
    slim = pending[4] if len(pending) > 4 else False
    single = len(pending) > 5 and pending[5] == "32"
    ti = rows.shape[0] if single else rows[0].shape[0]
    tj = cols.shape[0] if single else cols[0].shape[0]
    empty = np.zeros(0, np.int64)
    flat = np.asarray(flat_dev)
    if bool(flat[-1]):  # overflow (unreachable in full mode — the only
        # mode the single-plane path has — but kept uniform)
        # _intersect_impl() would return "mxu" here (that's how we were
        # reached); resolve to the backend's traceable kernel instead —
        # _tile_counts has no mxu branch and its else-branch is the
        # scalarized-gather searchsorted path, pathological on TPU.
        from .intersect import _tile_counts, _intersect_impl_traced
        r_pair = jax.tree.map(jnp.asarray, _pair_view(rows))
        c_pair = jax.tree.map(jnp.asarray, _pair_view(cols))
        res = jax.tree.map(
            np.asarray,
            _tile_counts(r_pair, c_pair, s, _intersect_impl_traced()))
        return res, empty, empty
    m = ti * tj
    lb = flat[:m].reshape(ti, tj)
    ub = flat[m:2 * m].reshape(ti, tj)
    res = {
        "inter_full": flat[2 * m:3 * m].reshape(ti, tj),
        "shared_in_x": lb.copy(),
    }
    if slim:
        res["union_size"] = res["n_a"] = res["n_b"] = None
    else:
        n_a = flat[4 * m:4 * m + ti]
        n_b = flat[4 * m + ti:4 * m + ti + tj]
        res["n_a"] = np.broadcast_to(n_a[:, None], (ti, tj))
        res["n_b"] = np.broadcast_to(n_b[None, :], (ti, tj))
        res["union_size"] = flat[3 * m:4 * m].reshape(ti, tj)
    amb_i, amb_j = np.nonzero(lb != ub)
    return res, amb_i, amb_j


def resolve_pairs_host(rows: u64.Pair, cols: u64.Pair,
                       amb_i: np.ndarray, amb_j: np.ndarray,
                       s: int) -> np.ndarray:
    """Exact shared_in_x for the listed (row i, col j) pairs — the host
    epilogue shared by the host-orchestrated tile path
    (tile_counts_mxu_finish) and the traced-ring path
    (parallel.allvsall mxu ring: lb/ub come back as ring outputs, the
    few lb != ub pairs resolve here after un-rotation).

    Batched lax.sort resolution: ONE dispatch for thousands of pairs.
    Measured on the real 10k-family tile (3243 ambiguous pairs,
    s=10k): 194 ms vs 3.9 s for 128-pair-chunked bitonic dispatches
    (the bitonic network builds [pairs, 32768]-wide stage temps —
    4096 pairs measured 60 GB of HLO temps, HBM OOM — while one
    batched sort is a single [pairs, 2s] buffer).  RESOLVE_CHUNK
    bounds the sort buffer at ~1.3 GB.

    First try PREFIX resolution at width w < s: sort only the first w
    elements of each sketch.  Exactness certificate per pair: with
    mcap = min(A[w-1], B[w-1]) (u64; INF when a side fits entirely),
    every element ≤ mcap of either sketch is inside its prefix, so if
    the prefix merge holds ≥ s distinct values ≤ mcap, all union
    ranks ≤ s are complete and the count is exact.  Pairs failing the
    certificate (near-clone pairs whose shared mass pushes the s-th
    distinct past the caps) re-resolve at full width.  On the family
    tile this trims the epilogue sort from [P, 2s] to [P, 2w].

    r4: when the native library is built, the whole epilogue is ONE
    threaded C++ two-pointer pass instead (native/miekki_io.cpp
    mio_resolve_pairs) — ~0.1 s for 10k pairs at s=10k where the batched
    device sorts measured 45 s on the tunneled chip; bit-identical
    (tests/test_native_io.py).  Disable with MIEKKI_NATIVE_RESOLVE=0."""
    import os as _os2

    if _os2.environ.get("MIEKKI_NATIVE_RESOLVE", "1") != "0":
        from ..io import native as _native

        if _native.has_resolve():
            return _native.resolve_pairs_native(
                np.asarray(rows[0]), np.asarray(rows[1]),
                np.asarray(cols[0]), np.asarray(cols[1]),
                np.asarray(amb_i, np.int64), np.asarray(amb_j, np.int64), s)
    RESOLVE_CHUNK = 8192
    sp = rows[0].shape[-1]
    w = min(sp, min(s, _resolve_prefix_width(s)))
    k = amb_i.size
    fixed_all = np.empty(k, np.int32)
    ok_all = np.empty(k, bool)
    for o in range(0, k, RESOLVE_CHUNK):
        ci = amb_i[o:o + RESOLVE_CHUNK]
        cj = amb_j[o:o + RESOLVE_CHUNK]
        kc = ci.size
        kp = max(8, 1 << (kc - 1).bit_length())  # pow2 bounds compiles
        pi = np.pad(ci, (0, kp - kc))
        pj = np.pad(cj, (0, kp - kc))
        a = (rows[0][pi, :w], rows[1][pi, :w])
        b = (cols[0][pj, :w], cols[1][pj, :w])
        packed = np.asarray(_resolve_pairs_prefix(a, b, s))
        fixed_all[o:o + kc] = packed[0][:kc]
        ok_all[o:o + kc] = packed[1][:kc].astype(bool)
    bad = np.flatnonzero(~ok_all)
    for o in range(0, bad.size, RESOLVE_CHUNK):
        sel = bad[o:o + RESOLVE_CHUNK]
        kc = sel.size
        kp = max(8, 1 << (kc - 1).bit_length())
        pi = np.pad(amb_i[sel], (0, kp - kc))
        pj = np.pad(amb_j[sel], (0, kp - kc))
        a = (rows[0][pi], rows[1][pi])
        b = (cols[0][pj], cols[1][pj])
        fixed_all[sel] = np.asarray(
            _resolve_pairs_sorted(a, b, s))[:kc]
    return fixed_all


def _resolve_prefix_width(s: int) -> int:
    """Prefix width for the first-try ambiguity resolution: ~5/8·s rounded
    up to a multiple of 2048.  A pair needs ~(s + shared)/2 elements per
    side below the s-th union distinct; 5/8·s covers sharing up to ~25%
    of s with margin — far above any non-clone workload — and clone-like
    pairs fall through to the exact full-width pass."""
    import os as _os

    env = _os.environ.get("MIEKKI_RESOLVE_W")
    if env:
        # Clamp to [1, s]: w<=0 would produce zero-width prefix slices
        # (crashing a[..., -1]); w>s buys nothing over the full sketch
        # (ADVICE r3).
        return max(1, min(s, int(env)))
    return -(-(5 * s // 8) // 2048) * 2048


@partial(jax.jit, static_argnames=("s",))
def _resolve_pairs_prefix(a: u64.Pair, b: u64.Pair, s: int):
    """Prefix-width ambiguity resolution: exact shared_in_x per pair from
    the w-element sketch prefixes, plus a per-pair validity certificate.

    Returns ONE packed int32 [2, P] array (count | ok).  ok=1 iff the
    prefix merge provably contains every union element of rank ≤ s: either
    ≥ s distinct values ≤ mcap = min(last(A), last(B)) (all elements ≤
    mcap of both sketches are inside their prefixes by sortedness), or
    both prefixes end in INF padding (the prefixes ARE the whole sketches).
    Pairs with ok=0 must be re-resolved at full width."""
    h = jnp.concatenate([a[0], b[0]], axis=-1)
    l = jnp.concatenate([a[1], b[1]], axis=-1)
    h, l = jax.lax.sort((h, l), dimension=-1, num_keys=2)
    valid = ~((h == u64.INF_HI) & (l == u64.INF_LO))
    pos = jax.lax.broadcasted_iota(jnp.int32, h.shape, h.ndim - 1)
    dup = ((h == jnp.roll(h, 1, -1)) & (l == jnp.roll(l, 1, -1))
           & (pos > 0) & valid)
    distinct = valid & ~dup
    rank = jnp.cumsum(distinct.astype(jnp.int32), axis=-1)
    cnt = jnp.sum((dup & (rank <= s)).astype(jnp.int32), axis=-1)

    cap = u64.minimum((a[0][..., -1], a[1][..., -1]),
                      (b[0][..., -1], b[1][..., -1]))
    le_cap = ~u64.less((cap[0][..., None], cap[1][..., None]),
                       (h, l))  # (h,l) <= cap
    cnt_le = jnp.sum((distinct & le_cap).astype(jnp.int32), axis=-1)
    both_inf = (u64.is_inf((a[0][..., -1], a[1][..., -1]))
                & u64.is_inf((b[0][..., -1], b[1][..., -1])))
    ok = (cnt_le >= s) | both_inf
    return jnp.stack([cnt, ok.astype(jnp.int32)])


@partial(jax.jit, static_argnames=("s",))
def _resolve_pairs_sorted(a: u64.Pair, b: u64.Pair, s: int):
    """Exact shared_in_x for a batch of (a, b) sketch pairs via one batched
    merge sort — bit-identical to pair_counts_merge per pair."""
    h = jnp.concatenate([a[0], b[0]], axis=-1)
    l = jnp.concatenate([a[1], b[1]], axis=-1)
    h, l = jax.lax.sort((h, l), dimension=-1, num_keys=2)
    valid = ~((h == u64.INF_HI) & (l == u64.INF_LO))
    pos = jax.lax.broadcasted_iota(jnp.int32, h.shape, h.ndim - 1)
    dup = ((h == jnp.roll(h, 1, -1)) & (l == jnp.roll(l, 1, -1))
           & (pos > 0) & valid)
    distinct = valid & ~dup
    rank = jnp.cumsum(distinct.astype(jnp.int32), axis=-1)
    return jnp.sum((dup & (rank <= s)).astype(jnp.int32), axis=-1)
