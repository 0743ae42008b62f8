"""Pallas TPU kernel for batched sorted-sketch intersection (M3; the
"sorted-merge sketch-intersection kernel" of BASELINE.json north_star).

Design: grid over row blocks of BI=8 sketches (one full sublane group).
The column sketches stay in HBM (memory_space ANY); the kernel streams them
one at a time into a double-buffered VMEM scratch with async DMA, so the
next column's transfer overlaps the current column's merge.  Each (row
block, column) step runs a bitonic merge network over the [BI, 2·sp]
concatenation — log2(2·sp) compare-exchange stages of lane-rolls + selects;
no gathers (XLA scalarizes them on TPU) and no lax.sort (O(n log² n)).
Dup flags, distinct ranks (log-doubling prefix sum) and the three Mash
counts come from the same VMEM-resident pass.

Count semantics are identical to ops.intersect.pair_counts_merge
(property-tested in tests/test_ops_intersect.py and on-device in
tools/tpu_eval.py); sketch widths must be a power of two (INF-padded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64

BI = 8  # row sketches per grid cell (= sublane count)


def _roll(x, d):
    # pltpu.roll needs a non-negative shift; negative d (pull from the
    # right) is the modular equivalent.
    return pltpu.roll(x, d % x.shape[1], axis=1)


def _bitonic_merge(hi, lo, sp):
    """[R, 2sp] bitonic rows (asc ++ desc) → sorted ascending rows."""
    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    d = sp
    while d >= 1:
        up = (pos % (2 * d)) < d
        ph, pl_ = _roll(hi, -d), _roll(lo, -d)
        mh, ml = _roll(hi, d), _roll(lo, d)
        less_up = (hi < ph) | ((hi == ph) & (lo <= pl_))
        less_dn = (mh < hi) | ((mh == hi) & (ml <= lo))
        # keep as pure logic ops — Mosaic can't select between i1 vectors
        keep = (up & less_up) | (~up & less_dn)
        hi = jnp.where(keep, hi, jnp.where(up, ph, mh))
        lo = jnp.where(keep, lo, jnp.where(up, pl_, ml))
        d //= 2
    return hi, lo


def _merge_any_width(hi, lo, p2: int):
    """Bitonic merge of [R, W] rows (layout [A asc+INF pad | B-INF pad+desc])
    for ANY lane-aligned width W ≤ p2 (p2 = the enclosing power of two),
    eliminating the 1.64× pow2-padding waste of `_bitonic_merge` at s=10k
    (VERDICT r1 item 2).

    Correctness: run the classic p2-wide ascending merge descent on a
    VIRTUAL array whose lanes [0, p2−W) hold zero and whose lanes
    [p2−W, p2) are these W real lanes.  The virtual sequence
    (zero plateau, A asc, INF plateau, B desc, wrap to zero) is circularly
    bitonic, so the network applies.  Every compare-exchange sends the min
    to the lower index, so a zero at a virtual index can never be replaced
    by a larger value: the zero head is invariant across all stages.  (A
    real hash of exactly 0 can tie-swap with a virtual zero, but ties are
    value-identical, so the multiset in the real lanes — and hence every
    count — is unchanged; the final real lanes are exactly sorted(A ∪ B).)
    Real lanes therefore see virtual partners only in the backward
    direction (local pos < d, up=false), where the exchange
    max(0, x) = x reduces to keeping their own value.  Forward partners of
    up-lanes are always real: (pos+off) % 2d < d bounds the partner inside
    the same 2d block, i.e. below p2, i.e. local pos+d < W.

    Per stage this is also a cheaper compare-exchange than _bitonic_merge's
    both-direction form: one forward-rolled compare produces min/max, and
    only the max is rolled back.
    """
    w = hi.shape[1]
    off = p2 - w
    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    pos_g = pos + off  # position in the virtual p2-wide array
    d = p2 // 2
    while d >= 1:
        yh = _roll(hi, -d)
        yl = _roll(lo, -d)
        le = (hi < yh) | ((hi == yh) & (lo <= yl))
        min_h = jnp.where(le, hi, yh)
        min_l = jnp.where(le, lo, yl)
        max_h = jnp.where(le, yh, hi)
        max_l = jnp.where(le, yl, lo)
        up = (pos_g & (2 * d - 1)) < d
        self_ = pos < d  # backward partner is a virtual zero: keep own value
        hi = jnp.where(up, min_h, jnp.where(self_, hi, _roll(max_h, d)))
        lo = jnp.where(up, min_l, jnp.where(self_, lo, _roll(max_l, d)))
        d //= 2
    return hi, lo


def _prefix_sum(x, pos):
    """Inclusive prefix sum along lanes via log-doubling rolls."""
    length = x.shape[1]
    d = 1
    while d < length:
        x = x + jnp.where(pos >= d, _roll(x, d), 0)
        d <<= 1
    return x


def _counts_for_col(rhi, rlo, chi_row, clo_row, s: int, sp: int):
    """rows [BI, sp] vs ONE column sketch [1, sp] (already lane-reversed):
    → (shared, union, inter) int32 [BI].  sp need only be 128-aligned; the
    merge runs at the true width W = 2·sp inside the enclosing pow2 network
    (`_merge_any_width`)."""
    bi = rhi.shape[0]
    hi = jnp.concatenate([rhi, jnp.broadcast_to(chi_row, (bi, sp))], axis=1)
    lo = jnp.concatenate([rlo, jnp.broadcast_to(clo_row, (bi, sp))], axis=1)
    if sp & (sp - 1):
        p2 = 1 << (2 * sp - 1).bit_length()
        hi, lo = _merge_any_width(hi, lo, p2)
    else:
        # pow2 widths always use the bitonic network (the MIEKKI_MERGE_NET
        # =any toggle was pruned in round 4 — measured slower at pow2).
        hi, lo = _bitonic_merge(hi, lo, sp)

    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    valid = ~((hi == np.uint32(0xFFFFFFFF)) & (lo == np.uint32(0xFFFFFFFF)))
    prev_eq = (hi == _roll(hi, 1)) & (lo == _roll(lo, 1)) & (pos > 0)
    dup = jnp.where(prev_eq & valid, 1, 0)
    distinct = jnp.where(valid, 1, 0) - dup
    rank = _prefix_sum(distinct, pos)
    shared = jnp.sum(jnp.where(rank <= s, dup, 0), axis=1)
    union = jnp.minimum(jnp.sum(distinct, axis=1), s)
    inter = jnp.sum(dup, axis=1)
    return shared, union, inter


def _tile_kernel_u2(rhi_ref, rlo_ref, chi_hbm, clo_hbm,
                    shared_ref, union_ref, inter_ref,
                    buf_hi, buf_lo, sems, *, s: int, sp: int, tj: int):
    """Column-loop unrolled x2 (MIEKKI_TILE_UNROLL=2): two independent
    merges per iteration give the scheduler ILP across their serial
    compare-exchange chains.  Requires tj even (caller pads); 4 DMA slots.

    VMEM limit: two live [BI, 2*sp] merges fit only for sp <= 8192 — at the
    default s=10k (sp=16384) Mosaic reports 22.4M > 16M scoped vmem, so
    this stays opt-in for small-s workloads (measured OOM 2026-08-17).
    """
    rhi = rhi_ref[...]
    rlo = rlo_ref[...]
    bi = rhi.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bi, tj), 1)
    zeros = jnp.zeros((bi, tj), jnp.int32)

    def dma(slot, j):
        return (
            pltpu.make_async_copy(chi_hbm.at[j], buf_hi.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(clo_hbm.at[j], buf_lo.at[slot],
                                  sems.at[slot, 1]),
        )

    for d in dma(0, 0):
        d.start()
    for d in dma(1, 1):
        d.start()

    def body(it, carry):
        sh_acc, un_acc, in_acc = carry
        j0 = 2 * it
        base = jax.lax.rem(it, 2) * 2          # this iteration's slot pair
        nbase = jax.lax.rem(it + 1, 2) * 2     # next iteration's slot pair

        @pl.when(j0 + 2 < tj)
        def _():
            for d in dma(nbase, j0 + 2):
                d.start()
            for d in dma(nbase + 1, j0 + 3):
                d.start()

        for d in dma(base, j0):
            d.wait()
        for d in dma(base + 1, j0 + 1):
            d.wait()
        sh0, un0, in0 = _counts_for_col(rhi, rlo, buf_hi[base], buf_lo[base],
                                        s, sp)
        sh1, un1, in1 = _counts_for_col(rhi, rlo, buf_hi[base + 1],
                                        buf_lo[base + 1], s, sp)
        hit0 = lane == j0
        hit1 = lane == j0 + 1
        sh_acc = jnp.where(hit0, sh0[:, None],
                           jnp.where(hit1, sh1[:, None], sh_acc))
        un_acc = jnp.where(hit0, un0[:, None],
                           jnp.where(hit1, un1[:, None], un_acc))
        in_acc = jnp.where(hit0, in0[:, None],
                           jnp.where(hit1, in1[:, None], in_acc))
        return sh_acc, un_acc, in_acc

    sh, un, it_ = jax.lax.fori_loop(0, tj // 2, body, (zeros, zeros, zeros))
    shared_ref[...] = sh
    union_ref[...] = un
    inter_ref[...] = it_


def _tile_kernel(rhi_ref, rlo_ref, chi_hbm, clo_hbm,
                 shared_ref, union_ref, inter_ref,
                 buf_hi, buf_lo, sems, *, s: int, sp: int, tj: int):
    rhi = rhi_ref[...]
    rlo = rlo_ref[...]

    def dma(slot, j):
        # cols are laid out [tj, 1, sp] so a single-column slice keeps its
        # last two dims (1, sp) intact — slicing one row of a [tj, sp]
        # array would break the (8, 128) sublane tiling.
        return (
            pltpu.make_async_copy(chi_hbm.at[j], buf_hi.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(clo_hbm.at[j], buf_lo.at[slot],
                                  sems.at[slot, 1]),
        )

    for d in dma(0, 0):
        d.start()

    bi = rhi.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bi, tj), 1)
    zeros = jnp.zeros((bi, tj), jnp.int32)

    def body(j, carry):
        sh_acc, un_acc, in_acc = carry
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < tj)
        def _():
            for d in dma(nxt, j + 1):
                d.start()

        for d in dma(slot, j):
            d.wait()
        shared, union, inter = _counts_for_col(
            rhi, rlo, buf_hi[slot], buf_lo[slot], s, sp
        )
        # Single dynamic-lane stores are not supported by Mosaic; select the
        # column into register accumulators and store once after the loop.
        hit = lane == j
        return (
            jnp.where(hit, shared[:, None], sh_acc),
            jnp.where(hit, union[:, None], un_acc),
            jnp.where(hit, inter[:, None], in_acc),
        )

    sh, un, it_ = jax.lax.fori_loop(0, tj, body, (zeros, zeros, zeros))
    shared_ref[...] = sh
    union_ref[...] = un
    inter_ref[...] = it_


@partial(jax.jit, static_argnames=("s", "interpret", "unroll"))
def tile_counts_pallas(rows: u64.Pair, cols: u64.Pair, s: int,
                       interpret: bool = False, unroll: int = None):
    """All-pairs counts for a tile on the Pallas path.

    rows [(Ti, sp)], cols [(Tj, sp)] with sp a power of two (use
    intersect._pad_pow2).  Returns {"shared_in_x", "union_size",
    "inter_full"} int32 [Ti, Tj] plus n_a int32 [Ti] / n_b int32 [Tj] —
    count semantics as intersect.pair_counts_merge.
    """
    ti, sp = rows[0].shape
    tj = cols[0].shape[0]
    if sp % 128 or cols[0].shape[1] != sp:
        raise ValueError(f"128-aligned equal sketch widths required, got "
                         f"{sp} / {cols[0].shape[1]}")
    ti_p = -(-ti // BI) * BI

    if ti_p != ti:
        cfg = ((0, ti_p - ti), (0, 0))
        rows = (jnp.pad(rows[0], cfg, constant_values=u64.INF_HI),
                jnp.pad(rows[1], cfg, constant_values=u64.INF_LO))
    # Reverse cols on the XLA side (one flip) so the kernel concat is
    # bitonic; [tj, 1, sp] layout keeps per-column DMA slices tile-aligned.
    cols_rev = (cols[0][:, ::-1].reshape(tj, 1, sp),
                cols[1][:, ::-1].reshape(tj, 1, sp))

    if unroll is None:  # jit caches key on `unroll`; None resolves the env
        import os       # var at trace time (first call pins it — pass the
        # argument explicitly for switchability, ADVICE r1)
        unroll = int(os.environ.get("MIEKKI_TILE_UNROLL", "1"))
    unroll2 = unroll == 2
    tj_orig = tj
    if unroll2 and tj % 2:
        cfg3 = ((0, 1), (0, 0), (0, 0))
        cols_rev = (jnp.pad(cols_rev[0], cfg3, constant_values=u64.INF_HI),
                    jnp.pad(cols_rev[1], cfg3, constant_values=u64.INF_LO))
        tj += 1
    out_shape = jax.ShapeDtypeStruct((ti_p, tj), jnp.int32)
    row_spec = pl.BlockSpec((BI, sp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec(memory_space=pl.ANY)  # stays in HBM; DMA'd
    out_spec = pl.BlockSpec((BI, tj), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_slots = 4 if unroll2 else 2
    shared, union, inter = pl.pallas_call(
        partial(_tile_kernel_u2 if unroll2 else _tile_kernel,
                s=s, sp=sp, tj=tj),
        grid=(ti_p // BI,),
        in_specs=[row_spec, row_spec, col_spec, col_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((n_slots, 1, sp), jnp.uint32),
            pltpu.VMEM((n_slots, 1, sp), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_slots, 2)),
        ],
        interpret=interpret,
    )(rows[0], rows[1], cols_rev[0], cols_rev[1])

    return {
        "shared_in_x": shared[:ti, :tj_orig],
        "union_size": union[:ti, :tj_orig],
        "inter_full": inter[:ti, :tj_orig],
        "n_a": jnp.sum(~u64.is_inf(rows), axis=-1).astype(jnp.int32)[:ti],
        "n_b": jnp.sum(~u64.is_inf(cols), axis=-1).astype(jnp.int32),
    }


# ------------------------------------------------------------------ compact
# Single-plane (uint32 code) variants for compact indexes (ops/compact.py):
# the merge network runs on ONE plane, halving both the compare-exchange op
# count and the VMEM footprint per column.  Sentinel: code == 0xFFFFFFFF
# (encode clamps real values away from it).


def _merge_any_width32(x, p2: int):
    """_merge_any_width on a single uint32 plane (same virtual-zero-head
    argument; see the u64 version's docstring for the correctness proof)."""
    w = x.shape[1]
    off = p2 - w
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    pos_g = pos + off
    d = p2 // 2
    while d >= 1:
        y = _roll(x, -d)
        le = x <= y
        mn = jnp.where(le, x, y)
        mx = jnp.where(le, y, x)
        up = (pos_g & (2 * d - 1)) < d
        self_ = pos < d
        x = jnp.where(up, mn, jnp.where(self_, x, _roll(mx, d)))
        d //= 2
    return x


def _counts_for_col32(r, c_row, s: int, sp: int):
    """rows [BI, sp] uint32 codes vs ONE column [1, sp] (lane-reversed) →
    (shared, union, inter) int32 [BI]."""
    bi = r.shape[0]
    x = jnp.concatenate([r, jnp.broadcast_to(c_row, (bi, sp))], axis=1)
    p2 = 1 << (2 * sp - 1).bit_length()
    x = _merge_any_width32(x, p2)
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid = x != np.uint32(0xFFFFFFFF)
    prev_eq = (x == _roll(x, 1)) & (pos > 0)
    dup = jnp.where(prev_eq & valid, 1, 0)
    distinct = jnp.where(valid, 1, 0) - dup
    rank = _prefix_sum(distinct, pos)
    shared = jnp.sum(jnp.where(rank <= s, dup, 0), axis=1)
    union = jnp.minimum(jnp.sum(distinct, axis=1), s)
    inter = jnp.sum(dup, axis=1)
    return shared, union, inter


def _tile_kernel32_u2(r_ref, c_hbm, shared_ref, union_ref, inter_ref,
                      buf, sems, *, s: int, sp: int, tj: int):
    """Column-loop unrolled x2 single-plane kernel (compact codes).  Two
    independent merges per iteration give the scheduler ILP across their
    serial compare-exchange chains — same structure as `_tile_kernel_u2`,
    but the single plane HALVES the live VMEM, so unlike the u64 kernel
    (Mosaic scoped-vmem OOM at sp=16384, see _tile_kernel_u2) this fits at
    the production s=10k width.  Requires tj even (caller pads); 4 slots."""
    r = r_ref[...]
    bi = r.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bi, tj), 1)
    zeros = jnp.zeros((bi, tj), jnp.int32)

    def dma(slot, j):
        return pltpu.make_async_copy(c_hbm.at[j], buf.at[slot], sems.at[slot])

    dma(0, 0).start()
    dma(1, 1).start()

    def body(it, carry):
        sh_acc, un_acc, in_acc = carry
        j0 = 2 * it
        base = jax.lax.rem(it, 2) * 2          # this iteration's slot pair
        nbase = jax.lax.rem(it + 1, 2) * 2     # next iteration's slot pair

        @pl.when(j0 + 2 < tj)
        def _():
            dma(nbase, j0 + 2).start()
            dma(nbase + 1, j0 + 3).start()

        dma(base, j0).wait()
        dma(base + 1, j0 + 1).wait()
        sh0, un0, in0 = _counts_for_col32(r, buf[base], s, sp)
        sh1, un1, in1 = _counts_for_col32(r, buf[base + 1], s, sp)
        hit0 = lane == j0
        hit1 = lane == j0 + 1
        sh_acc = jnp.where(hit0, sh0[:, None],
                           jnp.where(hit1, sh1[:, None], sh_acc))
        un_acc = jnp.where(hit0, un0[:, None],
                           jnp.where(hit1, un1[:, None], un_acc))
        in_acc = jnp.where(hit0, in0[:, None],
                           jnp.where(hit1, in1[:, None], in_acc))
        return sh_acc, un_acc, in_acc

    sh, un, it_ = jax.lax.fori_loop(0, tj // 2, body, (zeros, zeros, zeros))
    shared_ref[...] = sh
    union_ref[...] = un
    inter_ref[...] = it_


def _tile_kernel32(r_ref, c_hbm, shared_ref, union_ref, inter_ref,
                   buf, sems, *, s: int, sp: int, tj: int):
    r = r_ref[...]
    bi = r.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bi, tj), 1)
    zeros = jnp.zeros((bi, tj), jnp.int32)

    def dma(slot, j):
        return pltpu.make_async_copy(c_hbm.at[j], buf.at[slot], sems.at[slot])

    dma(0, 0).start()

    def body(j, carry):
        sh_acc, un_acc, in_acc = carry
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < tj)
        def _():
            dma(nxt, j + 1).start()

        dma(slot, j).wait()
        shared, union, inter = _counts_for_col32(r, buf[slot], s, sp)
        hit = lane == j
        return (
            jnp.where(hit, shared[:, None], sh_acc),
            jnp.where(hit, union[:, None], un_acc),
            jnp.where(hit, inter[:, None], in_acc),
        )

    sh, un, it_ = jax.lax.fori_loop(0, tj, body, (zeros, zeros, zeros))
    shared_ref[...] = sh
    union_ref[...] = un
    inter_ref[...] = it_


@partial(jax.jit, static_argnames=("s", "interpret", "unroll"))
def tile_counts_pallas32(rows: jax.Array, cols: jax.Array, s: int,
                         interpret: bool = False, unroll: int = None):
    """All-pairs counts for a COMPACT tile: rows [Ti, sp] / cols [Tj, sp]
    uint32 codes, sp 128-aligned.  Same output dict as tile_counts_pallas.
    Half the merge ops and half the VMEM of the u64 kernel — which also
    makes the x2 column unroll (MIEKKI_TILE_UNROLL=2) VMEM-feasible at the
    production s=10k width, unlike the u64 kernel."""
    ti, sp = rows.shape
    tj = cols.shape[0]
    if sp % 128 or cols.shape[1] != sp:
        raise ValueError(f"128-aligned equal sketch widths required, got "
                         f"{sp} / {cols.shape[1]}")
    ti_p = -(-ti // BI) * BI
    if ti_p != ti:
        rows = jnp.pad(rows, ((0, ti_p - ti), (0, 0)),
                       constant_values=np.uint32(0xFFFFFFFF))
    cols_rev = cols[:, ::-1].reshape(tj, 1, sp)

    if unroll is None:  # same env resolution as tile_counts_pallas
        import os

        unroll = int(os.environ.get("MIEKKI_TILE_UNROLL", "1"))
    unroll2 = unroll == 2
    tj_orig = tj
    if unroll2 and tj % 2:
        cols_rev = jnp.pad(cols_rev, ((0, 1), (0, 0), (0, 0)),
                           constant_values=np.uint32(0xFFFFFFFF))
        tj += 1
    n_slots = 4 if unroll2 else 2
    out_shape = jax.ShapeDtypeStruct((ti_p, tj), jnp.int32)
    row_spec = pl.BlockSpec((BI, sp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((BI, tj), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shared, union, inter = pl.pallas_call(
        partial(_tile_kernel32_u2 if unroll2 else _tile_kernel32,
                s=s, sp=sp, tj=tj),
        grid=(ti_p // BI,),
        in_specs=[row_spec, col_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((n_slots, 1, sp), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        interpret=interpret,
    )(rows, cols_rev)
    return {
        "shared_in_x": shared[:ti, :tj_orig],
        "union_size": union[:ti, :tj_orig],
        "inter_full": inter[:ti, :tj_orig],
        "n_a": jnp.sum(rows != np.uint32(0xFFFFFFFF),
                       axis=-1).astype(jnp.int32)[:ti],
        "n_b": jnp.sum(cols != np.uint32(0xFFFFFFFF),
                       axis=-1).astype(jnp.int32),
    }
