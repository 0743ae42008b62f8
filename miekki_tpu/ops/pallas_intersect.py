"""Pallas TPU kernel for batched sorted-sketch intersection (M3; the
"sorted-merge sketch-intersection kernel" of BASELINE.json north_star).

Per grid cell, a (BI × BJ) block of sketch pairs is merged entirely in VMEM
with a bitonic merge network (log2(2·sp) compare-exchange stages of
lane-rolls + selects — no gathers, which XLA scalarizes on TPU, and no
lax.sort, which costs O(n log² n)).  Dup flags, distinct ranks (log-doubling
prefix sum) and the three Mash counts come out of the same VMEM pass, so
HBM sees only the two sketch blocks in and three [Ti, Tj] count tiles out.

Count semantics are identical to ops.intersect.pair_counts_merge
(property-tested); sketch widths must be a power of two (INF-padded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64

BI = 4  # row sketches per grid cell
BJ = 2  # col sketches per grid cell  (BI*BJ = 8 → full sublane occupancy)


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
        keep = jnp.where(up, less_up, less_dn)
        hi = jnp.where(keep, hi, jnp.where(up, ph, mh))
        lo = jnp.where(keep, lo, jnp.where(up, pl_, ml))
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


def _tile_kernel(rhi_ref, rlo_ref, chi_ref, clo_ref,
                 shared_ref, union_ref, inter_ref, *, s: int, sp: int):
    # rows [BI, sp]; cols [BJ, sp] ALREADY lane-reversed by the caller
    # (descending, INF padding at the front) so concat(rows, cols) is bitonic.
    bi, bj = rhi_ref.shape[0], chi_ref.shape[0]
    r = bi * bj

    def cross(a, c):  # [BI, sp] x [BJ, sp] → [BI*BJ, 2sp]
        ab = jnp.broadcast_to(a[:, None, :], (bi, bj, sp)).reshape(r, sp)
        cb = jnp.broadcast_to(c[None, :, :], (bi, bj, sp)).reshape(r, sp)
        return jnp.concatenate([ab, cb], axis=1)

    hi = cross(rhi_ref[...], chi_ref[...])
    lo = cross(rlo_ref[...], clo_ref[...])
    hi, lo = _bitonic_merge(hi, lo, sp)

    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    valid = ~((hi == np.uint32(0xFFFFFFFF)) & (lo == np.uint32(0xFFFFFFFF)))
    prev_eq = (hi == _roll(hi, 1)) & (lo == _roll(lo, 1)) & (pos > 0)
    dup = jnp.where(prev_eq & valid, 1, 0)
    distinct = jnp.where(valid, 1, 0) - dup
    rank = _prefix_sum(distinct, pos)
    in_x = rank <= s

    shared = jnp.sum(jnp.where(in_x, dup, 0), axis=1)
    union = jnp.minimum(jnp.sum(distinct, axis=1), s)
    inter = jnp.sum(dup, axis=1)
    shared_ref[...] = shared.reshape(bi, bj)
    union_ref[...] = union.reshape(bi, bj)
    inter_ref[...] = inter.reshape(bi, bj)


@partial(jax.jit, static_argnames=("s", "interpret"))
def tile_counts_pallas(rows: u64.Pair, cols: u64.Pair, s: int,
                       interpret: bool = False):
    """All-pairs counts for a tile on the Pallas path.

    rows [(Ti, sp)], cols [(Tj, sp)] with sp a power of two (use
    intersect._pad_pow2).  Returns {"shared_in_x", "union_size",
    "inter_full", "n_a", "n_b"} of int32 [Ti, Tj] / [Ti] / [Tj] — the same
    contract as intersect.tile_counts.
    """
    ti, sp = rows[0].shape
    tj = cols[0].shape[0]
    if sp & (sp - 1) or cols[0].shape[1] != sp:
        raise ValueError(f"power-of-two sketch width required, got {sp}")
    ti_p, tj_p = -(-ti // BI) * BI, -(-tj // BJ) * BJ

    def pad(p, n_to, fill):
        if p[0].shape[0] == n_to:
            return p
        cfg = ((0, n_to - p[0].shape[0]), (0, 0))
        return (jnp.pad(p[0], cfg, constant_values=fill),
                jnp.pad(p[1], cfg, constant_values=fill))

    rows = pad(rows, ti_p, u64.INF_HI)
    cols = pad(cols, tj_p, u64.INF_HI)
    # Reverse cols on the XLA side (one flip) so the kernel concat is bitonic.
    cols_rev = (cols[0][:, ::-1], cols[1][:, ::-1])

    out_shape = jax.ShapeDtypeStruct((ti_p, tj_p), jnp.int32)
    row_spec = pl.BlockSpec((BI, sp), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((BJ, sp), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BI, BJ), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    shared, union, inter = pl.pallas_call(
        partial(_tile_kernel, s=s, sp=sp),
        grid=(ti_p // BI, tj_p // BJ),
        in_specs=[row_spec, row_spec, col_spec, col_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(rows[0], rows[1], cols_rev[0], cols_rev[1])

    return {
        "shared_in_x": shared[:ti, :tj],
        "union_size": union[:ti, :tj],
        "inter_full": inter[:ti, :tj],
        "n_a": jnp.sum(~u64.is_inf(rows), axis=-1).astype(jnp.int32)[:ti],
        "n_b": jnp.sum(~u64.is_inf(cols), axis=-1).astype(jnp.int32)[:tj],
    }
