"""Fused Pallas kernel: rolling hash + threshold + hierarchical min-reduce
(M3 "Pallas rolling-hash/min-reduction kernel", BASELINE.json north_star;
SURVEY.md §7 item 3).

One VMEM pass per [8, W] row block: canonical ntHash windows → threshold
mask (h < current s-th sketch min, passed as SMEM scalars) → two levels of
group-local sorts along lanes keeping the smallest GROUP_CAP per
GROUP_W-lane group.  Output candidates are 16× smaller than the raw hash
array, so the bottom-s merge that follows in XLA touches ~C/16 values and
no global sort/top_k over the chunk ever runs — and the raw hashes never
round-trip through HBM.

Group sorting uses Batcher's odd-even mergesort expressed as static
lane-rolls + positional masks: unlike the bitonic network's mirror stage,
every odd-even compare-exchange is at a uniform distance, so one roll per
stage sorts all groups at once (partners never cross a group boundary
because distances divide the power-of-two group width).

Exactness: a group holding more than GROUP_CAP finite candidates may drop a
needed value; per-group finite counts are emitted so the caller can take
the exact full-merge fallback (same contract as ops.sketch's tree
strategy — fires on cold sketches and adversarially repetitive input).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64
from .hash import hash_block_math

ROW_BLOCK = 8
GROUP_W = 128   # lanes per sort group at each level (power of two)
GROUP_CAP = 32  # candidates kept per group per level (4x reduction/level)
INF32 = np.uint32(0xFFFFFFFF)


def _roll(x, d):
    return pltpu.roll(x, d % x.shape[-1], axis=x.ndim - 1)


def _oddeven_stages(width: int):
    """Batcher odd-even mergesort stage list for one `width`-wire network:
    yields (p, k) with all compare-exchanges at distance k (Sedgewick's
    iterative form)."""
    p = 1
    while p < width:
        k = p
        while k >= 1:
            yield p, k
            k //= 2
        p *= 2


def _group_sort(hi, lo, width: int):
    """Sort every `width`-lane group of [..., L] ascending (INF sinks).

    width must be a power of two dividing L.  Static masks derive from the
    within-group position; partners sit at uniform distance k, fetched with
    full-width rolls (group-crossing lanes are masked off).
    """
    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, hi.ndim - 1) % width

    def send_mask(m, p, k):
        j0 = k % p
        return (
            (m >= j0)
            & (((m - j0) % (2 * k)) < k)
            & (m + k < width)
            & ((m // (2 * p)) == ((m + k) // (2 * p)))
        )

    for p, k in _oddeven_stages(width):
        snd = send_mask(pos, p, k)          # lane m compares with m + k
        rcv = send_mask(pos - k, p, k)      # lane m is the m' + k partner
        ph, pl_ = _roll(hi, -k), _roll(lo, -k)   # value at m + k
        mh, ml = _roll(hi, k), _roll(lo, k)      # value at m - k
        le_fwd = (hi < ph) | ((hi == ph) & (lo <= pl_))   # x <= partner_fwd
        le_bwd = (mh < hi) | ((mh == hi) & (ml <= lo))    # partner_bwd <= x
        keep = (snd & le_fwd) | (rcv & le_bwd) | (~snd & ~rcv)
        hi = jnp.where(keep, hi, jnp.where(snd, ph, mh))
        lo = jnp.where(keep, lo, jnp.where(snd, pl_, ml))
    return hi, lo


def _take_groups(x, width: int, cap: int):
    """[..., L] → [..., L//width*cap]: first `cap` lanes of each group.

    Written as a python loop of STATIC lane slices + one concat: the
    reshape([.., g, width])[..., :cap].reshape(..) form crashes this
    machine's remote Mosaic compile helper whenever it follows the fused
    hash chain (r2 bisect: hash-only OK, sort-only OK, hash+sort OK,
    hash+reshape-take — helper subprocess dies; the slice+concat form
    compiles).  XLA lowers both forms identically outside Pallas.
    """
    g = x.shape[-1] // width
    return jnp.concatenate(
        [x[..., i * width:i * width + cap] for i in range(g)], axis=-1)


def _finite_counts(hi, lo, width: int):
    """Per-group finite (non-INF) counts: [..., L] → int32 [..., L//width]."""
    lead = hi.shape[:-1]
    g = hi.shape[-1] // width
    fin = jnp.where((hi == INF32) & (lo == INF32), 0, 1)
    return jnp.sum(fin.reshape(*lead, g, width), axis=-1)


def _sketch_kernel(codes_ref, thr_ref, cand_hi_ref, cand_lo_ref, cnt_ref,
                   *, k: int, levels: int):
    codes = codes_ref[...].astype(jnp.int32)
    hi, lo = hash_block_math(codes, k)          # [8, n], INF-masked invalid
    thr_h = thr_ref[0, 0]
    thr_l = thr_ref[0, 1]
    keep = (hi < thr_h) | ((hi == thr_h) & (lo < thr_l))
    hi = jnp.where(keep, hi, INF32)
    lo = jnp.where(keep, lo, INF32)

    # each level: [8, m] → [8, m/4] (sort GROUP_W lanes, keep GROUP_CAP)
    cmax = jnp.zeros((hi.shape[0], 1), jnp.int32)
    for _ in range(levels):
        c = _finite_counts(hi, lo, GROUP_W)
        cmax = jnp.maximum(cmax, jnp.max(c, axis=-1, keepdims=True))
        hi, lo = _group_sort(hi, lo, GROUP_W)
        hi = _take_groups(hi, GROUP_W, GROUP_CAP)
        lo = _take_groups(lo, GROUP_W, GROUP_CAP)

    cand_hi_ref[...] = hi
    cand_lo_ref[...] = lo
    cnt_ref[...] = jnp.broadcast_to(cmax, cnt_ref.shape).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "interpret", "levels"))
def hash_reduce_pallas(codes: jax.Array, k: int, thr: u64.Pair,
                       interpret: bool = False, levels: int = 2):
    """Fused hash + threshold + 4^levels candidate reduction.

    codes: [R, W] (uint8/int32), W - k + 1 divisible by 4^levels * 128.
    thr: scalar (hi, lo) pair — candidates must be strictly below it.
    Returns ((hi, lo) uint32 [R, (W-k+1)//4^levels] INF-padded candidate
    arrays, overflow bool scalar).  When `overflow` is False the candidate
    arrays contain EVERY hash < thr (possibly with duplicates), so the
    bottom-s merge over them is exact.  MIEKKI_FUSED_LEVELS tunes the
    module size vs reduction tradeoff (the 2-level module has crashed this
    machine's remote Mosaic compile helper; 1 level is half the network).
    """
    r, w = codes.shape
    n = w - k + 1
    red = 4 ** levels
    if n % (red * GROUP_W // 4):
        raise ValueError(f"window count {n} incompatible with {levels} levels")
    rb = ROW_BLOCK
    r_pad = -(-r // rb) * rb
    if r_pad != r:
        codes = jnp.pad(codes, ((0, r_pad - r), (0, 0)), constant_values=4)
    out_w = n // red
    thr_arr = jnp.stack(
        [thr[0].astype(jnp.uint32), thr[1].astype(jnp.uint32)]
    ).reshape(1, 2)

    cand_hi, cand_lo, cnt = pl.pallas_call(
        partial(_sketch_kernel, k=k, levels=levels),
        grid=(r_pad // rb,),
        in_specs=[
            pl.BlockSpec((rb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, out_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, out_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, out_w), jnp.uint32),
            jax.ShapeDtypeStruct((r_pad, out_w), jnp.uint32),
            jax.ShapeDtypeStruct((r_pad, 128), jnp.int32),
        ),
        interpret=interpret,
    )(codes.astype(jnp.int32), thr_arr)

    overflow = jnp.max(cnt) > GROUP_CAP
    return (cand_hi[:r], cand_lo[:r]), overflow
