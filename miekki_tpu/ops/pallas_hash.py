"""Fused Pallas TPU kernel for canonical k-mer hashing (M3, SURVEY.md §7;
the "Pallas rolling-hash/min-reduction kernel" of BASELINE.json north_star).

One VMEM pass per row block computes: 2-bit code validation → per-base seed
select → position rotation → k-window XOR (log k doubling) → forward/reverse
finalization → canonical min → INF masking.  The math is
ops.hash.hash_block_math — literally the same jnp code traced into the
kernel — so the Pallas and XLA paths are bit-identical by construction
(and property-tested against the numpy oracle).

The kernel exists to keep the ~10 u32 intermediate planes out of HBM: XLA
fuses much of the elementwise chain, but the window-doubling slices break
its fusions into several HBM round trips; here everything after the uint8
code load until the 8-byte hash store stays in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64
from .hash import hash_block_math

import os

ROW_BLOCK = int(os.environ.get("MIEKKI_HASH_RB", "8"))  # rows per grid cell


def _hash_kernel(codes_ref, hi_ref, lo_ref, *, k: int):
    codes = codes_ref[...].astype(jnp.int32)
    hi, lo = hash_block_math(codes, k)
    hi_ref[...] = hi
    lo_ref[...] = lo


@partial(jax.jit, static_argnames=("k", "interpret"))
def hash_windows_pallas(codes: jax.Array, k: int, interpret: bool = False):
    """Pallas analog of ops.hash.hash_windows for 2-D [R, W] code blocks.

    Returns ((hi, lo) uint32[R, n], valid bool[R, n]), n = W - k + 1.
    Rows are independent (the caller lays out chunk rows with k-1 overlap);
    the grid tiles rows by ROW_BLOCK.
    """
    if codes.ndim != 2:
        raise ValueError(f"expected [R, W] code rows, got {codes.shape}")
    r, w = codes.shape
    n = w - k + 1
    if n <= 0:
        raise ValueError(f"sequence shorter than k: {w} < {k}")
    rb = min(ROW_BLOCK, r)
    r_pad = -(-r // rb) * rb
    if r_pad != r:
        codes = jnp.pad(codes, ((0, r_pad - r), (0, 0)), constant_values=4)

    hi, lo = pl.pallas_call(
        partial(_hash_kernel, k=k),
        grid=(r_pad // rb,),
        in_specs=[
            pl.BlockSpec((rb, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((rb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, n), jnp.uint32),
            jax.ShapeDtypeStruct((r_pad, n), jnp.uint32),
        ),
        interpret=interpret,
    )(codes.astype(jnp.int32))
    hi, lo = hi[:r], lo[:r]
    return (hi, lo), ~u64.is_inf((hi, lo))
