"""Distributed all-vs-all comparison: ppermute ring over the ``db`` axis.

SURVEY.md §2 parallelism table / §3.2: the [N, N] comparison matrix is tiled
across the mesh — every device owns one row block of the genome-sharded
[N, s] sketch table, and the column blocks travel around a ring
(`lax.ppermute` over ICI/DCN, the ring-attention communication pattern
applied to sketch blocks).  After D steps each device has intersected its
row block against every column block; compute on step t overlaps XLA's
collective-permute of the block for step t+1 (both live inside one
`lax.scan` iteration, so the scheduler can run them concurrently).

Step/offset bookkeeping: with the ring permutation i → (i+1) mod D applied
after every step, device d holds, at step t, the column block ORIGINALLY
owned by device (d - t) mod D.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..index.store import SketchIndex
from ..ops import intersect as _intersect

from .mesh import DB_AXIS

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _ring_counts_rect_local(rows_hi, rows_lo, cols_hi, cols_lo, *, s: int,
                            axis: str, impl=None):
    """Per-device body (inside shard_map): resident A row block [Na_l, s]
    vs a rotating B column block [Nb_l, s] → counts [D, Na_l, Nb_l].

    The rectangular ring does exactly n_a × n_b tile work — B's blocks
    rotate through A's row-block owners; nothing is embedded in a square
    (VERDICT r1 weak #4)."""
    D = lax.axis_size(axis)
    perm = [(i, (i + 1) % D) for i in range(D)]

    def step(carry, _):
        c_hi, c_lo = carry
        counts = _intersect.tile_counts((rows_hi, rows_lo), (c_hi, c_lo), s,
                                        impl=impl)
        # Rotate the column block for the next step; XLA overlaps this
        # collective-permute with the (independent) intersection above.
        c_hi = lax.ppermute(c_hi, axis, perm)
        c_lo = lax.ppermute(c_lo, axis, perm)
        return (c_hi, c_lo), (counts["shared_in_x"], counts["union_size"],
                              counts["inter_full"])

    _, (shared, union, inter) = lax.scan(step, (cols_hi, cols_lo), None,
                                         length=D)
    return shared, union, inter  # each [D, Na_l, Nb_l]


def _ring_counts_local(rows_hi, rows_lo, *, s: int, axis: str, impl=None):
    """Self-comparison body: rows [Nl, s] → counts [D, Nl, Nl] (the
    rectangular body with A == B)."""
    return _ring_counts_rect_local(rows_hi, rows_lo, rows_hi, rows_lo,
                                   s=s, axis=axis, impl=impl)


@partial(jax.jit, static_argnames=("s", "mesh", "axis", "impl"))
def ring_all_vs_all_counts(
    db_hi: jax.Array, db_lo: jax.Array, *, s: int, mesh: Mesh,
    axis: str = DB_AXIS, impl: str = None
) -> Tuple[jax.Array, jax.Array]:
    """Sharded all-vs-all counts.

    db planes: [N, s] uint32 with N divisible by the ``axis`` size (pad with
    UINT64_MAX rows first).  Returns (shared, union, inter) int32 [N, N] —
    already un-rotated into global (row, column) order.
    """
    D = mesh.shape[axis]
    n = db_hi.shape[0]
    if n % D:
        raise ValueError(f"N={n} not divisible by mesh axis {axis}={D}")
    nl = n // D

    spec_db = P(axis, None)
    shared, union, inter = shard_map(
        partial(_ring_counts_local, s=s, axis=axis, impl=impl),
        mesh=mesh,
        in_specs=(spec_db, spec_db),
        out_specs=(P(None, axis, None),) * 3,
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(db_hi, db_lo)
    unrot = partial(_unrotate, D=D, nl_rows=nl, nl_cols=nl)
    return unrot(shared), unrot(union), unrot(inter)


def _unrotate(x, *, D: int, nl_rows: int, nl_cols: int):
    """[D(steps), D*nl_rows, nl_cols] ring output → global count matrix.

    At step t, global rows d*nl_rows:(d+1)*nl_rows hold the intersection vs
    the column block ORIGINALLY owned by device (d - t) mod D.  One
    advanced-index scatter (a python loop over (t, d) would emit D² scatter
    ops — trace bloat at pod scale)."""
    t_ids = jnp.arange(D)[:, None]
    d_ids = jnp.broadcast_to(jnp.arange(D)[None, :], (D, D))
    origin = (d_ids - t_ids) % D
    x = x.reshape(D, D, nl_rows, nl_cols)  # [t, d, row_in_block, col_in_blk]
    out = jnp.zeros((D, nl_rows, D, nl_cols), x.dtype)
    # advanced indices separated by a slice put the [D, D] index-broadcast
    # dims first: vals[t, d] lands at out[d_ids[t,d], :, origin[t,d], :]
    out = out.at[d_ids, :, origin, :].set(x)
    return out.reshape(D * nl_rows, D * nl_cols)


def _ring_chunk_local(rows_hi, rows_lo, cols_hi, cols_lo, *, s: int,
                      axis: str, t0: int, n_steps: int, impl=None):
    """Ring steps [t0, t0 + n_steps) only (inside shard_map): the column
    block is first pre-rotated by t0 with a single offset ppermute, then the
    usual rotate-and-intersect scan runs for n_steps.  Chunking the ring
    this way makes a pod-scale all-vs-all checkpointable between chunks
    (SURVEY.md §5 failure detection; exercised by
    tools/multiprocess_fault_test.py: kill a process mid-run, resume from
    the last complete chunk, bitwise-identical matrix)."""
    D = lax.axis_size(axis)
    if t0 % D:
        perm0 = [(i, (i + t0) % D) for i in range(D)]
        cols_hi = lax.ppermute(cols_hi, axis, perm0)
        cols_lo = lax.ppermute(cols_lo, axis, perm0)
    perm = [(i, (i + 1) % D) for i in range(D)]

    def step(carry, _):
        c_hi, c_lo = carry
        counts = _intersect.tile_counts((rows_hi, rows_lo), (c_hi, c_lo), s,
                                        impl=impl)
        c_hi = lax.ppermute(c_hi, axis, perm)
        c_lo = lax.ppermute(c_lo, axis, perm)
        return (c_hi, c_lo), (counts["shared_in_x"], counts["union_size"],
                              counts["inter_full"])

    _, (shared, union, inter) = lax.scan(step, (cols_hi, cols_lo), None,
                                         length=n_steps)
    return shared, union, inter  # each [n_steps, Nl, Nl]


@partial(jax.jit, static_argnames=("s", "mesh", "axis", "t0", "n_steps",
                                   "impl"))
def ring_chunk_counts(
    db_hi: jax.Array, db_lo: jax.Array, *, s: int, mesh: Mesh, t0: int,
    n_steps: int, axis: str = DB_AXIS, impl: str = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Self-comparison ring restricted to steps [t0, t0+n_steps).

    Returns (shared, union, inter) int32 [n_steps, N, N//D] in RING order:
    slice [t - t0, d*nl:(d+1)*nl, :] holds row block d vs the column block
    originally owned by device (d - t) mod D.  Use `unrotate_chunks` after
    concatenating all chunks to recover the global matrix."""
    D = mesh.shape[axis]
    n = db_hi.shape[0]
    if n % D:
        raise ValueError(f"N={n} not divisible by mesh axis {axis}={D}")
    spec_db = P(axis, None)
    return shard_map(
        partial(_ring_chunk_local, s=s, axis=axis, t0=t0, n_steps=n_steps,
                impl=impl),
        mesh=mesh,
        in_specs=(spec_db, spec_db, spec_db, spec_db),
        out_specs=(P(None, axis, None),) * 3,
        check_vma=False,
    )(db_hi, db_lo, db_hi, db_lo)


def unrotate_chunks(x: np.ndarray, *, D: int) -> np.ndarray:
    """Host-side: concatenated chunk outputs [D(steps), N, nl] → [N, N]."""
    n = x.shape[1]
    nl = n // D
    out = np.zeros((n, n), x.dtype)
    for t in range(D):
        for d in range(D):
            origin = (d - t) % D
            out[d * nl:(d + 1) * nl, origin * nl:(origin + 1) * nl] = \
                x[t, d * nl:(d + 1) * nl, :]
    return out


@partial(jax.jit, static_argnames=("s", "mesh", "axis", "impl"))
def ring_rect_counts(
    a_hi: jax.Array, a_lo: jax.Array, b_hi: jax.Array, b_lo: jax.Array,
    *, s: int, mesh: Mesh, axis: str = DB_AXIS, impl: str = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sharded rectangular A-vs-B counts: both tables row-sharded over
    ``axis``; B's blocks rotate through A's owners (n_a × n_b tile work,
    no square embedding).  Returns (shared, union, inter) int32
    [N_a, N_b] in global order."""
    D = mesh.shape[axis]
    n_a, n_b = a_hi.shape[0], b_hi.shape[0]
    if n_a % D or n_b % D:
        raise ValueError(f"N_a={n_a}/N_b={n_b} not divisible by {axis}={D}")
    spec_db = P(axis, None)
    shared, union, inter = shard_map(
        partial(_ring_counts_rect_local, s=s, axis=axis, impl=impl),
        mesh=mesh,
        in_specs=(spec_db,) * 4,
        out_specs=(P(None, axis, None),) * 3,
        check_vma=False,
    )(a_hi, a_lo, b_hi, b_lo)
    unrot = partial(_unrotate, D=D, nl_rows=n_a // D, nl_cols=n_b // D)
    return unrot(shared), unrot(union), unrot(inter)


def _ring_counts_rect_local32(rows, cols, *, s: int, axis: str, impl=None):
    """Single-plane (compact uint32 code) rectangular ring body: half the
    ppermute bytes and half the merge ops of the (hi, lo) pair body
    (ops/compact.py; intersect._tile_counts_compact)."""
    D = lax.axis_size(axis)
    perm = [(i, (i + 1) % D) for i in range(D)]
    # impl=None resolves here (trace time — pinned by the enclosing jit
    # cache, same caveat as the u64 ring entries; dist_sharded passes it
    # explicitly).  Must be a traceable impl: mxu never reaches here.
    impl = impl or _intersect._intersect_impl_traced()

    def step(c, _):
        counts = _intersect._tile_counts_compact(rows, c, s, impl)
        c = lax.ppermute(c, axis, perm)
        return c, (counts["shared_in_x"], counts["union_size"],
                   counts["inter_full"])

    _, (shared, union, inter) = lax.scan(step, cols, None, length=D)
    return shared, union, inter


@partial(jax.jit, static_argnames=("s", "mesh", "axis", "impl"))
def ring_rect_counts32(
    a: jax.Array, b: jax.Array, *, s: int, mesh: Mesh,
    axis: str = DB_AXIS, impl: str = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ring_rect_counts on single-plane compact code tables (pass a == b
    for self-comparison; the body is the rectangular one either way)."""
    D = mesh.shape[axis]
    n_a, n_b = a.shape[0], b.shape[0]
    if n_a % D or n_b % D:
        raise ValueError(f"N_a={n_a}/N_b={n_b} not divisible by {axis}={D}")
    spec_db = P(axis, None)
    shared, union, inter = shard_map(
        partial(_ring_counts_rect_local32, s=s, axis=axis, impl=impl),
        mesh=mesh,
        in_specs=(spec_db, spec_db),
        out_specs=(P(None, axis, None),) * 3,
        check_vma=False,
    )(a, b)
    unrot = partial(_unrotate, D=D, nl_rows=n_a // D, nl_cols=n_b // D)
    return unrot(shared), unrot(union), unrot(inter)


def dist_sharded(
    index_a: SketchIndex,
    mesh: Mesh,
    axis: str = DB_AXIS,
    index_b: Optional[SketchIndex] = None,
) -> Dict[str, np.ndarray]:
    """All-vs-all exact counts for an index, sharded over ``mesh``.

    Self-comparison when index_b is None (the pod-scale acceptance config,
    BASELINE.json config 5).  Returns {"shared": int32[N, N],
    "union": int32[N, N], "inter": int32[N, N]} for the UNPADDED N,
    bit-identical to the single-device engine.dist counts (inter = full
    |S(A) ∩ S(B)|, the containment numerator).
    """
    D = mesh.shape[axis]

    def pad_to(hi, lo):
        n = hi.shape[0]
        n_pad = -(-max(n, 1) // D) * D
        if n_pad != n:
            pad = np.full((n_pad - n, hi.shape[1]), 0xFFFFFFFF, np.uint32)
            hi = np.concatenate([hi, pad])
            lo = np.concatenate([lo, pad])
        return hi, lo

    if index_a.params.compact:
        # single-plane ring: rotate only the code plane (half the
        # ppermute bytes), count with the 32-bit kernels
        idx_b = index_a if index_b is None else index_b
        if index_b is not None:
            index_a.params.validate_compatible(index_b.params)
        n_a, n_b = len(index_a), len(idx_b)
        a, _ = pad_to(index_a.hi, index_a.lo)
        b = a if index_b is None else pad_to(index_b.hi, index_b.lo)[0]
        shared, union, inter = ring_rect_counts32(
            jnp.asarray(a), jnp.asarray(b), s=index_a.params.s, mesh=mesh,
            axis=axis, impl=_intersect._intersect_impl_traced(),
        )
        sl = np.s_[:n_a, :n_b]
        return {"shared": np.asarray(shared)[sl],
                "union": np.asarray(union)[sl],
                "inter": np.asarray(inter)[sl]}

    if index_b is not None:
        # Rectangular ring: A row-sharded and resident, B's blocks rotate —
        # n_a × n_b tile work (the old path embedded A-vs-B in an (A+B)²
        # square, wasting ~2x compute; VERDICT r1 weak #4).
        index_a.params.validate_compatible(index_b.params)
        n_a, n_b = len(index_a), len(index_b)
        a_hi, a_lo = pad_to(index_a.hi, index_a.lo)
        b_hi, b_lo = pad_to(index_b.hi, index_b.lo)
        shared, union, inter = ring_rect_counts(
            jnp.asarray(a_hi), jnp.asarray(a_lo),
            jnp.asarray(b_hi), jnp.asarray(b_lo),
            s=index_a.params.s, mesh=mesh, axis=axis,
            impl=_intersect._intersect_impl_traced(),
        )
        sl = np.s_[:n_a, :n_b]
        return {"shared": np.asarray(shared)[sl],
                "union": np.asarray(union)[sl],
                "inter": np.asarray(inter)[sl]}

    n_a = len(index_a)
    hi, lo = pad_to(index_a.hi, index_a.lo)
    shared, union, inter = ring_all_vs_all_counts(
        jnp.asarray(hi), jnp.asarray(lo), s=index_a.params.s, mesh=mesh,
        axis=axis, impl=_intersect._intersect_impl_traced()
    )
    sl = np.s_[:n_a, :n_a]
    return {"shared": np.asarray(shared)[sl],
            "union": np.asarray(union)[sl],
            "inter": np.asarray(inter)[sl]}
