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


# ------------------------------------------------------------------ mxu ring
# VERDICT r3 #2: the MXU stream-pass counter (1.6-1.7x the pallas kernel at
# tile >= 512 on the real chip) could not run inside the traced ring because
# its ambiguity resolution host-syncs.  The traced body below returns the
# (lb, ub, inter) BRACKETS as ring outputs instead; the few pairs with
# lb != ub are resolved host-side after un-rotation with the same batched
# machinery the host-orchestrated path uses (mxu_intersect.resolve_pairs_host)
# — bit-identical to the pallas ring by the r3-proven bracket invariants.

_MXU_RING_TILE = 512  # sub-tile edge; the measured mxu-vs-pallas crossover


def _ring_counts_rect_mxu_local(rows_hi, rows_lo, cols_hi, cols_lo, *,
                                s: int, axis: str, tile: int):
    """MXU ring body (inside shard_map): resident row block [Na_l, sp] vs a
    rotating column block → (lb, ub, inter) each [D, Na_l, Nb_l].

    The blocks are cut into `tile`-row sub-blocks whose pre-sorted value
    streams are built ONCE; the ring then rotates the 3-plane STREAMS
    (hi, lo, payload) rather than the raw sketch planes — 1.5x the
    ppermute bytes of the 2-plane rotation, but no per-step re-sort of the
    arriving block (the per-step cost is only the per-sub-tile merge the
    host-orchestrated path pays too)."""
    from ..ops import mxu_intersect as _mxu

    D = lax.axis_size(axis)
    na, sp = rows_hi.shape
    nb = cols_hi.shape[0]
    na_p = -(-na // tile) * tile
    nb_p = -(-nb // tile) * tile

    def pad_rows(x):
        return jnp.pad(x, ((0, na_p - na), (0, 0)),
                       constant_values=np.uint32(0xFFFFFFFF))

    def pad_cols(x):
        return jnp.pad(x, ((0, nb_p - nb), (0, 0)),
                       constant_values=np.uint32(0xFFFFFFFF))

    n_i = na_p // tile
    n_j = nb_p // tile
    rsh, rsl, rsp = jax.vmap(
        lambda h, l: _mxu.sketch_stream((h, l), False)
    )(pad_rows(rows_hi).reshape(n_i, tile, sp),
      pad_rows(rows_lo).reshape(n_i, tile, sp))
    col0 = jax.vmap(
        lambda h, l: _mxu.sketch_stream((h, l), True)
    )(pad_cols(cols_hi).reshape(n_j, tile, sp),
      pad_cols(cols_lo).reshape(n_j, tile, sp))

    perm = [(i, (i + 1) % D) for i in range(D)]
    ii = jnp.repeat(jnp.arange(n_i), n_j)
    jj = jnp.tile(jnp.arange(n_j), n_i)

    def step(carry, _):
        csh, csl, csp = carry

        def one(idx):
            i, j = idx
            out = _mxu._tile_counts_mxu_full(
                (rsh[i], rsl[i], rsp[i]), (csh[j], csl[j], csp[j]),
                tile, tile, s, 2 * tile)
            return (out["shared_lb"], out["shared_ub"], out["inter_full"])

        lb, ub, it = lax.map(one, (ii, jj))

        def to_mat(x):
            x = x.reshape(n_i, n_j, tile, tile).transpose(0, 2, 1, 3)
            return x.reshape(na_p, nb_p)[:na, :nb]

        csh = lax.ppermute(csh, axis, perm)
        csl = lax.ppermute(csl, axis, perm)
        csp = lax.ppermute(csp, axis, perm)
        return (csh, csl, csp), (to_mat(lb), to_mat(ub), to_mat(it))

    _, (lb, ub, inter) = lax.scan(step, col0, None, length=D)
    return lb, ub, inter


@partial(jax.jit, static_argnames=("s", "mesh", "axis", "tile"))
def ring_rect_counts_mxu(
    a_hi: jax.Array, a_lo: jax.Array, b_hi: jax.Array, b_lo: jax.Array,
    *, s: int, mesh: Mesh, axis: str = DB_AXIS, tile: int = _MXU_RING_TILE
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sharded rectangular counts through the traced MXU stream pass (pass
    a == b for self-comparison).  Returns (shared_lb, shared_ub, inter)
    int32 [N_a, N_b] in GLOBAL order; the caller must resolve lb != ub
    pairs (mxu_intersect.resolve_pairs_host) — dist_sharded does."""
    D = mesh.shape[axis]
    n_a, n_b = a_hi.shape[0], b_hi.shape[0]
    if n_a % D or n_b % D:
        raise ValueError(f"N_a={n_a}/N_b={n_b} not divisible by {axis}={D}")
    spec_db = P(axis, None)
    lb, ub, inter = shard_map(
        partial(_ring_counts_rect_mxu_local, s=s, axis=axis, tile=tile),
        mesh=mesh,
        in_specs=(spec_db,) * 4,
        out_specs=(P(None, axis, None),) * 3,
        check_vma=False,
    )(a_hi, a_lo, b_hi, b_lo)
    unrot = partial(_unrotate, D=D, nl_rows=n_a // D, nl_cols=n_b // D)
    return unrot(lb), unrot(ub), unrot(inter)


def _dist_sharded_mxu(
    index_a: SketchIndex, mesh: Mesh, axis: str,
    index_b: Optional[SketchIndex], pad_to, tile: int,
    force_traced: bool = False,
) -> Dict[str, np.ndarray]:
    """dist_sharded through the MXU ring + host ambiguity epilogue.

    Measured platform reality (r4, real chip, 2048×2048 s=10k tile 512):
    the host-orchestrated mxu dispatch loop runs 1.26M pairs/s; the fully
    traced mxu ring runs 39k (XLA handles the giant nested-scan program
    badly — a 16-pass lax.map variant would not even remote-compile, HTTP
    413 body-size limit) vs the traced pallas ring's 287k.  So a 1-device
    mesh routes to the host-orchestrated bulk path (identical outputs; a
    D=1 ring is degenerate anyway), and the traced mxu ring remains the
    multi-device path — it is the collective DESIGN for pods (tested
    bitwise on the CPU mesh), but un-benchmarkable on real multi-chip
    hardware from this machine."""
    from ..ops import mxu_intersect as _mxu

    if mesh.shape[axis] == 1 and not force_traced:
        from .. import engine as _engine

        counts = _engine.dist_counts_matrix(index_a, index_b, tile=tile)
        if index_b is None:
            # dist_counts_matrix guarantees the upper triangle + diagonal;
            # dist_sharded's contract is the full symmetric matrix.
            for key in ("shared", "union", "inter"):
                m = counts[key]
                counts[key] = np.triu(m) + np.triu(m, 1).T
        return counts

    idx_b = index_a if index_b is None else index_b
    if index_b is not None:
        index_a.params.validate_compatible(index_b.params)
    s = index_a.params.s
    n_a, n_b = len(index_a), len(idx_b)

    # In-memory compact indexes already carry the derived lo plane (0 for
    # values, INF for sentinels — store.to_compact), so the u64 machinery
    # applies unchanged: values are code << 32 on both paths.
    a_hi_np, a_lo_np = index_a.hi, index_a.lo
    a_hi, a_lo = pad_to(a_hi_np, a_lo_np)
    if index_b is None:
        b_hi, b_lo = a_hi, a_lo
        b_hi_np, b_lo_np = a_hi_np, a_lo_np
    else:
        b_hi_np, b_lo_np = index_b.hi, index_b.lo
        b_hi, b_lo = pad_to(b_hi_np, b_lo_np)
    lb, ub, inter = ring_rect_counts_mxu(
        jnp.asarray(a_hi), jnp.asarray(a_lo),
        jnp.asarray(b_hi), jnp.asarray(b_lo),
        s=s, mesh=mesh, axis=axis, tile=tile)
    sl = np.s_[:n_a, :n_b]
    lb = np.asarray(lb)[sl]
    ub = np.asarray(ub)[sl]
    inter = np.asarray(inter)[sl]
    shared = lb.copy()
    amb_i, amb_j = np.nonzero(lb != ub)
    if amb_i.size:
        shared[amb_i, amb_j] = _mxu.resolve_pairs_host(
            (a_hi_np, a_lo_np), (b_hi_np, b_lo_np), amb_i, amb_j, s)
    # union from host-side sketch sizes: same formula as pair_counts
    # (min(n_a + n_b - inter, s)); sizes count non-sentinel slots.
    sz_a = index_a.sizes().astype(np.int32)
    sz_b = sz_a if index_b is None else idx_b.sizes().astype(np.int32)
    union = np.minimum(sz_a[:, None] + sz_b[None, :] - inter, s).astype(
        np.int32)
    return {"shared": shared, "union": union, "inter": inter}


def _hostring_side_blocks(idx: SketchIndex, devices, nl: int, compact: bool):
    """Pad a side's planes to D*nl rows and place block d on devices[d].

    Builder-attached device planes avoid the host upload for the initial
    placement (device→device copies are DMA; host→device rides the
    ~25 MB/s tunnel).  Returns per-device planes: (hi, lo) pairs, or a
    single code plane for compact indexes."""
    import jax
    import jax.numpy as _jnp

    D = len(devices)
    n = len(idx)
    n_pad = D * nl
    dev = getattr(idx, "device_planes", None)
    if dev is not None and not compact:
        hi_src, lo_src = dev
        if n_pad != n:
            padv = _jnp.full((n_pad - n, hi_src.shape[1]),
                             np.uint32(0xFFFFFFFF), _jnp.uint32)
            hi_src = _jnp.concatenate([hi_src, padv])
            lo_src = _jnp.concatenate([lo_src, padv])
    else:
        hi_src, lo_src = idx.hi, idx.lo
        if n_pad != n:
            pad = np.full((n_pad - n, hi_src.shape[1]), 0xFFFFFFFF,
                          np.uint32)
            hi_src = np.concatenate([hi_src, pad])
            lo_src = np.concatenate([lo_src, pad])
    out = []
    for d in range(D):
        sl = np.s_[d * nl:(d + 1) * nl]
        if compact:
            out.append(jax.device_put(hi_src[sl], devices[d]))
        else:
            out.append((jax.device_put(hi_src[sl], devices[d]),
                        jax.device_put(lo_src[sl], devices[d])))
    return out


def dist_sharded_hostring(
    index_a: SketchIndex,
    devices=None,
    mxu_tile: int = _MXU_RING_TILE,
    index_b: Optional[SketchIndex] = None,
    checkpoint: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Host-orchestrated multi-device ring comparison — the production
    single-process multi-device path (r5; dist_sharded routes here).

    The third point in the design space measured in r4
    (`artifacts/mxu_ring_bench.json`): the fully-TRACED mxu ring keeps
    the collective inside one XLA program but compiles 7x slower code on
    this platform; the host-orchestrated BULK path has the fast dispatch
    granularity but is single-device.  This path combines them: every
    device owns an A row block whose sub-block streams are sorted once ON
    that device; each ring step runs the small cached-compile mxu tile
    dispatches device-parallel (jax dispatch is async per device), while
    the column-role STREAMS rotate to the next device with explicit
    `jax.device_put` device-to-device copies (DMA over ICI on real
    hardware — the ring pattern, outside any traced program).  Ambiguity
    resolution is deferred across ALL steps and resolved once on the
    host table (native two-pointer).  Bit-identical to the traced rings
    (tested on the 8-device CPU mesh).

    Self-comparison when index_b is None (full symmetric [N, N]);
    rectangular A-vs-B otherwise ([N_a, N_b] — B's blocks rotate through
    A's owners, n_a x n_b tile work).  Compact indexes run the
    single-plane stream pass: half the rotation bytes and half the merge
    ops (ops/mxu_intersect.py *32 entry points).

    On a real pod this maps to per-host orchestration of its local
    chips; cross-host rotation rides the traced collective ring instead
    (dist_sharded routes multi-process meshes there).

    checkpoint: optional directory — after each ring step the running
    count matrices + deferred-ambiguity lists are saved atomically
    (hostring_step{t}.npz); a rerun resumes from the last complete step
    by replaying only the (cheap) column rotations.  This is what makes
    full-scale CPU-mesh validation runs interruptible (VERDICT r4 #9).
    """
    import jax

    from ..ops import mxu_intersect as _mxu

    if devices is None:
        devices = jax.devices()
    D = len(devices)
    self_compare = index_b is None
    idx_b = index_a if self_compare else index_b
    if index_b is not None:
        index_a.params.validate_compatible(index_b.params)
    compact = index_a.params.compact
    s = index_a.params.s
    n_a, n_b = len(index_a), len(idx_b)
    tile = min(mxu_tile, max(1, n_a, n_b))

    def side_geometry(n):
        per_dev = -(-max(n, 1) // D)
        n_sub = max(1, -(-per_dev // tile))
        return n_sub, n_sub * tile

    n_sub_a, nl_a = side_geometry(n_a)
    n_sub_b, nl_b = (n_sub_a, nl_a) if self_compare else side_geometry(n_b)

    def sub(planes, i):
        sl = np.s_[i * tile:(i + 1) * tile]
        return planes[sl] if compact else (planes[0][sl], planes[1][sl])

    def row_stream(planes_sub):
        return (_mxu.sketch_stream32(planes_sub, False) if compact
                else _mxu.sketch_stream(planes_sub, False))

    def start(rp, cp, rs, cs):
        if compact:
            return _mxu.tile_counts_mxu_start32(
                rp, cp, s, row_stream=rs, col_stream=cs, slim=True)
        return _mxu.tile_counts_mxu_start(
            rp, cp, s, row_stream=rs, col_stream=cs, slim=True)

    # A row blocks: planes + per-sub-block row streams, computed on the
    # owning device (committed inputs pin the dispatch there).
    row_planes = _hostring_side_blocks(index_a, devices, nl_a, compact)
    row_streams = [[row_stream(sub(rp, i)) for i in range(n_sub_a)]
                   for rp in row_planes]

    # Rotating column state (B side): planes, col-role streams, origin.
    if self_compare:
        col_planes = list(row_planes)
        tag = _mxu.stream_with_col_tag32 if compact \
            else _mxu.stream_with_col_tag
        # derive col streams from the already-sorted row streams (payload
        # retag only — no second sort)
        col_streams = [[tag(st) for st in subs] for subs in row_streams]
    else:
        col_planes = _hostring_side_blocks(idx_b, devices, nl_b, compact)
        col_streams = [
            [(_mxu.sketch_stream32(sub(cp, j), True) if compact
              else _mxu.sketch_stream(sub(cp, j), True))
             for j in range(n_sub_b)]
            for cp in col_planes]
    col_origin = list(range(D))

    shared = np.zeros((D * nl_a, D * nl_b), np.int32)
    inter = np.zeros((D * nl_a, D * nl_b), np.int32)
    amb_i_all: list = []
    amb_j_all: list = []

    start_t = 0
    if checkpoint:
        import os as _os2

        _os2.makedirs(checkpoint, exist_ok=True)
        for t in range(D - 1, -1, -1):
            p = _os2.path.join(checkpoint, f"hostring_step{t}.npz")
            if _os2.path.exists(p):
                with np.load(p) as z:
                    shared[:] = z["shared"]
                    inter[:] = z["inter"]
                    if z["amb_i"].size:
                        amb_i_all.append(z["amb_i"])
                        amb_j_all.append(z["amb_j"])
                start_t = t + 1
                break

    # In-flight window: each pending handle retains its sliced plane
    # blocks (~4 x tile x sp bytes) until pulled, so dispatching a whole
    # step's n_sub² x D tiles before pulling any held GIGABYTES of live
    # buffers at config-5 scale (observed: 26 GB RSS + allocator churn on
    # the CPU backend, ~3x slower per tile than the small-n probe).  A
    # bounded window keeps D tiles per device in flight — enough to
    # saturate every device queue, memory O(window).
    import os as _os4

    window = max(2 * D, int(_os4.environ.get("MIEKKI_HOSTRING_WINDOW",
                                             str(8 * D))))
    from collections import deque

    pend: deque = deque()

    def pull_one():
        d, o, i, j, h = pend.popleft()
        res, ai, aj = _mxu.tile_counts_mxu_finish_deferred(h)
        r0 = d * nl_a + i * tile
        c0 = o * nl_b + j * tile
        shared[r0:r0 + tile, c0:c0 + tile] = res["shared_in_x"]
        inter[r0:r0 + tile, c0:c0 + tile] = res["inter_full"]
        if ai.size:
            gi = r0 + ai
            gj = c0 + aj
            keep = (gi < n_a) & (gj < n_b)
            amb_i_all.append(gi[keep])
            amb_j_all.append(gj[keep])

    for t in range(D):
        if t < start_t:
            # resume: replay only the column rotation (cheap device
            # copies) so step start_t sees the right block placement
            if t + 1 < D:
                col_planes = [jax.device_put(col_planes[(d - 1) % D],
                                             devices[d]) for d in range(D)]
                col_streams = [jax.device_put(col_streams[(d - 1) % D],
                                              devices[d]) for d in range(D)]
                col_origin = [col_origin[(d - 1) % D] for d in range(D)]
            continue
        # interleave devices (d innermost) so every device's queue fills
        # early, then keep the window topped up
        cur_cols = col_planes
        cur_streams = col_streams
        cur_origin = col_origin
        for i in range(n_sub_a):
            for j in range(n_sub_b):
                for d in range(D):
                    h = start(sub(row_planes[d], i), sub(cur_cols[d], j),
                              row_streams[d][i], cur_streams[d][j])
                    pend.append((d, cur_origin[d], i, j, h))
                    while len(pend) > window:
                        pull_one()
        if t + 1 < D:
            # Rotate the column state for step t+1 NOW (async device-to-
            # device copies overlap the window drain below).
            col_planes = [jax.device_put(col_planes[(d - 1) % D],
                                         devices[d]) for d in range(D)]
            col_streams = [jax.device_put(col_streams[(d - 1) % D],
                                          devices[d]) for d in range(D)]
            col_origin = [col_origin[(d - 1) % D] for d in range(D)]
        while pend:
            pull_one()
        if checkpoint:
            import os as _os3

            p = _os3.path.join(checkpoint, f"hostring_step{t}.npz")
            tmp = p + ".tmp.npz"
            np.savez(
                tmp, shared=shared, inter=inter,
                amb_i=(np.concatenate(amb_i_all) if amb_i_all
                       else np.zeros(0, np.int64)),
                amb_j=(np.concatenate(amb_j_all) if amb_j_all
                       else np.zeros(0, np.int64)))
            _os3.replace(tmp, p)

    shared = shared[:n_a, :n_b]
    inter = inter[:n_a, :n_b]
    if amb_i_all:
        ai = np.concatenate(amb_i_all)
        aj = np.concatenate(amb_j_all)
        # in-memory compact indexes already carry the derived lo plane, so
        # the u64 resolve applies unchanged (values are code << 32 | lo)
        shared[ai, aj] = _mxu.resolve_pairs_host(
            (index_a.hi, index_a.lo), (idx_b.hi, idx_b.lo), ai, aj, s)
    sz_a = index_a.sizes().astype(np.int64)
    sz_b = sz_a if self_compare else idx_b.sizes().astype(np.int64)
    union = np.minimum(sz_a[:, None] + sz_b[None, :] - inter,
                       s).astype(np.int32)
    return {"shared": shared, "union": union, "inter": inter}


def dist_sharded(
    index_a: SketchIndex,
    mesh: Mesh,
    axis: str = DB_AXIS,
    index_b: Optional[SketchIndex] = None,
    mxu_tile: Optional[int] = None,
    _traced_mxu: bool = False,
) -> Dict[str, np.ndarray]:
    """All-vs-all exact counts for an index, sharded over ``mesh``.

    Self-comparison when index_b is None (the pod-scale acceptance config,
    BASELINE.json config 5).  Returns {"shared": int32[N, N],
    "union": int32[N, N], "inter": int32[N, N]} for the UNPADDED N,
    bit-identical to the single-device engine.dist counts (inter = full
    |S(A) ∩ S(B)|, the containment numerator).

    Kernel choice: MIEKKI_INTERSECT env (auto on TPU → the traced MXU
    stream-pass ring, 1.6-1.7x the pallas kernel at tile >= 512; the
    lb != ub pairs resolve host-side after un-rotation — VERDICT r3 #2).
    `mxu_tile` overrides the mxu sub-tile edge (tests use small tiles).
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

    # mxu routing: on a 1-device mesh (auto on TPU) the host-orchestrated
    # bulk path runs; the traced mxu ring itself is OPT-IN (explicit
    # MIEKKI_INTERSECT=mxu) for D > 1 — on this platform's XLA the giant
    # traced program measured 7x slower than the pallas ring (see
    # _dist_sharded_mxu), so auto keeps the pallas ring for real meshes.
    import os as _os

    impl_env = _os.environ.get("MIEKKI_INTERSECT", "auto").lower()
    want_mxu = (_traced_mxu or impl_env == "mxu"
                or (mesh.shape[axis] == 1
                    and _intersect._intersect_impl(tile=_MXU_RING_TILE)
                    == "mxu"))
    if want_mxu:
        # _traced_mxu=True forces the fully-TRACED mxu ring even on a
        # 1-device mesh (bypassing the host-orchestrated bulk routing) —
        # a benchmark/validation hook so the traced ring's honest number
        # is measurable under its own name (VERDICT r4 weak #2).
        return _dist_sharded_mxu(index_a, mesh, axis, index_b, pad_to,
                                 mxu_tile or _MXU_RING_TILE,
                                 force_traced=_traced_mxu)

    # r5 production routing (VERDICT r4 #5): single-process 1-axis meshes
    # with D > 1 run the HOST-ORCHESTRATED device ring — explicit
    # device_put rotation + small cached-compile mxu dispatches, measured
    # 4.5x the traced pallas ring on the same workload
    # (artifacts/mxu_ring_bench.json) — with ONE deferred native ambiguity
    # resolve.  Multi-process meshes keep the traced collective rings (the
    # host cannot device_put across processes); an explicit
    # MIEKKI_INTERSECT=pallas|bitonic|searchsorted keeps the traced ring
    # for comparison, and MIEKKI_INTERSECT=mxu (above) the traced mxu ring.
    if (impl_env == "auto" and mesh.shape[axis] > 1
            and len(mesh.shape) == 1 and jax.process_count() == 1):
        return dist_sharded_hostring(index_a, list(mesh.devices.flat),
                                     mxu_tile or _MXU_RING_TILE,
                                     index_b=index_b)

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
