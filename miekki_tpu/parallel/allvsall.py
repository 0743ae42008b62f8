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


def _ring_counts_local(rows_hi, rows_lo, *, s: int, axis: str, impl=None):
    """Per-device body (inside shard_map): rows [Nl, s] → counts [D, Nl, Nl]."""
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

    _, (shared, union, inter) = lax.scan(step, (rows_hi, rows_lo), None,
                                         length=D)
    return shared, union, inter  # each [D, Nl, Nl]


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
    # shared/union: [D, N, Nl]; at step t, global rows d*nl:(d+1)*nl hold the
    # intersection vs the block originally owned by device (d - t) mod D.
    # Un-rotate into [N, N] with ONE advanced-index scatter (a python loop
    # over (t, d) would emit D² scatter ops — trace bloat at pod scale).
    t_ids = jnp.arange(D)[:, None]
    d_ids = jnp.broadcast_to(jnp.arange(D)[None, :], (D, D))
    origin = (d_ids - t_ids) % D

    def unrotate(x):
        x = x.reshape(D, D, nl, nl)  # [t, d, row_in_block, col_in_block]
        out = jnp.zeros((D, nl, D, nl), x.dtype)
        # advanced indices separated by a slice put the [D, D] index-broadcast
        # dims first: vals[t, d] lands at out[d_ids[t,d], :, origin[t,d], :]
        out = out.at[d_ids, :, origin, :].set(x)
        return out.reshape(n, n)

    return unrotate(shared), unrotate(union), unrotate(inter)


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
    if index_b is not None:
        index_a.params.validate_compatible(index_b.params)
        # Rectangular case: pad both into one square table (rows then cols).
        hi = np.concatenate([index_a.hi, index_b.hi])
        lo = np.concatenate([index_a.lo, index_b.lo])
        n_a, n_b = len(index_a), len(index_b)
    else:
        hi, lo, n_a, n_b = index_a.hi, index_a.lo, len(index_a), len(index_a)

    D = mesh.shape[axis]
    n = hi.shape[0]
    n_pad = -(-max(n, 1) // D) * D
    if n_pad != n:
        pad = np.full((n_pad - n, hi.shape[1]), 0xFFFFFFFF, dtype=np.uint32)
        hi = np.concatenate([hi, pad])
        lo = np.concatenate([lo, pad])

    shared, union, inter = ring_all_vs_all_counts(
        jnp.asarray(hi), jnp.asarray(lo), s=index_a.params.s, mesh=mesh,
        axis=axis, impl=_intersect._intersect_impl()
    )
    shared = np.asarray(shared)
    union = np.asarray(union)
    inter = np.asarray(inter)
    if index_b is not None:
        sl = np.s_[:n_a, n_a : n_a + n_b]
        return {"shared": shared[sl], "union": union[sl], "inter": inter[sl]}
    sl = np.s_[:n_a, :n_a]
    return {"shared": shared[sl], "union": union[sl], "inter": inter[sl]}
