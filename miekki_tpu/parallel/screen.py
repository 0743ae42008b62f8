"""Data-parallel read screening with collective merge (SURVEY.md §3.3, M5).

Read batches are sharded along the ``data`` mesh axis; the sketch DB is
replicated (it is small relative to the read stream: N·s·8 bytes).  Each
device hashes its shard of the packed read stream, membership-tests the
stream's hash set against every genome sketch, and the per-(genome, slot)
hit bitmaps are OR-merged across devices with `lax.pmax` — the collective
merge of partial containment counts mandated by BASELINE.json's north_star
(psum/all-gather family; OR==max is the right monoid here because hit
*slots*, not counts, must be merged to avoid double-counting a sketch hash
seen by two devices).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine import DEFAULT_READ_FLAT, _packed_read_batches
from ..index.store import SketchIndex
from ..ops import hash as _hash
from ..ops import intersect as _intersect
from ..ops import u64
from ..oracle import compare as _oracle_compare
from .mesh import DATA_AXIS

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _screen_step_local(acc, db_hi, db_lo, batch, *, k: int, axis: str):
    """Per-device body: OR into acc the DB slots present in this batch shard.

    acc, db planes: [N, s] (replicated); batch: [1, F + k - 1] (this
    device's shard of the [D, F + k - 1] batch group).
    """
    h, _ = _hash.hash_windows(batch[0], k)
    hay = u64.sort(h)  # INF-masked invalid windows sort to the end
    hit = jax.vmap(
        lambda r0, r1: _intersect.member_u64((hay[0], hay[1]), (r0, r1))
    )(db_hi, db_lo)
    merged = lax.pmax(hit.astype(jnp.int32), axis) > 0
    return acc | merged


@partial(jax.jit, static_argnames=("k", "mesh", "axis"), donate_argnums=(0,))
def screen_step_sharded(acc, db_hi, db_lo, batches, *, k: int, mesh: Mesh,
                        axis: str = DATA_AXIS):
    """One sharded screening step over a [D, F + k - 1] group of packed
    read batches.  acc: bool[N, s] replicated; returns the updated acc."""
    rep2 = P(None, None)
    return shard_map(
        partial(_screen_step_local, k=k, axis=axis),
        mesh=mesh,
        in_specs=(rep2, rep2, rep2, P(axis, None)),
        out_specs=rep2,
        check_vma=False,
    )(acc, db_hi, db_lo, batches)


def _batch_groups(path, k: int, flat: int, group: int) -> Iterator[np.ndarray]:
    """Group packed read batches into [group, flat + k - 1] arrays, padding
    the tail group with all-invalid batches (they hash to zero valid windows)."""
    buf: List[np.ndarray] = []
    for b in _packed_read_batches(path, k, flat):
        buf.append(b)
        if len(buf) == group:
            yield np.stack(buf)
            buf = []
    if buf:
        pad = np.full_like(buf[0], _hash.INVALID_CODE)
        while len(buf) < group:
            buf.append(pad)
        yield np.stack(buf)


def screen_sharded(
    index: SketchIndex,
    reads_path,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    flat: int = DEFAULT_READ_FLAT,
) -> List[dict]:
    """Distributed analog of engine.screen — identical rows, reads streamed
    data-parallel across the mesh (BASELINE.json config 4 at host scale)."""
    k, s = index.params.k, index.params.s
    D = mesh.shape[axis]
    db_hi, db_lo = jnp.asarray(index.hi), jnp.asarray(index.lo)
    acc = jnp.zeros((len(index), s), dtype=jnp.bool_)
    for group in _batch_groups(reads_path, k, flat, D):
        acc = screen_step_sharded(
            acc, db_hi, db_lo, jnp.asarray(group), k=k, mesh=mesh,
            axis=axis,
        )
    hits = np.asarray(jnp.sum(acc, axis=-1))
    sizes = index.sizes()
    out = []
    for g in range(len(index)):
        c = float(hits[g]) / float(sizes[g]) if sizes[g] > 0 else 0.0
        out.append({
            "reference": index.names[g],
            "hits": int(hits[g]),
            "sketch_size": int(sizes[g]),
            "containment": c,
            "ani": _oracle_compare.ani_from_containment(c, k),
        })
    return out
