"""Data-parallel read screening with collective merge (SURVEY.md §3.3, M5).

Read batches are sharded along the ``data`` mesh axis; the value-sorted flat
DB (see engine's screening design: threshold prefilter + compacted
searchsorted join) is replicated.  Each device screens its shard of the
packed read stream into a flat hit bitmap, and the bitmaps are OR-merged
across devices with `lax.pmax` — the collective merge of partial
containment state mandated by BASELINE.json's north_star (OR==max is the
right monoid: hit *slots*, not counts, must merge so a sketch hash seen by
two devices isn't double-counted).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine import (
    DEFAULT_READ_FLAT,
    _KMV_S0,
    _as_path_list,
    _flatten_db,
    _kmv_estimate,
    _kmv_init,
    _kmv_update,
    _packed_read_batches,
    _screen_chunk,
    _screen_join,
    _screen_rows,
    _screen_update_impl,
)
from ..index.store import SketchIndex
from ..ops import hash as _hash
from .mesh import DATA_AXIS

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _screen_step_local(acc, db_hi, db_lo, thr_hi, thr_lo, batch, *, k: int,
                       axis: str, compact: bool = False, chunk: int = None,
                       join: str = "merge"):
    """Per-device body: screen this device's batch shard, then OR-merge the
    bitmaps across the mesh axis.  batch: [1, F + k - 1] shard.  Also
    returns psum'd (n_windows, n_survivors) prefilter counters."""
    upd, n_valid, n_keep = _screen_update_impl(acc, db_hi, db_lo, thr_hi[0],
                                               thr_lo[0], batch[0], k,
                                               compact, chunk, join)
    merged = lax.pmax(upd.astype(jnp.int32), axis) > 0
    return (merged, lax.psum(n_valid, axis)[None],
            lax.psum(n_keep, axis)[None])


@partial(jax.jit, static_argnames=("k", "mesh", "axis", "compact", "chunk",
                                   "join"),
         donate_argnums=(0,))
def screen_step_sharded(acc, db_hi, db_lo, thr_hi, thr_lo, batches, *,
                        k: int, mesh: Mesh, axis: str = DATA_AXIS,
                        compact: bool = False, chunk: int = None,
                        join: str = "merge"):
    """One sharded screening step over a [D, F + k - 1] group of packed
    read batches.  acc: bool[M + 1] replicated; returns the updated acc."""
    rep = P(None)
    return shard_map(
        partial(_screen_step_local, k=k, axis=axis, compact=compact,
                chunk=chunk, join=join),
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, P(axis, None)),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )(acc, db_hi, db_lo, thr_hi, thr_lo, batches)


def _batch_groups(path, k: int, flat: int, group: int) -> Iterator[np.ndarray]:
    """Group packed read batches into [group, flat + k - 1] arrays, padding
    the tail group with all-invalid batches (they hash to zero valid windows).
    `path` may be one file or a list of files."""
    buf: List[np.ndarray] = []
    for p in _as_path_list(path):
        for b in _packed_read_batches(p, k, flat):
            buf.append(b)
            if len(buf) == group:
                yield np.stack(buf)
                buf = []
    if buf:
        pad = np.full_like(buf[0], _hash.INVALID_CODE)
        while len(buf) < group:
            buf.append(pad)
        yield np.stack(buf)


def _screen_step_local_dbshard(acc, db_hi, db_lo, thr_hi, thr_lo, batch, *,
                               k: int, axis: str, compact: bool = False,
                               chunk: int = None, join: str = "merge"):
    """Per-device body with a DB shard: [1, Ms+1] acc, [1, Ms] db planes,
    [1, F + k - 1] batch shard.  Survivors whose value lives in another
    shard simply find no match here; merging over the data axis only."""
    upd, n_valid, n_keep = _screen_update_impl(acc[0], db_hi[0], db_lo[0],
                                               thr_hi[0], thr_lo[0],
                                               batch[0], k, compact, chunk,
                                               join)
    return ((lax.pmax(upd.astype(jnp.int32), axis) > 0)[None],
            lax.psum(n_valid, axis)[None], lax.psum(n_keep, axis)[None])


@partial(jax.jit, static_argnames=("k", "mesh", "data_axis", "db_axis",
                                   "compact", "chunk", "join"),
         donate_argnums=(0,))
def screen_step_db_sharded(acc, db_hi, db_lo, thr_hi, thr_lo, batches, *,
                           k: int, mesh: Mesh, data_axis: str = DATA_AXIS,
                           db_axis: str = "db", compact: bool = False,
                           chunk: int = None, join: str = "merge"):
    """One screening step with BOTH axes sharded: the flat DB split into
    [D_db, Ms] shards (each value-sorted) and read batches [D_data, F+k-1]
    data-parallel.  Device (a, b) screens batch a against DB shard b; hit
    bitmaps merge with pmax over the data axis only (shards are disjoint).
    acc: bool[D_db, Ms + 1] (per-shard sink slot)."""
    rep = P(None)
    return shard_map(
        partial(_screen_step_local_dbshard, k=k, axis=data_axis,
                compact=compact, chunk=chunk, join=join),
        mesh=mesh,
        in_specs=(P(db_axis, None), P(db_axis, None), P(db_axis, None),
                  rep, rep, P(data_axis, None)),
        out_specs=(P(db_axis, None), P(db_axis), P(db_axis)),
        check_vma=False,
    )(acc, db_hi, db_lo, thr_hi, thr_lo, batches)


def screen_sharded(
    index: SketchIndex,
    reads_path,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    flat: int = DEFAULT_READ_FLAT,
    db_axis: str | None = None,
    winner: bool = False,
    stats: dict | None = None,
    p_values: bool = False,
) -> List[dict]:
    """Distributed analog of engine.screen — identical rows, reads streamed
    data-parallel across the mesh (BASELINE.json config 4 at host scale).

    With ``db_axis`` set (2-D mesh), the flat DB is additionally sharded
    along that axis so each device holds only M/D_db values — the pod-scale
    layout where the whole sketch DB exceeds one chip's HBM.  winner/stats/
    p_values as in engine.screen (the KMV state is a set union over the
    read stream — grouping-independent, so p-values are bitwise identical
    to the single-device rows)."""
    if db_axis is not None:
        return _screen_sharded_2d(index, reads_path, mesh, axis, db_axis,
                                  flat, winner, stats, p_values)
    k = index.params.k
    flat_vals, gid = _flatten_db(index)
    if len(flat_vals) == 0:
        return _screen_rows(index, np.zeros(len(index), np.int64))
    db_hi = jnp.asarray((flat_vals >> np.uint64(32)).astype(np.uint32))
    db_lo = jnp.asarray((flat_vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    thr = flat_vals[-1]
    thr_hi = jnp.full(1, int(thr >> np.uint64(32)), jnp.uint32)
    thr_lo = jnp.full(1, int(thr & np.uint64(0xFFFFFFFF)), jnp.uint32)
    d = mesh.shape[axis]
    acc = jnp.zeros(len(flat_vals) + 1, dtype=jnp.bool_)
    counters = []
    kmv = [_kmv_init()] if p_values else None
    for group in _batch_groups(reads_path, k, flat, d):
        dev_group = jnp.asarray(group)
        acc, nv, nk = screen_step_sharded(
            acc, db_hi, db_lo, thr_hi, thr_lo, dev_group,
            k=k, mesh=mesh, axis=axis, compact=index.params.compact,
            chunk=_screen_chunk(), join=_screen_join(),
        )
        if kmv is not None:
            kmv[0] = _kmv_update(*kmv[0], dev_group, k, _KMV_S0)
        counters.append((nv, nk))
    _fill_stats(stats, counters)
    hits = _pick_hits(winner, flat_vals, gid, np.asarray(acc), index)
    return _screen_rows(index, hits,
                        _kmv_estimate(kmv[0]) if kmv else None)


def _pick_hits(winner, flat_vals, gid, acc, index):
    from ..engine import _hits_from_bitmap, _hits_winner_takes_all

    if winner:
        return _hits_winner_takes_all(flat_vals, gid, acc, len(index),
                                      np.asarray(index.sizes()))
    return _hits_from_bitmap(flat_vals, gid, acc, len(index))


def _fill_stats(stats, counters):
    if stats is None:
        return
    tot_w = sum(int(np.asarray(v)[0]) for v, _ in counters)
    tot_s = sum(int(np.asarray(s_)[0]) for _, s_ in counters)
    stats.update(
        n_windows=tot_w, n_survivors=tot_s, n_batches=len(counters),
        survivor_rate=tot_s / tot_w if tot_w else 0.0,
    )


def _screen_sharded_2d(index, reads_path, mesh, data_axis, db_axis, flat,
                       winner=False, stats=None, p_values=False):
    import numpy as np

    k = index.params.k
    flat_vals, gid = _flatten_db(index)
    if len(flat_vals) == 0:
        return _screen_rows(index, np.zeros(len(index), np.int64))
    d_db = mesh.shape[db_axis]
    d_data = mesh.shape[data_axis]
    m = len(flat_vals)
    ms = -(-m // d_db)
    pad = d_db * ms - m
    INF = np.uint64(0xFFFFFFFFFFFFFFFF)
    padded = np.concatenate([flat_vals, np.full(pad, INF, np.uint64)])
    db_hi = jnp.asarray(
        (padded >> np.uint64(32)).astype(np.uint32).reshape(d_db, ms))
    db_lo = jnp.asarray(
        (padded & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(d_db, ms))
    thr = flat_vals[-1]
    thr_hi = jnp.full(1, int(thr >> np.uint64(32)), jnp.uint32)
    thr_lo = jnp.full(1, int(thr & np.uint64(0xFFFFFFFF)), jnp.uint32)
    acc = jnp.zeros((d_db, ms + 1), dtype=jnp.bool_)
    counters = []
    kmv = [_kmv_init()] if p_values else None
    for group in _batch_groups(reads_path, k, flat, d_data):
        dev_group = jnp.asarray(group)
        acc, nv, nk = screen_step_db_sharded(
            acc, db_hi, db_lo, thr_hi, thr_lo, dev_group,
            k=k, mesh=mesh, data_axis=data_axis, db_axis=db_axis,
            compact=index.params.compact, chunk=_screen_chunk(),
            join=_screen_join(),
        )
        if kmv is not None:
            kmv[0] = _kmv_update(*kmv[0], dev_group, k, _KMV_S0)
        counters.append((nv, nk))
    _fill_stats(stats, counters)
    # reassemble the global bitmap: drop per-shard sinks, trim padding
    acc_np = np.asarray(acc)[:, :-1].reshape(-1)[:m]
    hits = _pick_hits(winner, flat_vals, gid,
                      np.concatenate([acc_np, [False]]), index)
    return _screen_rows(index, hits,
                        _kmv_estimate(kmv[0]) if kmv else None)
