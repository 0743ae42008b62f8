"""High-level engine: sketch / dist / screen (layer L7, SURVEY.md §1).

Single-process orchestration of the device pipeline; the multi-host versions
of `dist` and `screen` live in miekki_tpu.parallel.  Float estimators are
computed on the host in float64 with the oracle's exact formulas
(miekki_tpu.oracle.compare), from exact integer counts produced on device —
distance tables are therefore bitwise-reproducible across backends
(SURVEY.md §4 integration rows).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .index.store import SketchIndex
from .io import encode as _encode
from .io import reader as _reader
from .oracle import compare as _oracle_compare
from .params import SketchParams
from .ops import hash as _hash
from .ops import intersect as _intersect
from .ops import sketch as _sketch
from .ops import u64

DEFAULT_CHUNK = 1 << 13  # row width (bases) for the sketch pipeline; rows are
# grouped into ~512K-base scan steps (ops.sketch.STEP_TARGET).  Narrow rows
# keep Pallas hash blocks inside VMEM; the k-1 overlap waste is <0.5%.
DEFAULT_TILE = 512       # genomes per side of an all-vs-all tile (bigger
# tiles amortize the ~200 ms fixed per-dispatch cost; results are
# tiling-independent.  Measured at s=10k on the chip: 69k pairs/s at 128,
# 230k at 256, 375k at 512 — the r1 "VPU roofline" attribution was this
# fixed cost, not lane ops)
DEFAULT_READ_FLAT = 1 << 22  # packed read bases per screening batch — large
# batches amortize per-dispatch overhead; the device-side cost is ~2 ms
# per Mbase (hash + partition + survivor join; see docs/DESIGN.md)

TSV_COLUMNS = (
    "query",
    "reference",
    "shared",
    "union",
    "jaccard",
    "mash_distance",
    "ani",
    "p_value",
)

# extra columns enabled by `dist --containment` (BinDash-style estimators:
# c_q = |S(q) ∩ S(r)| / |S(q)|, biased but standard for sketch-vs-sketch)
CONTAINMENT_COLUMNS = TSV_COLUMNS + (
    "containment_q",
    "containment_r",
    "ani_containment",
)

# extra columns enabled by `dist --bounds` (mash bounds analog: Wilson
# interval on the Jaccard, transformed to distance bounds)
BOUNDS_COLUMNS = TSV_COLUMNS + (
    "jaccard_lo",
    "jaccard_hi",
    "dist_lo",
    "dist_hi",
)


def add_bound_columns(rows: List[dict], k: int, conf: float = 0.95) -> List[dict]:
    for r in rows:
        r["jaccard_lo"], r["jaccard_hi"] = _oracle_compare.jaccard_ci(
            r["shared"], r["union"], conf
        )
        r["dist_lo"], r["dist_hi"] = _oracle_compare.distance_ci(
            r["shared"], r["union"], k, conf
        )
    return rows


# ---------------------------------------------------------------- sketching


def sketch_file(
    path, params: SketchParams, chunk: int = DEFAULT_CHUNK
) -> np.ndarray:
    """Sketch one genome file (all records pooled) → sorted uint64[<=s]."""
    records = _reader.read_genome_codes(path)
    packed = _encode.pack_records(records, params.k)
    if len(packed) < params.k:
        return np.zeros(0, dtype=np.uint64)
    return _sketch.sketch_codes_device(packed, params.k, params.s, chunk=chunk)


MAX_GENOME_BATCH = 16  # genomes vmapped per device call (power-of-2
# buckets).  r4 re-measured: G=256 adaptive batching is SLOWER (see
# _dispatches note in _build_index_from_codes).


def _sketch_batch(rows3d: np.ndarray, k: int, s: int) -> jax.Array:
    """vmap of sketch_chunked over a [G, n, W] stack of same-shape genomes,
    returned as ONE stacked [2, G, s] (hi, lo) array so the host pays a
    single device→host transfer per batch (the tunnel charges ~40 ms fixed
    per transfer — docs/DESIGN.md round-3 facts).

    Host codes are base-5 packed (3 codes/byte, io.encode.pack_base5) and
    unpacked on device — the host→device transfer is the sketch-ingest
    wall on this platform (~25 MB/s tunnel; PCIe hosts gain too), and the
    unpack is two u8 div/mods fused into the hash prologue (r5).

    Env strategy vars are resolved here, outside jit, so the cache is keyed
    on them (ADVICE r1)."""
    import os as _os

    cap0 = int(_os.environ.get("MIEKKI_TREE_CAP0", "0")) or _sketch.TREE_CAP0
    w = rows3d.shape[-1]
    packed = _encode.pack_base5(np.asarray(rows3d))
    return _sketch_batch_jit(
        jnp.asarray(packed), w, k, s, _sketch._env_merge_strategy(),
        _sketch._env_hash_impl(), _sketch._env_fused_levels(), cap0,
    )


@partial(jax.jit, static_argnames=("w", "k", "s", "strategy", "hash_impl",
                                   "fused_levels", "cap0"))
def _sketch_batch_jit(packed3d: jax.Array, w: int, k: int, s: int,
                      strategy: str, hash_impl: str, fused_levels: int,
                      cap0: int) -> jax.Array:
    rows3d = _unpack_base5(packed3d, w)
    hi, lo = jax.vmap(
        lambda r: _sketch._sketch_chunked(r, k, s, 0, strategy, hash_impl,
                                          fused_levels, cap0)
    )(rows3d)
    return jnp.stack([hi, lo])


def _unpack_base5(packed, w: int):
    """Device-side inverse of io.encode.pack_base5 along the last axis."""
    d0 = packed // 25
    r = packed % 25
    tri = jnp.stack([d0, r // 5, r % 5], axis=-1)
    return tri.reshape(packed.shape[:-1] + (-1,))[..., :w]


def build_index_per_record(
    paths: Sequence, params: SketchParams, chunk: int = DEFAULT_CHUNK,
    batch: int = MAX_GENOME_BATCH, min_copies: int = 1,
) -> SketchIndex:
    """Sketch every RECORD of the input files as its own entry (the
    `mash sketch -i` mode — one sketch per contig/sequence)."""
    names: List[str] = []
    codes_list: List[np.ndarray] = []
    for p in paths:
        for rec_name, codes in _reader.read_encoded(p):
            names.append(rec_name or f"{p}:{len(names)}")
            codes_list.append(codes)
    return _build_index_from_codes(codes_list, names, params, chunk, batch,
                                   min_copies)


def build_index(
    paths: Sequence, params: SketchParams, names: Optional[Sequence[str]] = None,
    chunk: int = DEFAULT_CHUNK, batch: int = MAX_GENOME_BATCH,
    min_copies: int = 1,
) -> SketchIndex:
    """Sketch many genome files into an index (one genome per file).

    Genomes whose bucketed chunk layout matches are sketched together in
    vmapped batches (power-of-two group sizes, INVALID-padded) — one device
    dispatch per batch instead of per genome.  batch=1 disables.
    """
    if names is None:
        names = [str(p) for p in paths]
    if len(paths) > 4:
        # parse files in a thread pool: the native parser (ctypes) and gzip
        # inflate release the GIL, so IO overlaps across files and with the
        # device dispatches that follow
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            codes_list = list(
                ex.map(
                    lambda p: _encode.pack_records(
                        _reader.read_genome_codes(p), params.k
                    ),
                    paths,
                )
            )
    else:
        codes_list = [
            _encode.pack_records(_reader.read_genome_codes(p), params.k)
            for p in paths
        ]
    return _build_index_from_codes(codes_list, list(names), params, chunk,
                                   batch, min_copies)


def _build_index_from_codes(
    codes_list: Sequence[np.ndarray], names: List[str], params: SketchParams,
    chunk: int, batch: int, min_copies: int = 1,
) -> SketchIndex:
    k, s = params.k, params.s
    if min_copies > 1:
        # abundance-filtered path (`mash sketch -m` analog): per-genome
        # counted sketcher; no vmap batching — the counted buffer retry
        # loop is data-dependent per input (ops/sketch_counted.py)
        from .ops import sketch_counted as _counted

        sketches = [
            np.zeros(0, dtype=np.uint64) if len(c) < k
            else _counted.sketch_codes_device_counted(
                c, k, s, min_copies, chunk=chunk)
            for c in codes_list
        ]
        return SketchIndex.from_sketches(sketches, names, params)
    if batch <= 1:
        sketches = [
            np.zeros(0, dtype=np.uint64) if len(c) < k
            else _sketch.sketch_codes_device(c, k, s, chunk=chunk)
            for c in codes_list
        ]
    else:
        rows_per_genome: List[Optional[np.ndarray]] = []
        for c in codes_list:
            rows_per_genome.append(
                None if len(c) < k
                else _sketch.bucketed_chunk_codes(c, k, chunk)
            )
        sketches = [np.zeros(0, dtype=np.uint64)] * len(codes_list)
        by_shape: dict = {}
        for i, rows in enumerate(rows_per_genome):
            if rows is not None:
                by_shape.setdefault(rows.shape, []).append(i)
        # Depth-1 pipelining (same pattern/env knob as dist_tiles): dispatch
        # batch t+1 — including its host packing and upload — before pulling
        # batch t, so the device sketches while the host pays the tunnel
        # transfer.  Each result is ONE stacked [2, G, s] array = one pull.
        from collections import deque

        depth = int(os.environ.get("MIEKKI_PIPELINE", "1"))

        def _dispatches():
            # NOTE (r4, measured): byte-budget-adaptive batches (G=256 for
            # tiny genomes to amortize the ~75-100 ms fixed dispatch cost)
            # made the 10,240-genome sketch phase SLOWER — 158-175 s vs
            # 83-122 s at batch=16, warm compile both — the G-wide vmapped
            # scan's per-step working set regression (same failure mode as
            # the r3 "bigger per-step slices regress" row) outweighs the
            # fixed-cost saving.  batch=16 stands.
            for shape, idxs in by_shape.items():
                for a in range(0, len(idxs), batch):
                    grp = idxs[a : a + batch]
                    g_pad = 1 << max(0, (len(grp) - 1).bit_length())
                    stack = np.full((g_pad,) + shape, _hash.INVALID_CODE,
                                    np.uint8)
                    for gi, i in enumerate(grp):
                        stack[gi] = rows_per_genome[i]
                    yield grp, _sketch_batch(stack, k, s)

        # Retain the device-side batch outputs when the whole table fits
        # comfortably in HBM: the rows ARE the final sketches (sorted,
        # INF-padded), so the compare phase can slice blocks on device
        # instead of re-uploading 40 MB/block through the ~20 MB/s tunnel
        # (measured: block re-upload was ~40% of the 10k all-vs-all wall).
        keep_dev = _keep_device_planes(len(codes_list), s)
        dev_batches: List = []

        def _finish(grp, handle):
            packed = np.asarray(handle)
            hi, lo = packed[0], packed[1]
            if keep_dev:
                dev_batches.append((list(grp), handle))
            for gi, i in enumerate(grp):
                vals = u64.join(hi[gi], lo[gi])
                sketches[i] = vals[vals != np.uint64(0xFFFFFFFFFFFFFFFF)]

        pending: deque = deque()
        for item in _dispatches():
            pending.append(item)
            while len(pending) > depth:
                _finish(*pending.popleft())
        while pending:
            _finish(*pending.popleft())
        idx = SketchIndex.from_sketches(sketches, names, params)
        if keep_dev and dev_batches:
            idx.device_planes = _assemble_device_planes(
                dev_batches, len(codes_list), s)
        return idx
    return SketchIndex.from_sketches(sketches, names, params)


def _keep_device_planes(n: int, s: int) -> bool:
    """Retain on-device sketch planes when the [N, s] u64 table stays under
    the unified planes budget (utils.hbm — the dist block cache sizes
    itself around whatever is retained here, so the combination is bounded
    by construction).  MIEKKI_KEEP_DEV=0|1 overrides."""
    env = os.environ.get("MIEKKI_KEEP_DEV")
    if env is not None:
        return env != "0"
    if jax.default_backend() == "cpu":
        return False  # host RAM == "device" memory; nothing to save
    from .utils import hbm as _hbm

    return _hbm.keep_planes_ok(n * s * 8)


@partial(jax.jit, donate_argnums=(0,))
def _dus_rows(big, h, pos):
    return jax.lax.dynamic_update_slice(big, h, (0, pos, 0))


def _assemble_device_planes(dev_batches, n: int, s: int):
    """[2, G, s] batch outputs (genome indices in `grp` order) → device
    (hi, lo) [n, s] planes in global genome order.  Batches are copied into
    a preallocated INF-filled buffer via DONATED dynamic_update_slice (in
    place — no whole-table copy per batch), each batch handle dropped as it
    is consumed, then one row gather: peak device footprint is ~2x the
    table + one batch, not the ~3x of the old concat form (ADVICE r4).
    Genomes absent from every batch (shorter than k) point at the trailing
    INF row."""
    total = sum(h.shape[1] for _, h in dev_batches) + 1  # + sentinel INF row
    big = jnp.full((2, total, s), np.uint32(0xFFFFFFFF), jnp.uint32)
    order = np.full(n, -1, np.int64)
    pos = 0
    while dev_batches:
        grp, h = dev_batches.pop(0)
        for gi, i in enumerate(grp):
            order[i] = pos + gi
        big = _dus_rows(big, h, jnp.int32(pos))
        pos += h.shape[1]
    order[order < 0] = total - 1
    sel = jnp.asarray(order)
    return _gather_planes(big, sel)


@jax.jit
def _gather_planes(big, sel):
    # one fused gather per plane (jitted: big[0]/big[1] are not
    # materialized as standalone copies)
    return jnp.take(big[0], sel, axis=0), jnp.take(big[1], sel, axis=0)


# ---------------------------------------------------------------- distances


def _row_from_counts(shared: int, union: int, k: int,
                     n1: float = 0.0, n2: float = 0.0) -> dict:
    j = shared / union if union > 0 else 0.0
    d = _oracle_compare.mash_distance(j, k)
    return {
        "shared": shared,
        "union": union,
        "jaccard": j,
        "mash_distance": d,
        "ani": _oracle_compare.ani_from_distance(d),
        "p_value": _oracle_compare.chance_p_value(shared, union, n1, n2, k),
    }


def _pad_rows(idx: SketchIndex, tile: int):
    """Pad the [N, s] planes to a multiple of `tile` with INF rows.
    Zero-copy when already aligned (an 8 GB DB shouldn't be duplicated
    just to be sliced)."""
    n = len(idx)
    if n and n % tile == 0:
        return idx.hi, idx.lo, n
    n_pad = -(-n // tile) * tile
    hi = np.full((n_pad, idx.params.s), 0xFFFFFFFF, dtype=np.uint32)
    lo = np.full((n_pad, idx.params.s), 0xFFFFFFFF, dtype=np.uint32)
    hi[:n], lo[:n] = idx.hi, idx.lo
    return hi, lo, n


@jax.jit
def _pack_counts(shared, union, inter):
    return jnp.stack([shared, union, inter])


def dist_tiles(
    index_a: SketchIndex,
    index_b: Optional[SketchIndex] = None,
    tile: int = DEFAULT_TILE,
    skip_tiles: Optional[set] = None,
    _amb_out: Optional[list] = None,
    raw: bool = False,
    depth: Optional[int] = None,
):
    """Tile-level comparison generator (SURVEY.md §3.2): yields
    ``(bi, bj, gi, gj, shared, union, inter)`` per tile, where gi/gj are
    int64 arrays of the valid global pair coordinates (upper triangle only
    for self-comparison) in row-major order, and shared/union/inter are the
    matching int count arrays.  This is the vectorized core under dist_iter
    and the TSV writers — per-pair Python work at 10k-genome scale (50M
    pairs) was the host wall (VERDICT r1 weak #3).

    _amb_out (private; used by dist_counts_matrix): when a list is passed
    and the MXU impl is active, per-tile ambiguity resolution is DEFERRED —
    yielded `shared` holds the lb bracket, and (gi_amb, gj_amb) global
    coordinate arrays of every lb != ub pair are appended to the list for
    one batched end-of-sweep resolution.  Per-tile resolve dispatches
    enqueue behind the pipelined next-tile passes and stalled the sustained
    path at 360-408k pairs/s (VERDICT r3 #3).

    raw=True yields ``(bi, bj, None, None, shared2d, union2d, inter2d)``
    with FULL [tile, tile] rectangles (edge tiles included: clip with the
    caller's n_a/n_b) and no pair masking — the per-tile host cost of the
    masked form (three 262k-element fancy selects + flatnonzero at tile
    512) serialized against the pipeline and measured ~40% of sustained
    wall once resolution was deferred.  Matrix builders slice-assign the
    rectangle instead."""
    self_compare = index_b is None
    if index_b is not None:
        index_a.params.validate_compatible(index_b.params)
    idx_b = index_a if self_compare else index_b
    s = index_a.params.s
    tile = min(tile, max(len(index_a), len(idx_b), 1))

    a_hi, a_lo, n_a = _pad_rows(index_a, tile)
    b_hi, b_lo, n_b = _pad_rows(idx_b, tile)
    nb_a, nb_b = a_hi.shape[0] // tile, b_hi.shape[0] // tile
    ti_flat = np.repeat(np.arange(tile, dtype=np.int64), tile)
    tj_flat = np.tile(np.arange(tile, dtype=np.int64), tile)

    impl = _intersect._intersect_impl(tile)
    compact = index_a.params.compact  # single-plane codes: upload hi only,
    # compare via the 32-bit kernels (half the merge ops and VMEM)

    # Blocks (and, for mxu, their sorted streams) are re-visited by every
    # row/column sweep; cache them on device up to a byte budget so each is
    # uploaded/sorted ONCE instead of per visit (the tunnel re-uploads at
    # ~0.4 GB/s and the mxu stream sort is a 5M-element device sort —
    # measured: duplicate block uploads were the sustained-path wall, 1.2-3 s
    # stalls per fresh block at tile 512 x s=10k).  One unified cache serves
    # both roles: in self-comparison row block b IS column block b (same
    # planes, same base stream), and even rectangular jobs share the u64
    # planes per side.  The column-role mxu stream is derived from the
    # row-role one by a single elementwise payload OR (see
    # mxu_intersect.stream_with_col_tag) — the sort permutation is
    # key-only, so no second sort.  FIFO eviction; the upper-triangle sweep
    # revisits a sliding window, so a partial cache still gets most reuse.
    import os as _os

    mxu = impl == "mxu"
    # worst case per cached block: planes + row stream + derived col
    # stream.  Compact mxu (r4) runs the single-plane stream pass: one
    # code plane + two (code, payload) streams = 20 B/value vs the u64
    # path's 32.
    plane_bytes = 4 if compact else 8
    stream_bytes = (8 * 2 if compact else 12 * 2) if mxu else 0
    bytes_per_block = tile * s * (plane_bytes + stream_bytes)

    # Device-resident source planes (attached by the builder, or by tools
    # whose DB was born on device): block loads become on-device slices —
    # no host→device transfer at all.  The planes are unpadded [N, s];
    # edge blocks INF-pad on device.  u64 indexes carry an (hi, lo) pair;
    # compact indexes carry a single [N, s] code-plane array (r5 — the
    # scale100k dist phase was tunnel-bound re-uploading an 8.2 GB DB the
    # tool had just generated on device).
    def _dev_planes(idx):
        return getattr(idx, "device_planes", None)

    dev_a = _dev_planes(index_a)
    dev_b = dev_a if self_compare else _dev_planes(idx_b)

    # Pipeline depth (tiles in flight beyond the one being finished) is
    # resolved here because the cache budget accounts for it.
    if depth is None:
        depth = int(_os.environ.get("MIEKKI_PIPELINE", "1"))

    cache_mb = _os.environ.get("MIEKKI_COL_CACHE_MB")
    if cache_mb is not None:
        cache_bytes = int(cache_mb) << 20
    else:
        # Unified budget (utils.hbm, VERDICT r4 #8): the cache gets what
        # remains of the dist ceiling after the builder-retained planes
        # and the in-flight pipelined passes, so the three can't stack
        # past the ceiling on any HBM size.
        from .utils import hbm as _hbm

        resident = 0
        for dv in {id(dev_a): dev_a, id(dev_b): dev_b}.values():
            if dv is None:
                continue
            if isinstance(dv, tuple):
                resident += int(dv[0].nbytes) * 2  # hi + lo planes
            else:
                resident += int(dv.nbytes)  # compact single code plane
        cache_bytes = _hbm.dist_cache_bytes(resident, depth,
                                            bytes_per_block)
    cache_cap = max(2, cache_bytes // max(1, bytes_per_block))
    blk_cache: dict = {}

    def _dev_slice(dev, b: int):
        if compact:
            codes = dev if not isinstance(dev, tuple) else dev[0]
            n = codes.shape[0]
            r0, r1 = b * tile, min((b + 1) * tile, n)
            blk = codes[r0:r1]
            if r1 - r0 < tile:
                blk = jnp.pad(blk, ((0, tile - (r1 - r0)), (0, 0)),
                              constant_values=np.uint32(0xFFFFFFFF))
            return blk
        n = dev[0].shape[0]
        r0, r1 = b * tile, min((b + 1) * tile, n)
        hi = dev[0][r0:r1]
        lo = dev[1][r0:r1]
        if r1 - r0 < tile:
            pad = ((0, tile - (r1 - r0)), (0, 0))
            hi = jnp.pad(hi, pad, constant_values=np.uint32(0xFFFFFFFF))
            lo = jnp.pad(lo, pad, constant_values=np.uint32(0xFFFFFFFF))
        return hi, lo

    def load_block(side: str, b: int):
        """Device planes for block b: pair for the u64/mxu paths, a single
        code plane for compact non-mxu."""
        dev = dev_a if side == "a" else dev_b
        if dev is not None:
            return _dev_slice(dev, b)
        table_hi, table_lo = (a_hi, a_lo) if side == "a" else (b_hi, b_lo)
        hi = jnp.asarray(table_hi[b * tile : (b + 1) * tile])
        if compact:
            return hi  # single code plane (mxu runs the 32-bit pass)
        return hi, jnp.asarray(table_lo[b * tile : (b + 1) * tile])

    def block(side: str, b: int):
        """Cached (planes, row_stream, col_stream) for block b of side
        'a'/'b' (sides collapse for self-comparison).  Streams are lazy
        per role and None for non-mxu impls."""
        key = ("a" if self_compare else side, b)
        ent = blk_cache.pop(key, None)
        if ent is None:
            ent = [load_block(side, b), None, None]
        while len(blk_cache) >= cache_cap:
            blk_cache.pop(next(iter(blk_cache)))
        blk_cache[key] = ent  # re-insert = LRU-ish touch
        return ent

    def row_block(bi: int):
        ent = block("a", bi)
        if mxu and ent[1] is None:
            from .ops import mxu_intersect as _mxu

            ent[1] = (_mxu.sketch_stream32(ent[0], False) if compact
                      else _mxu.sketch_stream(ent[0], False))
        return ent[0], ent[1]

    def col_block(bj: int):
        ent = block("b", bj)
        if mxu and ent[2] is None:
            from .ops import mxu_intersect as _mxu

            if ent[1] is None:
                ent[1] = (_mxu.sketch_stream32(ent[0], False) if compact
                          else _mxu.sketch_stream(ent[0], False))
            ent[2] = (_mxu.stream_with_col_tag32(ent[1]) if compact
                      else _mxu.stream_with_col_tag(ent[1]))
        return ent[0], ent[2]

    # JAX dispatch is asynchronous: enqueueing tile t+1's pass (and its
    # block upload/sort) BEFORE pulling tile t's counts lets the device
    # compute while the host pays the tunnel transfer + ambiguity epilogue
    # — the synchronous loop serialized all three (measured: 52.4M pairs
    # sustained 360k/s vs 818k/s for the bare dispatch at tile 512).
    # Depth 1 = classic double buffering; 0 restores synchronous order.
    def dispatch(bi: int, bj: int):
        rows, row_stream = row_block(bi)
        cols, col_stream = col_block(bj)
        if mxu:
            from .ops import mxu_intersect as _mxu

            # Deferred bulk callers don't need per-tile union/n_a/n_b
            # (host-derivable from index sizes) — slim pulls are 25%
            # smaller (r4).
            slim = _amb_out is not None and raw
            if compact:
                return _mxu.tile_counts_mxu_start32(
                    rows, cols, s, row_stream=row_stream,
                    col_stream=col_stream, slim=slim)
            return _mxu.tile_counts_mxu_start(
                rows, cols, s, row_stream=row_stream, col_stream=col_stream,
                slim=slim)
        if compact:
            counts = _intersect.tile_counts_compact(rows, cols, s, impl)
        else:
            counts = _intersect.tile_counts(rows, cols, s, impl)
        if isinstance(counts["shared_in_x"], np.ndarray):
            return counts
        # Pack to ONE device array now (still async); the pull happens at
        # finish time.  The tunnel charges a fixed ~40 ms per transfer, so
        # one packed pull replaces three.
        return _pack_counts(counts["shared_in_x"], counts["union_size"],
                            counts["inter_full"])

    def finish(bi: int, bj: int, handle):
        amb_flat = None
        if mxu:
            from .ops import mxu_intersect as _mxu

            if _amb_out is None:
                counts = _mxu.tile_counts_mxu_finish(handle)
            else:
                counts, amb_i, amb_j = \
                    _mxu.tile_counts_mxu_finish_deferred(handle)
                if amb_i.size:
                    amb_flat = amb_i * tile + amb_j
            shared = counts["shared_in_x"].ravel()
            union = (counts["union_size"].ravel()
                     if counts["union_size"] is not None else None)
            inter = counts["inter_full"].ravel()
        elif isinstance(handle, dict):
            shared = handle["shared_in_x"].ravel()
            union = handle["union_size"].ravel()
            inter = handle["inter_full"].ravel()
        else:
            packed = np.asarray(handle)
            shared, union, inter = (packed[0].ravel(), packed[1].ravel(),
                                    packed[2].ravel())
        if raw:
            if amb_flat is not None:
                # raw mode defers EVERY in-bounds ambiguous pair (including
                # the lower-triangle half of diagonal tiles) so the full
                # rectangles are exact after resolution.
                ga = bi * tile + amb_flat // tile
                gb = bj * tile + amb_flat % tile
                keep = (ga < n_a) & (gb < n_b)
                if keep.any():
                    _amb_out.append((ga[keep], gb[keep]))
            return (bi, bj, None, None,
                    shared.reshape(tile, tile),
                    None if union is None else union.reshape(tile, tile),
                    inter.reshape(tile, tile))
        gi = bi * tile + ti_flat
        gj = bj * tile + tj_flat
        mask = (gi < n_a) & (gj < n_b)
        if self_compare:
            mask &= gj > gi
        if amb_flat is not None:
            keep = mask[amb_flat]
            if keep.any():
                _amb_out.append((gi[amb_flat[keep]], gj[amb_flat[keep]]))
        sel = np.flatnonzero(mask)
        return (bi, bj, gi[sel], gj[sel],
                shared[sel], union[sel], inter[sel])

    from collections import deque

    # Pull grouping (r5, VERDICT r4 #3): the tunnel charges ~35 ms FIXED
    # per device→host transfer — at 210 tiles that is ~7 s of pure fixed
    # cost on the sustained path.  Group G mxu tiles' packed flats into
    # one stacked device array and pull them together: fixed cost /G.
    # Only the mxu handle shape supports it (flat device array first).
    # depth 0 promises synchronous dispatch→finish order (debugging);
    # grouping would put up to G tiles in flight, so it disables grouping.
    group_n = (int(_os.environ.get("MIEKKI_PULL_GROUP", "4"))
               if mxu and depth > 0 else 1)
    max_pending = max(1, depth // group_n) if group_n > 1 else depth

    # MIEKKI_PRESORT=1 (opt-in, measurement lever — NEXT_ROUND r4 #3):
    # dispatch every block's stream sort before tile 0 so no tile pass
    # ever waits on a first-touch sort.  Only when every block fits the
    # cache (pre-building past cache_cap would evict blocks before use).
    if (mxu and _os.environ.get("MIEKKI_PRESORT", "0") == "1"
            and (nb_a if self_compare else nb_a + nb_b) <= cache_cap):
        for b in range(nb_a):
            row_block(b)
        for b in range(nb_b):
            col_block(b)

    def flush(cur):
        if len(cur) == 1 or group_n <= 1:
            return ("single", cur)
        gh = jnp.stack([h[0] for _, _, h in cur])
        return ("group", cur, gh)

    def finish_entry(entry):
        if entry[0] == "single":
            for bi, bj, h in entry[1]:
                yield finish(bi, bj, h)
            return
        _, metas, gh = entry
        flat_all = np.asarray(gh)  # ONE transfer for the whole group
        for i, (bi, bj, h) in enumerate(metas):
            yield finish(bi, bj, (flat_all[i],) + tuple(h[1:]))

    pending: deque = deque()
    cur: list = []
    for bi in range(nb_a):
        for bj in range(nb_b):
            if self_compare and bj < bi:
                continue
            if skip_tiles and (bi, bj) in skip_tiles:
                continue
            cur.append((bi, bj, dispatch(bi, bj)))
            if len(cur) >= group_n:
                pending.append(flush(cur))
                cur = []
                while len(pending) > max_pending:
                    yield from finish_entry(pending.popleft())
    if cur:
        pending.append(flush(cur))
    while pending:
        yield from finish_entry(pending.popleft())


def dist_counts_matrix(
    index_a: SketchIndex,
    index_b: Optional[SketchIndex] = None,
    tile: int = DEFAULT_TILE,
    progress=None,
) -> dict:
    """Full count matrices for a comparison job: {"shared", "union",
    "inter"} int32 [n_a, n_b] (upper triangle + diagonal filled for
    self-comparison; mirror for the lower triangle if needed).

    Unlike looping dist_tiles directly, the MXU path defers ambiguity
    resolution across ALL tiles (see dist_tiles _amb_out): each tile's
    finish is one packed pull, fully overlapped by the pipelined next
    dispatches, and the collected lb != ub pairs resolve at the end in
    large batched dispatches against the host sketch table
    (mxu_intersect.resolve_pairs_host).  progress(done, total) is called
    after each tile."""
    self_compare = index_b is None
    idx_b = index_a if self_compare else index_b
    n_a, n_b = len(index_a), len(idx_b)
    s = index_a.params.s
    shared = np.zeros((n_a, n_b), np.int32)
    union = np.zeros((n_a, n_b), np.int32)
    inter = np.zeros((n_a, n_b), np.int32)
    amb: list = []
    t = min(tile, max(n_a, n_b, 1))
    nb_a, nb_b = -(-n_a // t), -(-n_b // t)
    total = nb_a * (nb_a + 1) // 2 if self_compare else nb_a * nb_b
    done = 0
    # raw rectangles + slice assignment (no per-pair masking) and a deeper
    # default pipeline: with resolution deferred and the host epilogue down
    # to a block copy, the loop is device-bound (measured 1.05M pairs/s at
    # tile 512 warm vs 495k with fancy scatters at depth 3).
    import os as _os

    depth = int(_os.environ.get("MIEKKI_PIPELINE", "8"))
    union_deferred = False
    for bi, bj, _, _, sh, un, it in dist_tiles(
            index_a, index_b, tile=tile, _amb_out=amb, raw=True,
            depth=depth):
        r0, r1 = bi * t, min((bi + 1) * t, n_a)
        c0, c1 = bj * t, min((bj + 1) * t, n_b)
        shared[r0:r1, c0:c1] = sh[: r1 - r0, : c1 - c0]
        if un is None:  # slim mxu pull: union derived below from sizes
            union_deferred = True
        else:
            union[r0:r1, c0:c1] = un[: r1 - r0, : c1 - c0]
        inter[r0:r1, c0:c1] = it[: r1 - r0, : c1 - c0]
        done += 1
        if progress is not None:
            progress(done, total)
    if union_deferred:
        # union = min(n_a + n_b - inter, s) (the pair_counts formula), in
        # one vectorized pass over exactly the cells the tile sweep wrote
        # (all tiles for rectangular jobs; column blocks >= the row block
        # for self-compare) so slim and non-slim outputs match bitwise.
        sz_a = index_a.sizes().astype(np.int64)
        sz_b = sz_a if self_compare else idx_b.sizes().astype(np.int64)
        full = np.minimum(sz_a[:, None] + sz_b[None, :] - inter,
                          s).astype(np.int32)
        if self_compare:
            for bi in range(-(-n_a // t)):
                r0, r1 = bi * t, min((bi + 1) * t, n_a)
                union[r0:r1, r0:] = full[r0:r1, r0:]
        else:
            union[:, :] = full
    if amb:
        from .ops import mxu_intersect as _mxu

        ai = np.concatenate([a for a, _ in amb])
        aj = np.concatenate([b for _, b in amb])
        shared[ai, aj] = _mxu.resolve_pairs_host(
            (index_a.hi, index_a.lo), (idx_b.hi, idx_b.lo), ai, aj, s)
    if self_compare:
        sizes = index_a.sizes().astype(np.int32)
        np.fill_diagonal(shared, np.minimum(sizes, s))
        np.fill_diagonal(union, np.minimum(sizes, s))
        np.fill_diagonal(inter, sizes)
    return {"shared": shared, "union": union, "inter": inter}


def dist_iter(
    index_a: SketchIndex,
    index_b: Optional[SketchIndex] = None,
    tile: int = DEFAULT_TILE,
    skip_tiles: Optional[set] = None,
    on_tile_done=None,
) -> Iterator[dict]:
    """Pairwise comparison rows (self all-vs-all upper triangle when
    index_b is None), computed tile-by-tile on device (SURVEY.md §3.2).

    skip_tiles / on_tile_done implement manifest-based resume
    (SURVEY.md §5 "Failure detection"): tiles listed in skip_tiles are not
    recomputed; on_tile_done((bi, bj)) fires after each tile's rows are
    yielded.  Row-level API — the TSV writers below use the vectorized
    block path instead.
    """
    self_compare = index_b is None
    idx_b = index_a if self_compare else index_b
    k = index_a.params.k
    cards_a = index_a.cardinalities()
    cards_b = cards_a if self_compare else idx_b.cardinalities()
    sizes_a = index_a.sizes()
    sizes_b = sizes_a if self_compare else idx_b.sizes()

    for bi, bj, gis, gjs, shs, uns, its in dist_tiles(
        index_a, index_b, tile, skip_tiles
    ):
        for gi, gj, sh, un, it in zip(gis, gjs, shs, uns, its):
            gi, gj, it = int(gi), int(gj), int(it)
            row = _row_from_counts(int(sh), int(un), k,
                                   cards_a[gi], cards_b[gj])
            sz_q = int(sizes_a[gi])
            sz_r = int(sizes_b[gj])
            row["containment_q"] = it / sz_q if sz_q else 0.0
            row["containment_r"] = it / sz_r if sz_r else 0.0
            row["ani_containment"] = _oracle_compare.ani_from_containment(
                max(row["containment_q"], row["containment_r"]), k
            )
            row["query"] = index_a.names[gi]
            row["reference"] = idx_b.names[gj]
            row["i"], row["j"] = gi, gj
            yield row
        if on_tile_done is not None:
            on_tile_done((bi, bj))


def dist(index_a: SketchIndex, index_b: Optional[SketchIndex] = None,
         tile: int = DEFAULT_TILE) -> List[dict]:
    """All comparison rows, sorted by (i, j) — deterministic across tilings."""
    return sorted(dist_iter(index_a, index_b, tile), key=lambda r: (r["i"], r["j"]))


def rows_from_count_matrices(
    index_a: SketchIndex,
    shared: np.ndarray,
    union: np.ndarray,
    index_b: Optional[SketchIndex] = None,
    inter: Optional[np.ndarray] = None,
) -> List[dict]:
    """Comparison rows from full [N_a, N_b] count matrices (the
    parallel.dist_sharded output) — identical rows to engine.dist.

    When `inter` (full |S(A) ∩ S(B)|) is given, containment columns are
    populated exactly as dist_iter does, so --containment works on the
    distributed path too."""
    self_compare = index_b is None
    idx_b = index_a if self_compare else index_b
    k = index_a.params.k
    rows = []
    cards_a = index_a.cardinalities()
    cards_b = cards_a if self_compare else idx_b.cardinalities()
    sizes_a = index_a.sizes()
    sizes_b = sizes_a if self_compare else idx_b.sizes()
    for i in range(len(index_a)):
        j0 = i + 1 if self_compare else 0
        for j in range(j0, len(idx_b)):
            row = _row_from_counts(int(shared[i, j]), int(union[i, j]), k,
                                   cards_a[i], cards_b[j])
            if inter is not None:
                it = int(inter[i, j])
                sz_q, sz_r = int(sizes_a[i]), int(sizes_b[j])
                row["containment_q"] = it / sz_q if sz_q else 0.0
                row["containment_r"] = it / sz_r if sz_r else 0.0
                row["ani_containment"] = _oracle_compare.ani_from_containment(
                    max(row["containment_q"], row["containment_r"]), k
                )
            row["query"] = index_a.names[i]
            row["reference"] = idx_b.names[j]
            row["i"], row["j"] = i, j
            rows.append(row)
    return rows


def select_columns(containment: bool = False, bounds: bool = False):
    """TSV column tuple for a dist output with optional extras — shared by
    every cmd_dist code path so flags are never silently dropped."""
    cols = CONTAINMENT_COLUMNS if containment else TSV_COLUMNS
    if bounds:
        cols = tuple(cols) + BOUNDS_COLUMNS[len(TSV_COLUMNS):]
    return tuple(cols)


def filter_rows(rows, max_dist: Optional[float] = None,
                max_p: Optional[float] = None) -> List[dict]:
    """--max-dist / --max-p row filters (mash dist -d / -v analogs)."""
    out = list(rows)
    if max_dist is not None:
        out = [r for r in out if r["mash_distance"] <= max_dist]
    if max_p is not None:
        out = [r for r in out if r["p_value"] <= max_p]
    return out


# ------------------------------------------------- vectorized TSV emission
#
# At 10k-genome scale a TSV has ~50M rows; per-row Python dicts + f-strings
# are the host wall (VERDICT r1 weak #3).  The block path below computes the
# float columns with the oracle's vectorized primitives (bitwise-identical
# to the scalar row path — the scalars are wrappers over the same numpy
# code) and exploits the low cardinality of the integer count combos: every
# float column except p_value is a function of (shared, union) or
# (inter, size), so each UNIQUE combo is formatted once and broadcast via
# np.unique's inverse index.  Assembly is C-level np.char.add over U arrays.


def _fmt_unique_floats(vals: np.ndarray) -> np.ndarray:
    return np.asarray([f"{v:.10g}" for v in vals.tolist()], dtype=np.str_)


def _fmt_unique_ints(vals: np.ndarray) -> np.ndarray:
    return np.asarray([str(v) for v in vals.tolist()], dtype=np.str_)


class _BlockFormatter:
    """Per-pair TSV block formatter over count arrays (shared state: names,
    cardinalities, sizes, params — prepared once per dist job)."""

    def __init__(self, index_a: SketchIndex, index_b: Optional[SketchIndex],
                 columns: Sequence[str] = TSV_COLUMNS,
                 max_dist: Optional[float] = None,
                 max_p: Optional[float] = None, conf: float = 0.95):
        idx_b = index_a if index_b is None else index_b
        self.k, self.s = index_a.params.k, index_a.params.s
        self.columns = tuple(columns)
        self.max_dist, self.max_p, self.conf = max_dist, max_p, conf
        self.names_a = np.asarray(index_a.names, dtype=np.str_)
        self.names_b = (self.names_a if index_b is None
                        else np.asarray(idx_b.names, dtype=np.str_))
        self.cards_a = np.asarray(index_a.cardinalities(), dtype=np.float64)
        self.cards_b = (self.cards_a if index_b is None
                        else np.asarray(idx_b.cardinalities(), np.float64))
        self.sizes_a = np.asarray(index_a.sizes(), dtype=np.int64)
        self.sizes_b = (self.sizes_a if index_b is None
                        else np.asarray(idx_b.sizes(), dtype=np.int64))

    def header(self) -> str:
        return "#" + "\t".join(self.columns) + "\n"

    def format(self, gi, gj, shared, union, inter) -> tuple[str, int]:
        """One block of pairs → (TSV text without header, rows kept)."""
        n = gi.shape[0]
        if n == 0:
            return "", 0
        k, s = self.k, self.s
        shared = shared.astype(np.int64)
        union = union.astype(np.int64)
        inter = inter.astype(np.int64)
        m = np.int64(s + 1)

        code_su, inv_su = np.unique(shared * m + union, return_inverse=True)
        u_sh, u_un = code_su // m, code_su % m
        u_j = np.where(u_un > 0, u_sh / np.where(u_un > 0, u_un, 1), 0.0)
        u_d = _oracle_compare.mash_distance_vec(u_j, k)

        need_p = "p_value" in self.columns or self.max_p is not None
        if need_p:
            p = _oracle_compare.chance_p_value_vec(
                shared, union, self.cards_a[gi], self.cards_b[gj], k
            )

        keep = None
        if self.max_dist is not None:
            keep = u_d[inv_su] <= self.max_dist
        if self.max_p is not None:
            kp = p <= self.max_p
            keep = kp if keep is None else keep & kp
        if keep is not None and not keep.all():
            sel = np.flatnonzero(keep)
            gi, gj, shared, union, inter, inv_su = (
                x[sel] for x in (gi, gj, shared, union, inter, inv_su))
            if need_p:
                p = p[sel]
            n = gi.shape[0]
            if n == 0:
                return "", 0

        cols_cache: dict = {}

        def col(c: str) -> np.ndarray:
            if c == "query":
                return self.names_a[gi]
            if c == "reference":
                return self.names_b[gj]
            if c == "shared":
                return _fmt_unique_ints(u_sh)[inv_su]
            if c == "union":
                return _fmt_unique_ints(u_un)[inv_su]
            if c == "jaccard":
                return _fmt_unique_floats(u_j)[inv_su]
            if c == "mash_distance":
                return _fmt_unique_floats(u_d)[inv_su]
            if c == "ani":
                return _fmt_unique_floats(
                    _oracle_compare.ani_from_distance_vec(u_d))[inv_su]
            if c == "p_value":
                out = np.full(n, "1", dtype="U26")
                pos = np.flatnonzero(shared > 0)
                if pos.size:
                    out[pos] = [f"{v:.10g}" for v in p[pos].tolist()]
                return out
            if c in ("containment_q", "containment_r"):
                sz = (self.sizes_a[gi] if c.endswith("q")
                      else self.sizes_b[gj])
                cu, ci = np.unique(inter * m + sz, return_inverse=True)
                it_u, sz_u = cu // m, cu % m
                cv = np.where(sz_u > 0,
                              it_u / np.where(sz_u > 0, sz_u, 1), 0.0)
                return _fmt_unique_floats(cv)[ci]
            if c == "ani_containment":
                code3, ci = np.unique(
                    (inter * m + self.sizes_a[gi]) * m + self.sizes_b[gj],
                    return_inverse=True)
                szr_u = code3 % m
                it_u, szq_u = (code3 // m) // m, (code3 // m) % m
                cq = np.where(szq_u > 0,
                              it_u / np.where(szq_u > 0, szq_u, 1), 0.0)
                cr = np.where(szr_u > 0,
                              it_u / np.where(szr_u > 0, szr_u, 1), 0.0)
                av = _oracle_compare.ani_from_containment_vec(
                    np.maximum(cq, cr), k)
                return _fmt_unique_floats(av)[ci]
            if c in ("jaccard_lo", "jaccard_hi", "dist_lo", "dist_hi"):
                if "bounds" not in cols_cache:
                    jlo, jhi = _oracle_compare.jaccard_ci_vec(
                        u_sh, u_un, self.conf)
                    cols_cache["bounds"] = {
                        "jaccard_lo": _fmt_unique_floats(jlo),
                        "jaccard_hi": _fmt_unique_floats(jhi),
                        "dist_lo": _fmt_unique_floats(
                            _oracle_compare.mash_distance_vec(jhi, k)),
                        "dist_hi": _fmt_unique_floats(
                            _oracle_compare.mash_distance_vec(jlo, k)),
                    }
                return cols_cache["bounds"][c][inv_su]
            raise KeyError(f"unknown TSV column {c!r}")

        parts = col(self.columns[0])
        for c in self.columns[1:]:
            parts = np.char.add(np.char.add(parts, "\t"), col(c))
        return "\n".join(parts.tolist()) + "\n", n


# Pairs per _BlockFormatter.format call in the streaming writers.  The
# format pass builds UCS4 row-string intermediates (~100 chars x 4 B per
# pair, doubled per np.char.add step); capping the call bounds peak RSS at
# ~1 GB regardless of stripe width (a 512 x 102,400 stripe formatted in one
# call was a multi-GB spike at scale100k shapes).
FORMAT_CHUNK = 1 << 20


def _format_write(fmt: "_BlockFormatter", out, gi, gj, sh, un, it,
                  chunk: int = FORMAT_CHUNK) -> int:
    """Format (already ordered) pair arrays in bounded chunks; returns rows
    written.  Chunks are sequential slices, so output order is unchanged."""
    n_rows = 0
    for a in range(0, gi.shape[0], chunk):
        sl = np.s_[a : a + chunk]
        text, n = fmt.format(gi[sl], gj[sl], sh[sl], un[sl], it[sl])
        out.write(text)
        n_rows += n
    return n_rows


def dist_tsv_write(
    out,
    index_a: SketchIndex,
    index_b: Optional[SketchIndex] = None,
    tile: int = DEFAULT_TILE,
    columns: Sequence[str] = TSV_COLUMNS,
    max_dist: Optional[float] = None,
    max_p: Optional[float] = None,
    bounds: bool = False,
    skip_tiles: Optional[set] = None,
    on_tile_done=None,
    write_header: bool = True,
) -> int:
    """Stream the dist TSV to a file object via the vectorized block path.
    Row order/content identical to rows_to_tsv(dist(...)).  Returns rows
    written."""
    if bounds and len(columns) == len(TSV_COLUMNS):
        columns = tuple(columns) + BOUNDS_COLUMNS[len(TSV_COLUMNS):]
    fmt = _BlockFormatter(index_a, index_b, columns, max_dist, max_p)
    if write_header:
        out.write(fmt.header())
    n_rows = 0
    if on_tile_done is None and skip_tiles is None:
        # No resume granularity needed: buffer each row-block stripe and
        # emit it (gi, gj)-sorted, so the full output is in global (i, j)
        # order — matching rows_to_tsv(dist(...)).
        stripe_bi = None
        stripe: List[tuple] = []

        def flush():
            nonlocal n_rows
            if not stripe:
                return
            gi, gj, sh, un, it = (np.concatenate(x) for x in zip(*stripe))
            order = np.lexsort((gj, gi))
            n_rows += _format_write(fmt, out, gi[order], gj[order],
                                    sh[order], un[order], it[order])
            stripe.clear()

        for bi, bj, gi, gj, sh, un, it in dist_tiles(index_a, index_b, tile):
            if bi != stripe_bi:
                flush()
                stripe_bi = bi
            stripe.append((gi, gj, sh, un, it))
        flush()
        return n_rows
    for bi, bj, gi, gj, sh, un, it in dist_tiles(
        index_a, index_b, tile, skip_tiles
    ):
        text, n = fmt.format(gi, gj, sh, un, it)
        out.write(text)
        n_rows += n
        if on_tile_done is not None:
            on_tile_done((bi, bj))
    return n_rows


def counts_tsv_write(
    out,
    index_a: SketchIndex,
    shared: np.ndarray,
    union: np.ndarray,
    index_b: Optional[SketchIndex] = None,
    inter: Optional[np.ndarray] = None,
    columns: Sequence[str] = TSV_COLUMNS,
    max_dist: Optional[float] = None,
    max_p: Optional[float] = None,
    row_chunk: int = 256,
) -> int:
    """TSV from full [N_a, N_b] count matrices (the parallel.dist_sharded
    output) via the block path — same rows as
    rows_to_tsv(rows_from_count_matrices(...)); processed in row chunks to
    bound peak memory at pod scale."""
    self_compare = index_b is None
    idx_b = index_a if self_compare else index_b
    n_a, n_b = len(index_a), len(idx_b)
    if inter is None:
        inter = np.zeros_like(np.asarray(shared))
    fmt = _BlockFormatter(index_a, index_b, columns, max_dist, max_p)
    out.write(fmt.header())
    n_rows = 0
    for r0 in range(0, n_a, row_chunk):
        r1 = min(r0 + row_chunk, n_a)
        gi = np.repeat(np.arange(r0, r1, dtype=np.int64), n_b)
        gj = np.tile(np.arange(n_b, dtype=np.int64), r1 - r0)
        if self_compare:
            sel = np.flatnonzero(gj > gi)
            gi, gj = gi[sel], gj[sel]
        sh = np.asarray(shared)[gi, gj]
        un = np.asarray(union)[gi, gj]
        it = np.asarray(inter)[gi, gj]
        n_rows += _format_write(fmt, out, gi, gj, sh, un, it)
    return n_rows


def dist_resumable(
    index_a: SketchIndex,
    out_path,
    manifest_path,
    index_b: Optional[SketchIndex] = None,
    tile: int = DEFAULT_TILE,
    columns: Sequence[str] = TSV_COLUMNS,
    max_dist: Optional[float] = None,
    max_p: Optional[float] = None,
    bounds: bool = False,
) -> int:
    """Checkpointed all-vs-all: stream TSV rows tile-by-tile, recording each
    completed tile in a JSON-lines manifest (SURVEY.md §5 "Failure
    detection / elastic recovery": the job is embarrassingly restartable —
    on restart, completed tiles are skipped and output rows appended).

    Tiles are iterated in a deterministic grid order, so a resumed run's
    output is identical to an uninterrupted one.  Rows of a tile are flushed
    BEFORE its manifest line, so a crash can at worst duplicate the rows of
    one unrecorded trailing tile; callers who need exactly-once rows can
    dedupe on (query, reference).  Returns the number of rows written by
    THIS invocation.
    """
    import json as _json
    import os as _os

    done: set = set()
    if _os.path.exists(manifest_path) and _os.path.exists(out_path):
        with open(manifest_path) as mf:
            for line in mf:
                line = line.strip()
                if line:
                    rec = _json.loads(line)
                    done.add((rec["bi"], rec["bj"]))
    fresh = not done
    with open(out_path, "w" if fresh else "a") as out, open(
        manifest_path, "w" if fresh else "a"
    ) as mf:

        def on_tile_done(tile_coord):
            out.flush()
            mf.write(_json.dumps({"bi": tile_coord[0], "bj": tile_coord[1]}) + "\n")
            mf.flush()

        return dist_tsv_write(
            out, index_a, index_b, tile=tile, columns=columns,
            max_dist=max_dist, max_p=max_p, bounds=bounds,
            skip_tiles=done, on_tile_done=on_tile_done, write_header=fresh,
        )


# ---------------------------------------------------------------- screening
#
# TPU-first design: a read hash can only hit a sketch if it is <= the
# LARGEST value in any bottom-s sketch — a ~s/|genome| sliver of the 64-bit
# hash space.  Each batch is hashed on device, thresholded, compacted
# (sort-based partition — no scalarized gathers), and only the few
# survivors are binary-searched against the value-sorted flattened DB;
# matches OR into a flat bitmap aligned to that DB.  Per-genome distinct-hit
# counts fall out at the end via a host-side bincount over the (static)
# position → genome map.  All branches live on device (lax.while_loop over
# survivor chunks), so overflowing batches need no host round trip.


def _screen_chunk() -> int:
    """Survivor hashes joined per while-loop step (MIEKKI_SCREEN_CHUNK).
    At config-4 scale the survivor rate is ~33% (threshold = DB max; a
    30 kb genome keeps s=10k of ~30k k-mers), i.e. ~1.4M survivors per
    4.2M-base batch — at 4096/step that is ~340 while-loop iterations per
    batch, the dominant screen cost.  Read per call so runs can tune it."""
    import os as _os2

    return int(_os2.environ.get("MIEKKI_SCREEN_CHUNK", str(SCREEN_CHUNK)))


# Default survivor hashes joined per while-loop step.  r3 silicon sweep
# (tools/screen_chunk_bench.py, 10M-value DB, 4.2M-base batches, ~56%
# survivors, medians of 5): 4096 → 1.48 s/batch, 32768 → 1.15 s (best),
# 262144 → 1.73 s, 1M → 2.63 s.  The join is bound by the searchsorted
# binary-search gathers (~24/survivor, scalarized on TPU), not the loop
# count — hence the shallow optimum.
SCREEN_CHUNK = 32768


def _stable_argsort_u64(flat: np.ndarray) -> np.ndarray:
    """Stable argsort of a u64 array, multi-threaded when torch is usable.

    np.argsort is single-threaded — 463 s of the 933 s config-5-scale
    screen wall went to argsorting the 1.024G-value flat DB (measured
    2026-08-21, phase_seconds instrumentation).  torch.argsort(stable)
    parallelizes across cores; u64 order maps to i64 order by flipping
    the sign bit (a monotone bijection), so the permutation is identical.
    """
    if len(flat) >= (1 << 20):
        try:
            import torch

            as_i64 = (flat ^ np.uint64(1 << 63)).view(np.int64)
            return torch.argsort(torch.from_numpy(as_i64),
                                 stable=True).numpy()
        except Exception:  # pragma: no cover - torch is baked in
            pass
    return np.argsort(flat, kind="stable")


def _flatten_db(index: SketchIndex):
    """Value-sorted flat view of all sketch hashes + genome-id map (host)."""
    vals = []
    gids = []
    for i in range(len(index)):
        sk = index.sketch_u64(i)
        vals.append(sk)
        gids.append(np.full(len(sk), i, np.int32))
    if not vals or sum(len(v) for v in vals) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int32)
    flat = np.concatenate(vals)
    gid = np.concatenate(gids)
    order = _stable_argsort_u64(flat)
    return flat[order], gid[order]


def _screen_join() -> str:
    """MIEKKI_SCREEN_JOIN=merge|searchsorted.  merge (default): the
    gather-free sorted-merge join (_screen_join_merge) — one batched sort
    of DB+hashes, a segmented OR, and a restore sort; searchsorted: the
    binary-search join (24 scalarized gathers per survivor), kept for
    comparison.  Resolved outside jit by callers (static arg)."""
    import os as _os3

    return _os3.environ.get("MIEKKI_SCREEN_JOIN", "merge").lower()


def _screen_join_merge(acc, db_hi, db_lo, h):
    """Gather/scatter-free membership join (r3): which DB values appear in
    the hash batch `h`?

    stream = sort(concat(db, hashes)) by (value, is_read) with the element
    index riding along; within an equal-value run the DB copies sort first,
    so a DB element is hit iff an is_read element follows it inside its
    run — a right-to-left segmented OR (log-doubling rolls, no gathers).
    DB-order flags are restored by a second sort on (is_read, index): DB
    elements keep their relative (already value-sorted) order.  Replaces
    the searchsorted join's ~24 scalarized binary-search gathers per
    survivor and the scatter accumulate; measured costs: two ~14M sorts
    185 + 134 ms + ~110 ms of segmented-OR passes vs 1,150 ms for the best
    searchsorted configuration at the same shapes (tools/screen_join
    probes, chip, medians of 5).  No threshold prefilter needed for
    correctness (hashes above the DB max match nothing), so survivors are
    counted only for the --metrics observability contract.
    """
    m_db = db_hi.shape[0]
    n = h[0].shape[0]
    total = m_db + n
    sh = jnp.concatenate([db_hi, h[0]])
    sl = jnp.concatenate([db_lo, h[1]])
    is_read = jnp.concatenate([jnp.zeros(m_db, jnp.uint32),
                               jnp.ones(n, jnp.uint32)])
    pos = jnp.concatenate([
        jax.lax.iota(jnp.int32, m_db),
        jnp.full(n, m_db, jnp.int32),  # reads all restore to the sink
    ])
    sh, sl, is_read, pos = jax.lax.sort((sh, sl, is_read, pos), num_keys=3)
    flag = is_read.astype(jnp.bool_)
    eq = jnp.concatenate([(sh[1:] == sh[:-1]) & (sl[1:] == sl[:-1]),
                          jnp.zeros(1, jnp.bool_)])  # eq[i]: i ~ i+1
    d = 1
    while d < total:
        # flag[i] |= run-continues(i .. i+d) & flag[i+d]; the composed eq
        # mask keeps roll wraparound from leaking across the array edge
        flag = flag | (eq & jnp.roll(flag, -d))
        eq = eq & jnp.roll(eq, -d)
        d <<= 1
    hit = (flag & (is_read == 0)).astype(jnp.uint32)
    _, _, hitp = jax.lax.sort((is_read, pos, hit), num_keys=2)
    db_hit = jnp.concatenate([hitp[:m_db] > 0, jnp.zeros(1, jnp.bool_)])
    return acc | db_hit


def _screen_update_impl(acc, db_hi, db_lo, thr_hi, thr_lo, flat_codes,
                        k: int, compact: bool = False, chunk: int = None,
                        join: str = "merge"):
    """One screening step over a packed read batch (trace-level body; the
    jitted entry is _screen_update; miekki_tpu.parallel.screen reuses this
    inside shard_map).

    acc: bool[M + 1] — hit bitmap over the value-sorted flat DB (last slot
    is a scratch sink for non-matches).  Returns (updated bitmap,
    n_windows int32 — valid k-mer windows in the batch, n_survivors int32 —
    windows that passed the threshold prefilter); the counts feed the
    --metrics survivor-rate observability (VERDICT r1 weak #5: prefilter
    selectivity degrades with DB size and must be visible).
    """
    m_db = db_hi.shape[0]
    h, _ = _hash.hash_windows(flat_codes, k)
    n = h[0].shape[0]
    n_valid = jnp.sum((~u64.is_inf(h)).astype(jnp.int32))
    if compact:
        # compact DB: values are 32-bit monotone codes embedded as
        # (code, 0) pairs — map read hashes into the same domain (the
        # transform is monotone, so the threshold prefilter and the
        # sorted join below work unchanged; ops/compact.py)
        from .ops import compact as _compact_ops

        code = _compact_ops.encode_pair(h[0], h[1])
        h = (code, _compact_ops.lo_plane(code))
    keep = ~u64.less((thr_hi, thr_lo), h)  # h <= thr; INF never kept
    n_keep = jnp.sum(keep.astype(jnp.int32))
    if join == "merge":
        return _screen_join_merge(acc, db_hi, db_lo, h), n_valid, n_keep
    # Stable partition survivors to the front (sort by position-keyed int32;
    # native sort beats scalarized nonzero/gather compaction on TPU).
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    key = jnp.where(keep, pos, n + pos)
    _, ph, pl = jax.lax.sort((key, h[0], h[1]), num_keys=1)

    b = min(chunk or SCREEN_CHUNK, n)
    # INF-pad to a multiple of b: dynamic_slice CLAMPS an out-of-range start,
    # which would desynchronize the slice from the `in_range` mask below and
    # silently drop trailing survivors whenever n % b != 0 (ADVICE r1, high).
    n_pad = -(-n // b) * b
    if n_pad != n:
        fill = jnp.full((n_pad - n,), 0xFFFFFFFF, dtype=ph.dtype)
        ph = jnp.concatenate([ph, fill])
        pl = jnp.concatenate([pl, fill])

    def body(state):
        off, acc = state
        chs = (jax.lax.dynamic_slice(ph, (off,), (b,)),
               jax.lax.dynamic_slice(pl, (off,), (b,)))
        in_range = (pos[:b] + off) < n_keep
        idx = _intersect.searchsorted_u64((db_hi, db_lo), chs)
        probe = jnp.clip(idx, 0, max(m_db - 1, 0))
        matched = (
            (idx < m_db)
            & u64.equal((db_hi[probe], db_lo[probe]), chs)
            & in_range
        )
        target = jnp.where(matched, probe, m_db)
        acc = acc.at[target].max(matched)
        return off + b, acc

    def cond(state):
        return state[0] < n_keep

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc, n_valid, n_keep


@partial(jax.jit, static_argnames=("k", "compact", "chunk", "join"),
         donate_argnums=(0,))
def _screen_update(acc, db_hi, db_lo, thr_hi, thr_lo, flat_codes, k: int,
                   compact: bool = False, chunk: int = None,
                   join: str = "merge"):
    return _screen_update_impl(acc, db_hi, db_lo, thr_hi, thr_lo,
                               flat_codes, k, compact, chunk, join)


# ------------------------------------------------- grouped hash-once screen
# r5 redesign (VERDICT r4 #2): for DBs beyond the merge-join budget the old
# slabbed screen re-read AND re-hashed the whole read stream once per slab,
# and the merge join re-SORTED the slab's DB values every batch (~56 s per
# slab-pass at config-5 scale).  The grouped screen never sorts the DB on
# device: each read batch is hashed and VALUE-SORTED once, so the survivors
# of any group threshold are a PREFIX of the sorted stream, and each group
# join is a chunked searchsorted probe of that prefix into the group's
# resident (pre-sorted) planes — O(n_surv · log m) gathers instead of an
# O((m+n) log(m+n)) 4-plane sort per batch per slab.


@partial(jax.jit, static_argnames=("k", "compact"))
def _hash_sorted_batch(flat_codes, k: int, compact: bool = False):
    """Hash one packed read batch and value-sort the (hi, lo) stream.

    Sorted ascending, INVALID windows (INF) last — survivors of ANY
    threshold are then the prefix h <= thr, so one sort serves every
    group's join.  compact=True maps hashes into the monotone 32-bit code
    domain first (ops/compact.py), exactly as _screen_update_impl does.
    Returns (hh, hl, n_valid)."""
    h, _ = _hash.hash_windows(flat_codes, k)
    n_valid = jnp.sum((~u64.is_inf(h)).astype(jnp.int32))
    if compact:
        from .ops import compact as _compact_ops

        code = _compact_ops.encode_pair(h[0], h[1])
        h = (code, _compact_ops.lo_plane(code))
    hh, hl = jax.lax.sort(h, num_keys=2)
    return hh, hl, n_valid


@partial(jax.jit, static_argnames=("chunk",), donate_argnums=(0,))
def _screen_join_sorted(acc, db_hi, db_lo, thr_hi, thr_lo, hh, hl,
                        chunk: int):
    """Join a value-sorted hash batch against one resident DB group.

    Survivors (h <= thr, the group's max value) are the prefix
    [0, n_keep); chunked searchsorted probes + scatter-max mark the hit
    slots.  n_keep stays a device scalar (no host sync).  Bit-identical
    to the merge/searchsorted joins on the same group (parity-tested)."""
    m_db = db_hi.shape[0]
    n = hh.shape[0]
    keep = ~u64.less((thr_hi, thr_lo), (hh, hl))  # h <= thr (INF never)
    n_keep = jnp.sum(keep.astype(jnp.int32))
    b = min(chunk, n)
    n_pad = -(-n // b) * b
    if n_pad != n:
        # INF-pad to a multiple of b: dynamic_slice CLAMPS out-of-range
        # starts, which would desynchronize the in_range mask (ADVICE r1)
        fill = jnp.full((n_pad - n,), 0xFFFFFFFF, dtype=hh.dtype)
        hh = jnp.concatenate([hh, fill])
        hl = jnp.concatenate([hl, fill])
    pos = jax.lax.broadcasted_iota(jnp.int32, (b,), 0)

    def body(state):
        off, acc = state
        chs = (jax.lax.dynamic_slice(hh, (off,), (b,)),
               jax.lax.dynamic_slice(hl, (off,), (b,)))
        in_range = (pos + off) < n_keep
        idx = _intersect.searchsorted_u64((db_hi, db_lo), chs)
        probe = jnp.clip(idx, 0, max(m_db - 1, 0))
        matched = (
            (idx < m_db)
            & u64.equal((db_hi[probe], db_lo[probe]), chs)
            & in_range
        )
        target = jnp.where(matched, probe, m_db)
        acc = acc.at[target].max(matched)
        return off + b, acc

    def cond(state):
        return state[0] < n_keep

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc, n_keep


_KMV_S0 = 4096  # bottom-s0 KMV state for the optional screen p-value
# column: relative error of the read-set cardinality ~1/sqrt(s0) ≈ 1.6%


def _kmv_init(s0: int = _KMV_S0):
    # two DISTINCT buffers: _kmv_update donates both, and donating one
    # buffer twice is an XLA execute error
    return (jnp.full(s0, np.uint32(0xFFFFFFFF), jnp.uint32),
            jnp.full(s0, np.uint32(0xFFFFFFFF), jnp.uint32))


@partial(jax.jit, static_argnames=("k", "s0"), donate_argnums=(0, 1))
def _kmv_update(state_hi, state_lo, flat_codes, k: int, s0: int):
    """Bottom-s0 distinct-hash (KMV) state update over one packed read
    batch (1-D) or a [G, W] group of batches: the read-set cardinality
    estimate behind the optional screen p-value column.  Set-union
    semantics (sort → dedup → truncate), so the result is independent of
    batch grouping — engine.screen and parallel.screen_sharded produce
    bitwise-identical states over the same read stream."""
    if flat_codes.ndim == 1:
        flat_codes = flat_codes[None]
    h = jax.vmap(lambda r: _hash.hash_windows(r, k)[0])(flat_codes)
    hi = jnp.concatenate([state_hi, h[0].ravel()])
    lo = jnp.concatenate([state_lo, h[1].ravel()])
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)
    dup = jnp.concatenate([jnp.zeros(1, jnp.bool_),
                           (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1])])
    hi = jnp.where(dup, jnp.uint32(0xFFFFFFFF), hi)
    lo = jnp.where(dup, jnp.uint32(0xFFFFFFFF), lo)
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)
    return hi[:s0], lo[:s0]


def _kmv_estimate(state) -> float:
    """Read-set distinct canonical-k-mer estimate from the KMV state —
    exact when fewer than s0 distinct hashes were seen (INVALID windows
    hash to the INF sentinel and are excluded by kmv_cardinality)."""
    vals = u64.join(np.asarray(state[0]), np.asarray(state[1]))
    return _oracle_compare.kmv_cardinality(vals, len(vals))


def _packed_read_batches_fast(path, k: int, flat: int) -> Iterator[np.ndarray]:
    """Vectorized batch packing over the native parser's STREAMED output
    (bounded RSS for >RAM read sets — VERDICT r1 item 4).

    Each native stream batch (complete records only) becomes one virtual
    stream: records joined by k-1 INVALID separator bases (windows spanning
    a record boundary are masked by the separator), then sliced into
    overlapping [flat + k - 1] rows with stride `flat` — one numpy
    gather-scatter per stream batch instead of a Python loop per record
    (10M-read workloads).  Stream batches are packed independently (the
    trailing partial row of each is INVALID-padded), which preserves the
    exact set of valid k-mer windows; only the row alignment differs from
    the whole-file layout, and screening is row-order-agnostic.
    """
    from .io import native as _native

    gap = k - 1
    width = flat + k - 1
    for _names, all_codes, offsets in _native.stream_encoded_native(path):
        lengths = np.diff(offsets.astype(np.int64))
        total = int(lengths.sum())
        if total == 0:
            continue
        rec_of_code = np.repeat(
            np.arange(len(lengths), dtype=np.int64), lengths)
        dest = np.arange(total, dtype=np.int64) + gap * rec_of_code
        expanded = np.full(total + gap * max(0, len(lengths) - 1) + gap,
                           _encode.INVALID_CODE, np.uint8)
        expanded[dest] = all_codes
        for start in range(0, len(expanded) - gap, flat):
            row = expanded[start : start + width]
            if len(row) < width:
                row = np.concatenate(
                    [row,
                     np.full(width - len(row), _encode.INVALID_CODE,
                             np.uint8)]
                )
            yield row


def _prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` on a reader thread with a bounded queue: host-side file
    IO/packing overlaps the device's work on the previous batch (VERDICT r1
    item 4 "double buffering").  Exceptions propagate to the consumer."""
    import queue as _queue
    import threading as _threading

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    _END = object()
    stop = _threading.Event()

    def put_checked(item) -> bool:
        # bounded put with a stop check: if the consumer abandons iteration
        # (device error, KeyboardInterrupt), a plain q.put would block
        # forever and leak the thread + the open stream handle it holds
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def run():
        try:
            for item in it:
                if not put_checked(item):
                    return
            put_checked(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            put_checked(e)

    t = _threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
    finally:
        stop.set()
        if hasattr(it, "close"):
            # release the underlying stream promptly (generators holding
            # native handles); the thread exits on its next stop check
            try:
                t.join(timeout=5.0)
                it.close()
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass


def _packed_read_batches(path, k: int, flat: int) -> Iterator[np.ndarray]:
    """Pack read records into uint8[F + k - 1] arrays, separator-delimited.

    Dispatches to the vectorized native-parser path when available."""
    from .io import native as _native

    if _native.available():
        yield from _packed_read_batches_fast(path, k, flat)
        return
    _native.warn_python_fallback("_packed_read_batches")
    buf = np.full(flat + k - 1, _encode.INVALID_CODE, dtype=np.uint8)
    pos = 0
    step = flat - k + 1  # long records are split with k-1 overlap so every
    # window is hashed exactly once (piece i covers starts [i*step, ...))

    def pieces(codes):
        n = len(codes)
        if n <= flat:
            yield codes
        else:
            for a in range(0, n - k + 1, step):
                yield codes[a : a + flat]

    for _, codes in _reader.read_encoded(path):
        for piece in pieces(codes):
            n = len(piece)
            if pos + n + (k - 1 if pos else 0) > flat:
                yield buf
                buf = np.full(flat + k - 1, _encode.INVALID_CODE, dtype=np.uint8)
                pos = 0
            if pos:
                pos += k - 1  # separator gap: windows can't span records
            buf[pos : pos + n] = piece
            pos += n
    if pos:
        yield buf


def _hits_from_bitmap(flat_vals: np.ndarray, gid: np.ndarray,
                      acc: np.ndarray, n_genomes: int) -> np.ndarray:
    """Device bitmap → per-genome distinct-hit counts.

    The device join lower-bounds each survivor, so only the FIRST slot of an
    equal-value run (a hash shared by several genomes) gets marked;
    propagate marks across runs before counting.
    """
    hit_first = acc[:-1]
    hit_all = hit_first[_first_occ_idx(flat_vals)]
    return np.bincount(gid[hit_all], minlength=n_genomes).astype(np.int64)


def _first_occ_idx(flat_vals: np.ndarray) -> np.ndarray:
    """Index of the first slot of each equal-value run, per slot.

    Equivalent to np.searchsorted(flat_vals, flat_vals, "left") on sorted
    input, but via linear run-boundary passes instead of an n·log n
    self-search — the searchsorted form cost 71 s of the config-5-scale
    screen wall at 1.024G values (measured 2026-08-21)."""
    if len(flat_vals) == 0:
        return np.zeros(0, np.int64)
    newrun = np.concatenate([[True], flat_vals[1:] != flat_vals[:-1]])
    starts = np.flatnonzero(newrun)
    run_id = np.cumsum(newrun) - 1
    return starts[run_id]


def _hits_winner_takes_all(flat_vals: np.ndarray, gid: np.ndarray,
                           acc: np.ndarray, n_genomes: int,
                           sizes: Optional[np.ndarray] = None) -> np.ndarray:
    """Winner-takes-all hit attribution (the `mash screen -w` analog):
    each DISTINCT hit hash value is credited to exactly one genome — the
    genome with the highest plain containment among those whose sketch
    contains the value (ties → lower genome index), so shared hashes don't
    inflate every containing genome at once (Mash-family convention [K];
    reference source unavailable, SURVEY.md §0).

    sizes: per-genome sketch sizes — ranking is by containment hits/size
    (falls back to raw hit counts when omitted; identical when all sketches
    are full at s)."""
    if len(flat_vals) == 0:
        return np.zeros(n_genomes, np.int64)
    plain = _hits_from_bitmap(flat_vals, gid, acc, n_genomes)
    score = (plain / np.maximum(sizes, 1) if sizes is not None
             else plain.astype(np.float64))
    # rank genomes: better containment → smaller rank (ties → lower index)
    order = np.lexsort((np.arange(n_genomes), -score))
    rank = np.empty(n_genomes, np.int64)
    rank[order] = np.arange(n_genomes)
    # equal-value runs in the sorted flat DB; run is hit iff its first slot is
    starts = np.flatnonzero(
        np.concatenate([[True], flat_vals[1:] != flat_vals[:-1]]))
    run_min_rank = np.minimum.reduceat(rank[gid], starts)
    winners = order[run_min_rank[acc[:-1][starts]]]
    return np.bincount(winners, minlength=n_genomes).astype(np.int64)


def _screen_rows(index: SketchIndex, hits: np.ndarray,
                 read_card: Optional[float] = None) -> List[dict]:
    sizes = index.sizes()
    k = index.params.k
    pvals = None
    if read_card is not None:
        pvals = _oracle_compare.screen_p_value_vec(hits, sizes, read_card, k)
    out = []
    for g in range(len(index)):
        c = float(hits[g]) / float(sizes[g]) if sizes[g] > 0 else 0.0
        c_lo, c_hi = _oracle_compare.jaccard_ci(int(hits[g]), int(sizes[g]))
        row = {
            "reference": index.names[g],
            "hits": int(hits[g]),
            "sketch_size": int(sizes[g]),
            "containment": c,
            "containment_lo": c_lo,
            "containment_hi": c_hi,
            "ani": _oracle_compare.ani_from_containment(c, k),
        }
        if pvals is not None:
            row["p_value"] = float(pvals[g])
        out.append(row)
    return out


def _as_path_list(reads_path) -> List:
    import os as _os

    if isinstance(reads_path, (str, bytes, _os.PathLike)):
        return [reads_path]
    return list(reads_path)


def _screen_db_value_budget() -> int:
    """Max flat-DB values resident on device for one merge-join screen
    pass.

    The merge-join screen program costs ~38 B/value END TO END (measured
    r4: 515M values compiled to 19.9 GB — the [m+n] 4-plane sort and the
    log-doubling flag propagation hold several copies, not just the
    8 B/value planes; 1.03G values → 23 GB).  Budget from the unified
    helper (utils.hbm, ~10% of HBM in VALUES) so the whole program plus
    read batches stays well inside.  MIEKKI_SCREEN_DB_VALS overrides —
    and also caps the r5 grouped screen's group size (tests force tiny
    groups through it)."""
    env = os.environ.get("MIEKKI_SCREEN_DB_VALS")
    if env:
        return max(1, int(env))
    from .utils import hbm as _hbm

    return _hbm.screen_merge_value_budget()


@jax.jit
def _packbits_device(acc):
    # NOT jnp.packbits: its [n/8, 8] reshape gets a 16x TPU tile-padding
    # blowup (15.26 GB temp at 1.024G slots — OOM'd on the chip,
    # 2026-08-21).  Eight strided 1-D slices stay unpadded; byte layout
    # matches np.unpackbits (bitorder "big").
    n = acc.shape[0]
    n_pad = -(-n // 8) * 8
    a = jnp.zeros(n_pad, jnp.uint8).at[:n].set(acc.astype(jnp.uint8))
    word = jnp.zeros(n_pad // 8, jnp.uint8)
    for j in range(8):
        word = word | (a[j::8] << (7 - j))
    return word


def _pull_bitmap(acc) -> np.ndarray:
    """Device bool bitmap → host, transferred as PACKED BITS.

    Pulling the raw bool acc moves 1 B/slot through the ~30 MB/s
    device→host tunnel (34.6 s at config-5 scale, measured 2026-08-21);
    packbits on device moves 1 bit/slot (8x less) and np.unpackbits
    restores the exact array."""
    n = acc.shape[0]
    packed = np.asarray(_packbits_device(acc))
    return np.unpackbits(packed)[:n].astype(np.bool_)


def _screen_bitmap(index: SketchIndex, reads_path, flat: int,
                   stats: Optional[dict], kmv: Optional[list] = None):
    """Shared screen core: stream every read batch against the flat
    value-sorted DB, return (flat_vals, gid, hit-bitmap np.bool_).

    kmv: optional single-element list holding the (hi, lo) KMV state for
    the p-value column; updated in place per batch."""
    k = index.params.k
    flat_vals, gid = _flatten_db(index)
    if len(flat_vals) == 0:
        return flat_vals, gid, np.zeros(1, np.bool_)
    db_hi, db_lo = (jnp.asarray(x) for x in
                    ((flat_vals >> np.uint64(32)).astype(np.uint32),
                     (flat_vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    thr = flat_vals[-1]  # the largest sketch hash anywhere in the DB
    thr_hi = jnp.uint32(int(thr >> np.uint64(32)))
    thr_lo = jnp.uint32(int(thr & np.uint64(0xFFFFFFFF)))
    acc = jnp.zeros(len(flat_vals) + 1, dtype=jnp.bool_)
    counters = []  # device scalars; synced once at the end (tunnel-friendly)
    for path in _as_path_list(reads_path):
        # prefetch thread: file IO + numpy packing of batch t+1 overlap the
        # (asynchronously dispatched) device screen of batch t
        for batch in _prefetch(_packed_read_batches(path, k, flat)):
            dev_batch = jnp.asarray(batch)
            acc, n_valid, n_keep = _screen_update(
                acc, db_hi, db_lo, thr_hi, thr_lo, dev_batch, k,
                index.params.compact, _screen_chunk(), _screen_join())
            if kmv is not None:
                kmv[0] = _kmv_update(*kmv[0], dev_batch, k, _KMV_S0)
            counters.append((n_valid, n_keep))
    if stats is not None:
        tot_windows = sum(int(v) for v, _ in counters)
        tot_surv = sum(int(s_) for _, s_ in counters)
        stats.update(
            n_windows=tot_windows, n_survivors=tot_surv,
            n_batches=len(counters),
            survivor_rate=tot_surv / tot_windows if tot_windows else 0.0,
        )
    return flat_vals, gid, _pull_bitmap(acc)


def screen(
    index: SketchIndex, reads_path, flat: int = DEFAULT_READ_FLAT,
    winner: bool = False, stats: Optional[dict] = None,
    p_values: bool = False,
) -> List[dict]:
    """Containment of each DB genome's sketch in the read stream
    (SURVEY.md §3.3): c_g = |S(g) ∩ H(reads)| / |S(g)|.

    reads_path may be one file or a list of files (hits union across all).
    winner=True switches to winner-takes-all hit attribution (`mash screen
    -w` analog).  When `stats` is a dict, prefilter observability is
    written into it: n_windows, n_survivors, survivor_rate, n_batches.
    p_values=True adds a "p_value" column (the `mash screen` p-value
    analog): chance probability of >= hits under a binomial null with the
    read set's distinct-k-mer cardinality estimated by a bottom-s0 KMV
    state carried across batches (oracle.compare.screen_p_value_vec;
    multiplicity estimation is explicitly scoped out — see README).

    DBs whose flat planes exceed ~30% of HBM stream in GENOME SLABS
    (r4: the 102,400-genome config-5 DB OOM'd as one resident program):
    containment decomposes exactly by genome subsets, so plain rows are
    bit-identical to the unslabbed pass; winner mode merges the per-slab
    hit marks and arbitrates globally (also exact — a value's hit status
    is per-slab-consistent because every slab's prefilter threshold is
    that slab's own max).  Extra stats keys when slabbed: n_slabs, and
    n_windows/n_batches reflect ONE slab's read pass (the read stream is
    re-screened per slab; survivors are summed across slabs)."""
    total_vals = int(index.sizes().sum())
    budget = _screen_db_value_budget()
    kmv = [_kmv_init()] if p_values else None
    if total_vals > budget and len(index) > 1:
        return _screen_slabbed(index, reads_path, flat, winner, stats,
                               budget, kmv)
    flat_vals, gid, acc = _screen_bitmap(index, reads_path, flat, stats, kmv)
    read_card = _kmv_estimate(kmv[0]) if kmv else None
    if len(flat_vals) == 0:
        return _screen_rows(index, np.zeros(len(index), np.int64), read_card)
    if winner:
        hits = _hits_winner_takes_all(flat_vals, gid, acc, len(index),
                                      np.asarray(index.sizes()))
    else:
        hits = _hits_from_bitmap(flat_vals, gid, acc, len(index))
    return _screen_rows(index, hits, read_card)


def _screen_slabbed(index: SketchIndex, reads_path, flat: int, winner: bool,
                    stats: Optional[dict], budget: int,
                    kmv: Optional[list] = None) -> List[dict]:
    """Grouped hash-once screen for DBs beyond the merge-join budget
    (r5 redesign, VERDICT r4 #2 — replaces the slab-per-merge-pass form
    that re-read, re-hashed, and re-SORTED per slab per batch).

    The DB splits into contiguous genome GROUPS whose flat value-sorted
    planes + hit bitmap stay device-resident for a whole read pass.  The
    residency budget is utils.hbm.screen_resident_value_budget (~9 B/value
    resident vs the merge join's ~38 B/value program — a 16 GB chip holds
    ~1.07G values, the entire config-5 DB, in ONE group), overridable via
    MIEKKI_SCREEN_DB_VALS (tests force multi-group).  Per group the read
    stream is streamed once; each batch is hashed + value-sorted ONCE
    (_hash_sorted_batch) and joined by a chunked searchsorted probe of its
    survivor prefix (_screen_join_sorted) — the DB side is never sorted on
    device.  With G > 1 groups the stream is re-read per group: re-hashing
    on device is cheaper than caching hashes host-side (8 B/window to
    re-upload vs 1 B/base to re-read — docs/DESIGN.md r5).

    Rows are bit-identical to the one-pass screen: containment decomposes
    exactly by genome subsets; winner mode merges per-group hit marks and
    arbitrates globally.  Stats contract: n_windows/n_batches reflect one
    group's read pass, n_survivors sums across groups, n_slabs = group
    count.  Winner mode holds ~13 B/value host-side parts plus an argsort
    across groups (ADVICE r4) — bounded by the now-small group count.
    """
    k = index.params.k
    compact = index.params.compact
    sizes = index.sizes()
    from .utils import hbm as _hbm

    env = os.environ.get("MIEKKI_SCREEN_DB_VALS")
    resident = max(1, int(env)) if env else _hbm.screen_resident_value_budget()
    groups = []
    start, acc_v = 0, 0
    for i, v in enumerate(sizes):
        if acc_v + int(v) > resident and i > start:
            groups.append((start, i))
            start, acc_v = i, 0
        acc_v += int(v)
    groups.append((start, len(index)))
    hits = np.zeros(len(index), np.int64)
    win_parts = []
    agg: dict = {}
    chunk = _screen_chunk()
    kmv_done = False
    timings: dict = {"flatten_s": 0.0, "stream_s": 0.0, "acc_pull_s": 0.0,
                     "hits_s": 0.0}
    for i0, i1 in groups:
        t_ph = time.perf_counter()
        sub = SketchIndex(index.params, index.names[i0:i1],
                          index.hi[i0:i1], index.lo[i0:i1])
        flat_vals, gid = _flatten_db(sub)
        timings["flatten_s"] += time.perf_counter() - t_ph
        if len(flat_vals) == 0:
            continue
        t_ph = time.perf_counter()
        db_hi = jnp.asarray((flat_vals >> np.uint64(32)).astype(np.uint32))
        db_lo = jnp.asarray(
            (flat_vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        thr = flat_vals[-1]
        thr_hi = jnp.uint32(int(thr >> np.uint64(32)))
        thr_lo = jnp.uint32(int(thr & np.uint64(0xFFFFFFFF)))
        acc = jnp.zeros(len(flat_vals) + 1, dtype=jnp.bool_)
        counters = []
        for path in _as_path_list(reads_path):
            for batch in _prefetch(_packed_read_batches(path, k, flat)):
                dev_batch = jnp.asarray(batch)
                hh, hl, n_valid = _hash_sorted_batch(dev_batch, k, compact)
                acc, n_keep = _screen_join_sorted(
                    acc, db_hi, db_lo, thr_hi, thr_lo, hh, hl, chunk)
                if kmv is not None and not kmv_done:
                    # the KMV state is a property of the read stream alone:
                    # update it during the first streamed group only
                    kmv[0] = _kmv_update(*kmv[0], dev_batch, k, _KMV_S0)
                counters.append((n_valid, n_keep))
        kmv_done = True
        timings["stream_s"] += time.perf_counter() - t_ph
        if stats is not None:
            surv = sum(int(s_) for _, s_ in counters)
            if not agg:
                agg.update(
                    n_windows=sum(int(v_) for v_, _ in counters),
                    n_survivors=surv, n_batches=len(counters))
            else:
                agg["n_survivors"] += surv
        t_ph = time.perf_counter()
        acc_np = _pull_bitmap(acc)
        timings["acc_pull_s"] += time.perf_counter() - t_ph
        t_ph = time.perf_counter()
        if winner:
            # per-group hit marks propagated across equal-value runs;
            # global arbitration happens after the loop
            hit_first = acc_np[:-1]
            win_parts.append((flat_vals, gid + i0,
                              hit_first[_first_occ_idx(flat_vals)]))
        else:
            hits[i0:i1] = _hits_from_bitmap(flat_vals, gid, acc_np, i1 - i0)
        timings["hits_s"] += time.perf_counter() - t_ph
    if stats is not None and agg:
        agg["phase_seconds"] = {p: round(v, 1) for p, v in timings.items()}
        agg["n_slabs"] = len(groups)
        agg["survivor_rate"] = (agg["n_survivors"]
                                / (agg["n_windows"] * len(groups))
                                if agg.get("n_windows") else 0.0)
        stats.update(agg)
    if winner:
        if win_parts:
            vals = np.concatenate([v for v, _, _ in win_parts])
            gids = np.concatenate([g for _, g, _ in win_parts])
            hit_all = np.concatenate([h for _, _, h in win_parts])
            hits = _winner_from_hitall(vals, gids, hit_all, len(index),
                                       np.asarray(sizes))
    return _screen_rows(index, hits,
                        _kmv_estimate(kmv[0]) if kmv else None)


def _winner_from_hitall(vals: np.ndarray, gid: np.ndarray,
                        hit_all: np.ndarray, n_genomes: int,
                        sizes: np.ndarray) -> np.ndarray:
    """Winner-takes-all arbitration from per-slot hit marks (the slabbed
    analog of _hits_winner_takes_all, which derives the marks from a
    first-of-run bitmap; semantics and tie-breaks identical)."""
    order_v = np.argsort(vals, kind="stable")
    vals = vals[order_v]
    gid = gid[order_v]
    hit = hit_all[order_v]
    plain = np.bincount(gid[hit], minlength=n_genomes).astype(np.int64)
    score = plain / np.maximum(sizes, 1)
    order = np.lexsort((np.arange(n_genomes), -score))
    rank = np.empty(n_genomes, np.int64)
    rank[order] = np.arange(n_genomes)
    starts = np.flatnonzero(
        np.concatenate([[True], vals[1:] != vals[:-1]]))
    run_hit = hit[starts]  # marks are propagated across each run already
    run_min_rank = np.minimum.reduceat(rank[gid], starts)
    winners = order[run_min_rank[run_hit]]
    return np.bincount(winners, minlength=n_genomes).astype(np.int64)


# ---------------------------------------------------------------- output


def _dist_matrix(index: SketchIndex, tile: int = DEFAULT_TILE) -> np.ndarray:
    """Full symmetric [n, n] Mash-distance matrix (upper tiles computed,
    mirrored).  Vectorized: distances are evaluated once per unique
    (shared, union) combo per tile."""
    n = len(index)
    # [n, n] float64 is 800 MB at n=10k and 80 GB at n=100k; the matrix
    # TEXT formats are only sane well below that anyway.  Refuse early
    # with a pointer to the scalable artifact (VERDICT r3 weak #4).
    if n > 46_000:  # ~16 GB of float64
        raise ValueError(
            f"dist matrix for {n} genomes would need "
            f"{n * n * 8 / 1e9:.0f} GB; use dist --counts / "
            "dist_counts_matrix (int32 counts) or the row TSV instead")
    k, s = index.params.k, index.params.s
    mat = np.zeros((n, n), dtype=np.float64)
    m = np.int64(s + 1)
    for _, _, gi, gj, sh, un, _ in dist_tiles(index, tile=tile):
        code, inv = np.unique(sh.astype(np.int64) * m + un, return_inverse=True)
        u_j = np.where(code % m > 0,
                       (code // m) / np.where(code % m > 0, code % m, 1), 0.0)
        d = _oracle_compare.mash_distance_vec(u_j, k)[inv]
        mat[gi, gj] = d
        mat[gj, gi] = d
    return mat


def dist_matrix_text(index: SketchIndex, tile: int = DEFAULT_TILE) -> str:
    """Phylip-style square Mash-distance matrix (the `mash dist -t`
    analog).  Formatting is vectorized: each unique distance value is
    stringified once (VERDICT r1 weak #3 — no per-cell Python work)."""
    n = len(index)
    mat = _dist_matrix(index, tile=tile)
    u_vals, inv = np.unique(mat, return_inverse=True)
    u_strs = _fmt_unique_floats(u_vals)
    lines = [f"\t{n}"]
    inv = inv.reshape(n, n)
    for i in range(n):
        lines.append(index.names[i] + "\t" + "\t".join(u_strs[inv[i]].tolist()))
    return "\n".join(lines) + "\n"


def dist_triangle_text(index: SketchIndex, tile: int = DEFAULT_TILE) -> str:
    """Lower-triangular Phylip matrix (the `mash triangle` analog): first
    line is the genome count, then row i carries the name and distances to
    genomes 0..i-1 only — half the output of the square form and the
    conventional input to neighbor-joining tree builders."""
    n = len(index)
    mat = _dist_matrix(index, tile=tile)
    u_vals, inv = np.unique(mat, return_inverse=True)
    u_strs = _fmt_unique_floats(u_vals)
    inv = inv.reshape(n, n)
    lines = [f"\t{n}"]
    for i in range(n):
        row = u_strs[inv[i, :i]].tolist()
        lines.append("\t".join([index.names[i]] + row))
    return "\n".join(lines) + "\n"


def rows_to_tsv(rows: Sequence[dict], columns: Sequence[str] = TSV_COLUMNS) -> str:
    """Deterministic TSV (floats repr'd via %.6f-independent repr: full %r)."""
    lines = ["#" + "\t".join(columns)]
    for r in rows:
        cells = []
        for c in columns:
            v = r[c]
            cells.append(f"{v:.10g}" if isinstance(v, float) else str(v))
        lines.append("\t".join(cells))
    return "\n".join(lines) + "\n"
