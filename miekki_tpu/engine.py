"""High-level engine: sketch / dist / screen (layer L7, SURVEY.md §1).

Single-process orchestration of the device pipeline; the multi-host versions
of `dist` and `screen` live in miekki_tpu.parallel.  Float estimators are
computed on the host in float64 with the oracle's exact formulas
(miekki_tpu.oracle.compare), from exact integer counts produced on device —
distance tables are therefore bitwise-reproducible across backends
(SURVEY.md §4 integration rows).
"""

from __future__ import annotations

import itertools
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
DEFAULT_TILE = 128       # genomes per side of an all-vs-all tile
DEFAULT_READ_FLAT = 1 << 18  # packed read bases per screening batch

TSV_COLUMNS = (
    "query",
    "reference",
    "shared",
    "union",
    "jaccard",
    "mash_distance",
    "ani",
)


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


def build_index(
    paths: Sequence, params: SketchParams, names: Optional[Sequence[str]] = None,
    chunk: int = DEFAULT_CHUNK,
) -> SketchIndex:
    """Sketch many genome files into an index (one genome per file)."""
    sketches = [sketch_file(p, params, chunk) for p in paths]
    if names is None:
        names = [str(p) for p in paths]
    return SketchIndex.from_sketches(sketches, list(names), params)


# ---------------------------------------------------------------- distances


def _row_from_counts(shared: int, union: int, k: int) -> dict:
    j = shared / union if union > 0 else 0.0
    d = _oracle_compare.mash_distance(j, k)
    return {
        "shared": shared,
        "union": union,
        "jaccard": j,
        "mash_distance": d,
        "ani": _oracle_compare.ani_from_distance(d),
    }


def _pad_rows(idx: SketchIndex, tile: int):
    """Pad the [N, s] planes to a multiple of `tile` with INF rows."""
    n = len(idx)
    n_pad = -(-n // tile) * tile
    hi = np.full((n_pad, idx.params.s), 0xFFFFFFFF, dtype=np.uint32)
    lo = np.full((n_pad, idx.params.s), 0xFFFFFFFF, dtype=np.uint32)
    hi[:n], lo[:n] = idx.hi, idx.lo
    return hi, lo, n


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
    yielded.
    """
    self_compare = index_b is None
    if index_b is not None:
        index_a.params.validate_compatible(index_b.params)
    idx_b = index_a if self_compare else index_b
    s, k = index_a.params.s, index_a.params.k
    tile = min(tile, max(len(index_a), len(idx_b), 1))

    a_hi, a_lo, n_a = _pad_rows(index_a, tile)
    b_hi, b_lo, n_b = _pad_rows(idx_b, tile)
    nb_a, nb_b = a_hi.shape[0] // tile, b_hi.shape[0] // tile

    for bi in range(nb_a):
        for bj in range(nb_b):
            if self_compare and bj < bi:
                continue
            if skip_tiles and (bi, bj) in skip_tiles:
                continue
            rows = (
                jnp.asarray(a_hi[bi * tile : (bi + 1) * tile]),
                jnp.asarray(a_lo[bi * tile : (bi + 1) * tile]),
            )
            cols = (
                jnp.asarray(b_hi[bj * tile : (bj + 1) * tile]),
                jnp.asarray(b_lo[bj * tile : (bj + 1) * tile]),
            )
            counts = _intersect.tile_counts(rows, cols, s)
            shared = np.asarray(counts["shared_in_x"])
            union = np.asarray(counts["union_size"])
            for ti, tj in itertools.product(range(tile), range(tile)):
                gi, gj = bi * tile + ti, bj * tile + tj
                if gi >= n_a or gj >= n_b:
                    continue
                if self_compare and gj <= gi:
                    continue
                row = _row_from_counts(int(shared[ti, tj]), int(union[ti, tj]), k)
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


def dist_resumable(
    index_a: SketchIndex,
    out_path,
    manifest_path,
    index_b: Optional[SketchIndex] = None,
    tile: int = DEFAULT_TILE,
    columns: Sequence[str] = TSV_COLUMNS,
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
    n_rows = 0
    with open(out_path, "w" if fresh else "a") as out, open(
        manifest_path, "w" if fresh else "a"
    ) as mf:
        if fresh:
            out.write("#" + "\t".join(columns) + "\n")

        pending: List[dict] = []

        def on_tile_done(tile_coord):
            nonlocal n_rows
            for r in pending:
                cells = [
                    f"{r[c]:.10g}" if isinstance(r[c], float) else str(r[c])
                    for c in columns
                ]
                out.write("\t".join(cells) + "\n")
            n_rows += len(pending)
            pending.clear()
            out.flush()
            mf.write(_json.dumps({"bi": tile_coord[0], "bj": tile_coord[1]}) + "\n")
            mf.flush()

        for row in dist_iter(
            index_a, index_b, tile, skip_tiles=done, on_tile_done=on_tile_done
        ):
            pending.append(row)
    return n_rows


# ---------------------------------------------------------------- screening


@partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _screen_update(acc, db_hi, db_lo, flat_codes, k: int):
    """One screening step: OR in which DB sketch hashes occur in this batch.

    acc: bool[N, s] — sketch hashes seen so far in the read stream.
    flat_codes: int32[F + k - 1] packed read batch (separator-delimited).
    """
    h, _ = _hash.hash_windows(flat_codes, k)
    hay = u64.sort(h)  # INF-masked invalids sort to the end
    hit = jax.vmap(
        lambda r0, r1: _intersect.member_u64((hay[0], hay[1]), (r0, r1))
    )(db_hi, db_lo)
    return acc | hit


def _packed_read_batches(path, k: int, flat: int) -> Iterator[np.ndarray]:
    """Pack read records into int32[F + k - 1] arrays, separator-delimited."""
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


def screen(
    index: SketchIndex, reads_path, flat: int = DEFAULT_READ_FLAT
) -> List[dict]:
    """Containment of each DB genome's sketch in the read stream
    (SURVEY.md §3.3): c_g = |S(g) ∩ H(reads)| / |S(g)|."""
    k, s = index.params.k, index.params.s
    db_hi, db_lo = jnp.asarray(index.hi), jnp.asarray(index.lo)
    acc = jnp.zeros((len(index), s), dtype=jnp.bool_)
    for batch in _packed_read_batches(reads_path, k, flat):
        acc = _screen_update(acc, db_hi, db_lo, jnp.asarray(batch), k)
    hits = np.asarray(jnp.sum(acc, axis=-1))
    sizes = index.sizes()
    out = []
    for g in range(len(index)):
        c = float(hits[g]) / float(sizes[g]) if sizes[g] > 0 else 0.0
        out.append(
            {
                "reference": index.names[g],
                "hits": int(hits[g]),
                "sketch_size": int(sizes[g]),
                "containment": c,
                "ani": _oracle_compare.ani_from_containment(c, k),
            }
        )
    return out


# ---------------------------------------------------------------- output


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
