"""Command-line interface (component C10, SURVEY.md §2) in the Mash idiom:

  python -m miekki_tpu.cli sketch  <genomes...> -o db.npz  [-k 31] [-s 10000]
                                   [--per-record] [--shards N] [-l|--list]
                                   [-m N] [--compress]
  python -m miekki_tpu.cli dist    <db.npz|shards...|genomes...>
                                   [--ref db2.npz] -o out.tsv
                                   [--distributed [--counts c.npz]]
                                   [--manifest m.jsonl] [--matrix]
                                   [--containment] [--bounds]
                                   [--max-dist D] [--max-p P]
  python -m miekki_tpu.cli screen  <db.npz> <reads.fq[.gz]...> -o out.tsv
                                   [--distributed]
  python -m miekki_tpu.cli triangle <db.npz|genomes...> -o out.phylip
  python -m miekki_tpu.cli info    <db.npz> [--dump]
  python -m miekki_tpu.cli merge   <dbs...> -o merged.npz
  python -m miekki_tpu.cli compress <db.npz> -o db32.npz

Mash-command mapping: sketch≈`mash sketch` (`--per-record`≈`-i`,
`-m`≈`-m`, `--list`≈`-l`), dist≈`mash dist` (`--matrix`≈`-t`,
`--max-dist`≈`-d`, `--max-p`≈`-v`, `--bounds`≈`mash bounds`),
screen≈`mash screen` (`-w`≈`-w`), triangle≈`mash triangle`,
info≈`mash info` (`--dump`≈`-d`), merge≈`mash paste`; compress has no
Mash analog (32-bit compact fingerprints, ops/compact.py).

Inputs ending in .npz are loaded as sketch indexes (several = per-host
shards); anything else is treated as a FASTA/FASTQ(.gz) genome file and
sketched on the fly.  `--profile DIR` wraps the run in a jax.profiler trace
(SURVEY.md §5 "Tracing / profiling"); `--metrics FILE` appends phase
metrics JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from . import engine
from .index.store import SketchIndex
from .params import SketchParams
from .utils import metrics as _metrics


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("-k", type=int, default=31, help="k-mer length (default 31)")
    p.add_argument("-s", type=int, default=10_000, help="sketch size (default 10000)")
    p.add_argument("--chunk", type=int, default=engine.DEFAULT_CHUNK,
                   help="bases per device hashing step")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace to DIR")
    p.add_argument("--metrics", metavar="FILE", default=None,
                   help="write phase metrics JSON to FILE")


def _is_index_file(path) -> bool:
    """An index file is an npz (zip) archive; sequence files are FASTA/
    FASTQ or gzip.  Content sniffing, not extension: `sketch -o db.msk`
    must round-trip through `dist db.msk` regardless of suffix."""
    try:
        with open(path, "rb") as f:
            return f.read(4) == b"PK\x03\x04"
    except OSError:
        return False


def _load_or_build(paths, args) -> SketchIndex:
    paths = _expand_lists(paths, getattr(args, "list", False))
    idx = [p for p in paths if str(p).endswith(".npz") or _is_index_file(p)]
    if idx and len(idx) == len(paths):
        if len(paths) == 1:
            return SketchIndex.load(paths[0])
        return SketchIndex.load_sharded(paths)  # per-host DB shards
    if idx:
        raise SystemExit(
            "inputs mix sketch index files and sequence files: "
            f"{[str(p) for p in idx]} are indexes; pass either all indexes "
            "or all FASTA/FASTQ")
    params = SketchParams(k=args.k, s=args.s)
    return engine.build_index(paths, params, chunk=args.chunk)


def _out(args):
    """Output handle usable in a `with` block.  stdout is wrapped in a
    nullcontext so `with _out(args)` never closes sys.stdout — closing it
    breaks in-process callers that invoke cli.main() more than once
    (regression caught by tests/test_cli.py round 3)."""
    if args.output != "-":
        return open(args.output, "w")
    import contextlib

    return contextlib.nullcontext(sys.stdout)


def _expand_lists(paths, list_mode: bool):
    """mash -l analog: with --list, each input is a text file of paths
    (one per line, blanks/# comments skipped) — at 100k-genome scale the
    argv limit makes direct listing impossible."""
    if not list_mode:
        return paths
    out = []
    for lf in paths:
        with open(lf) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    out.append(line)
    if not out:
        raise SystemExit(f"--list files named no inputs: {paths}")
    return out


def cmd_sketch(args) -> int:
    args.genomes = _expand_lists(args.genomes, args.list)
    params = SketchParams(k=args.k, s=args.s)
    t0 = time.perf_counter()
    if args.per_record:
        index = engine.build_index_per_record(args.genomes, params,
                                              chunk=args.chunk,
                                              min_copies=args.min_copies)
    else:
        index = engine.build_index(args.genomes, params, chunk=args.chunk,
                                   min_copies=args.min_copies)
    dt = time.perf_counter() - t0
    if args.compress:
        index = index.to_compact()
    if args.shards > 1:
        paths = index.save_sharded(args.output.removesuffix(".npz"), args.shards)
        print(f"wrote {len(paths)} shards", file=sys.stderr)
    else:
        index.save(args.output)
    total = int(index.sizes().sum())
    _metrics.emit(args.metrics, phase="sketch", genomes=len(index),
                  sketch_hashes=total, seconds=dt)
    print(f"sketched {len(index)} genomes (k={params.k}, s={params.s}) "
          f"in {dt:.2f}s -> {args.output}", file=sys.stderr)
    return 0


def cmd_dist(args) -> int:
    index_a = _load_or_build(args.query, args)
    index_b = SketchIndex.load(args.ref) if args.ref else None
    cols = engine.select_columns(args.containment, args.bounds)
    t0 = time.perf_counter()
    if args.matrix:
        # Distance-matrix output has no per-pair rows; row-level flags are
        # meaningless here — refuse rather than silently drop them.
        if index_b is not None:
            print("dist: --matrix is self-all-vs-all only", file=sys.stderr)
            return 2
        if (args.containment or args.bounds or args.max_dist is not None
                or args.max_p is not None):
            print("dist: --matrix excludes --containment/--bounds/"
                  "--max-dist/--max-p", file=sys.stderr)
            return 2
        text = engine.dist_matrix_text(index_a, tile=args.tile)
        dt = time.perf_counter() - t0
        with _out(args) as f:
            f.write(text)
        _metrics.emit(args.metrics, phase="dist", seconds=dt, matrix=True)
        print(f"wrote {len(index_a)}x{len(index_a)} matrix in {dt:.2f}s",
              file=sys.stderr)
        return 0
    if args.distributed:
        import numpy as np

        from .parallel import dist_sharded, local_mesh

        counts = dist_sharded(index_a, local_mesh(), index_b=index_b)
        if args.counts:
            # pod-scale output: raw count matrices (a TSV with N² formatted
            # rows is the wrong artifact at 10k+ genomes)
            idx_b = index_b if index_b is not None else index_a
            np.savez_compressed(
                args.counts,
                shared=counts["shared"], union=counts["union"],
                inter=counts["inter"],
                k=index_a.params.k, s=index_a.params.s,
                query_names=np.array(index_a.names),
                reference_names=np.array(idx_b.names),
            )
            dt = time.perf_counter() - t0
            _metrics.emit(args.metrics, phase="dist", seconds=dt,
                          pairs=int(counts["shared"].size), distributed=True)
            print(f"wrote count matrices {counts['shared'].shape} "
                  f"in {dt:.2f}s -> {args.counts}", file=sys.stderr)
            return 0
        with _out(args) as f:
            n = engine.counts_tsv_write(
                f, index_a, counts["shared"], counts["union"], index_b,
                inter=counts["inter"], columns=cols,
                max_dist=args.max_dist, max_p=args.max_p,
            )
        dt = time.perf_counter() - t0
        _metrics.emit(args.metrics, phase="dist", pairs=n, seconds=dt,
                      pairs_per_s=n / dt if dt > 0 else 0.0,
                      distributed=True)
        print(f"compared {n} pairs on the device mesh in {dt:.2f}s",
              file=sys.stderr)
        return 0
    if args.counts:
        # Single-device bulk path (r4): raw count matrices through
        # dist_counts_matrix — pipelined dispatches, deferred ambiguity
        # resolution, device-resident planes when the index was just
        # built in-process.  Same artifact format as --distributed
        # --counts.
        import numpy as np

        counts = engine.dist_counts_matrix(index_a, index_b, tile=args.tile)
        idx_b = index_b if index_b is not None else index_a
        np.savez_compressed(
            args.counts,
            shared=counts["shared"], union=counts["union"],
            inter=counts["inter"],
            k=index_a.params.k, s=index_a.params.s,
            query_names=np.array(index_a.names),
            reference_names=np.array(idx_b.names),
        )
        dt = time.perf_counter() - t0
        _metrics.emit(args.metrics, phase="dist", seconds=dt,
                      pairs=int(counts["shared"].size))
        print(f"wrote count matrices {counts['shared'].shape} "
              f"in {dt:.2f}s -> {args.counts}", file=sys.stderr)
        return 0
    if args.manifest:
        if args.output == "-":
            print("dist: --manifest requires -o FILE", file=sys.stderr)
            return 2
        n = engine.dist_resumable(index_a, args.output, args.manifest,
                                  index_b, tile=args.tile, columns=cols,
                                  max_dist=args.max_dist, max_p=args.max_p,
                                  bounds=args.bounds)
        dt = time.perf_counter() - t0
        _metrics.emit(args.metrics, phase="dist", pairs=n, seconds=dt,
                      pairs_per_s=n / dt if dt > 0 else 0.0)
        print(f"compared {n} new pairs in {dt:.2f}s (resumable via "
              f"{args.manifest})", file=sys.stderr)
        return 0
    with _out(args) as f:
        n = engine.dist_tsv_write(f, index_a, index_b, tile=args.tile,
                                  columns=cols, max_dist=args.max_dist,
                                  max_p=args.max_p)
    dt = time.perf_counter() - t0
    _metrics.emit(args.metrics, phase="dist", pairs=n, seconds=dt,
                  pairs_per_s=n / dt if dt > 0 else 0.0)
    print(f"compared {n} pairs in {dt:.2f}s", file=sys.stderr)
    return 0


def cmd_screen(args) -> int:
    index = SketchIndex.load(args.db)
    t0 = time.perf_counter()
    stats: dict = {}
    if args.distributed:
        from .parallel import local_mesh, screen_sharded
        from .parallel.mesh import DATA_AXIS

        rows = screen_sharded(index, args.reads,
                              local_mesh(axis_names=(DATA_AXIS,)),
                              flat=args.flat, winner=args.winner, stats=stats,
                              p_values=args.p_values)
    else:
        rows = engine.screen(index, args.reads, flat=args.flat,
                             winner=args.winner, stats=stats,
                             p_values=args.p_values)
    dt = time.perf_counter() - t0
    cols = ("reference", "hits", "sketch_size", "containment",
            "containment_lo", "containment_hi", "ani")
    if args.p_values:
        cols = cols + ("p_value",)
    with _out(args) as f:
        f.write(engine.rows_to_tsv(rows, columns=cols))
    _metrics.emit(args.metrics, phase="screen", genomes=len(rows), seconds=dt,
                  **stats)
    print(f"screened reads against {len(rows)} genomes in {dt:.2f}s",
          file=sys.stderr)
    return 0


def cmd_triangle(args) -> int:
    """Lower-triangular Phylip distance matrix (the `mash triangle` analog)."""
    index = _load_or_build(args.query, args)
    t0 = time.perf_counter()
    text = engine.dist_triangle_text(index, tile=args.tile)
    dt = time.perf_counter() - t0
    with _out(args) as f:
        f.write(text)
    _metrics.emit(args.metrics, phase="triangle", genomes=len(index),
                  seconds=dt)
    print(f"wrote {len(index)}-genome lower-triangular matrix in {dt:.2f}s",
          file=sys.stderr)
    return 0


def cmd_info(args) -> int:
    index = SketchIndex.load(args.db)
    if args.dump:
        # mash info -d analog: full sketch contents as JSON
        print(json.dumps({
            "params": index.params.to_dict(),
            "sketches": [
                {"name": index.names[i],
                 "hashes": [int(h) for h in index.sketch_u64(i)]}
                for i in range(len(index))
            ],
        }))
        return 0
    card = index.cardinalities()
    print(json.dumps({
        "genomes": len(index),
        "params": index.params.to_dict(),
        "sketch_sizes": {"min": int(index.sizes().min()) if len(index) else 0,
                         "max": int(index.sizes().max()) if len(index) else 0},
        "est_distinct_kmers": {
            "min": int(card.min()) if len(index) else 0,
            "max": int(card.max()) if len(index) else 0,
        },
        "names": index.names[:10] + (["..."] if len(index) > 10 else []),
    }, indent=2))
    return 0


def cmd_merge(args) -> int:
    """Concatenate sketch indexes (the `mash paste` analog)."""
    parts = [SketchIndex.load(p) for p in args.inputs]
    import numpy as np

    base = parts[0]
    for p in parts[1:]:
        base.params.validate_compatible(p.params)
    merged = SketchIndex(
        base.params,
        [n for p in parts for n in p.names],
        np.concatenate([p.hi for p in parts]),
        np.concatenate([p.lo for p in parts]),
    )
    merged.save(args.output)
    print(f"merged {len(parts)} indexes -> {len(merged)} genomes",
          file=sys.stderr)
    return 0


def cmd_compress(args) -> int:
    """Convert a raw index to 32-bit compact fingerprints (ops/compact.py:
    monotone float-like codes, HyperMinHash-style — PAPERS.md).  Halves the
    index file; jaccard/containment gain a ~3e-4 collision bias.  Compact
    and raw indexes are incomparable (params keyed)."""
    index = SketchIndex.load(args.db)
    if index.params.compact:
        print("index is already compact", file=sys.stderr)
        return 1
    index.to_compact().save(args.output)
    import os

    print(f"compressed {len(index)} genomes: "
          f"{os.path.getsize(args.db)} -> {os.path.getsize(args.output)} "
          f"bytes -> {args.output}", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    from . import __version__

    ap = argparse.ArgumentParser(prog="miekki-tpu", description=__doc__)
    ap.add_argument("--version", action="version",
                    version=f"miekki-tpu {__version__}")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("sketch", help="sketch genomes into an index file")
    p.add_argument("genomes", nargs="+")
    p.add_argument("-l", "--list", action="store_true",
                   help="inputs are text files listing genome paths, one "
                   "per line (mash -l analog; avoids argv limits at "
                   "100k-genome scale)")
    p.add_argument("-o", "--output", required=True, help="output index (.npz)")
    p.add_argument("--shards", type=int, default=1,
                   help="split the index into N per-host shard files")
    p.add_argument("--per-record", action="store_true",
                   help="sketch each FASTA/FASTQ record separately "
                   "(mash sketch -i analog)")
    p.add_argument("-m", "--min-copies", type=int, default=1,
                   help="keep only k-mers occurring at least this many times "
                   "— drops sequencing-error k-mers in read sets "
                   "(mash sketch -m analog)")
    p.add_argument("--compress", action="store_true",
                   help="store 32-bit compact fingerprints (half size, "
                   "~3e-4 jaccard bias; see the compress subcommand)")
    _add_common(p)
    p.set_defaults(fn=cmd_sketch)

    p = sub.add_parser("dist", help="pairwise Mash distances")
    p.add_argument("query", nargs="+", help="index (.npz) or genome files")
    p.add_argument("-l", "--list", action="store_true",
                   help="query inputs are text files listing paths (mash -l)")
    p.add_argument("--ref", default=None, help="reference index (.npz); "
                   "default: all-vs-all on the query set")
    p.add_argument("-o", "--output", default="-", help="output TSV (default stdout)")
    p.add_argument("--tile", type=int, default=engine.DEFAULT_TILE)
    p.add_argument("--manifest", default=None, metavar="FILE",
                   help="JSONL tile manifest enabling checkpoint/resume of "
                   "the comparison (rerun with the same args to continue)")
    p.add_argument("--distributed", action="store_true",
                   help="shard the DB across all visible devices and run the "
                   "ppermute-ring all-vs-all")
    p.add_argument("--matrix", action="store_true",
                   help="write a Phylip-style square distance matrix "
                   "(mash dist -t analog)")
    p.add_argument("--counts", metavar="FILE", default=None,
                   help="write raw shared/union/inter count matrices to "
                   "FILE (.npz) instead of a TSV — the right artifact at "
                   "10k+ genomes (single-device runs use the pipelined "
                   "bulk path; with --distributed, the sharded ring)")
    p.add_argument("--containment", action="store_true",
                   help="add containment_q/containment_r/ani_containment "
                   "columns (BinDash-style sketch containment)")
    p.add_argument("--max-dist", type=float, default=None, metavar="D",
                   help="only output pairs with mash_distance <= D "
                   "(mash dist -d analog)")
    p.add_argument("--max-p", type=float, default=None, metavar="P",
                   help="only output pairs with p_value <= P "
                   "(mash dist -v analog)")
    p.add_argument("--bounds", action="store_true",
                   help="add 95%% Wilson interval columns for jaccard and "
                   "distance (mash bounds analog)")
    _add_common(p)
    p.set_defaults(fn=cmd_dist)

    p = sub.add_parser("screen", help="containment of DB genomes in a read set")
    p.add_argument("db", help="sketch index (.npz)")
    p.add_argument("reads", nargs="+", help="FASTA/FASTQ(.gz) read file(s)")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--flat", type=int, default=engine.DEFAULT_READ_FLAT,
                   help="packed bases per screening batch")
    p.add_argument("--distributed", action="store_true",
                   help="stream read batches data-parallel across all "
                   "visible devices (pmax bitmap merge)")
    p.add_argument("-w", "--winner", action="store_true",
                   help="winner-takes-all: credit each distinct hit hash to "
                   "only its best-containment genome (mash screen -w analog)")
    p.add_argument("-p", "--p-values", action="store_true",
                   help="add a p_value column: chance probability of >= hits "
                   "under a binomial null with the read set's distinct-k-mer "
                   "cardinality (KMV-estimated over the stream)")
    _add_common(p)
    p.set_defaults(fn=cmd_screen)

    p = sub.add_parser("triangle", help="lower-triangular Phylip distance "
                       "matrix (mash triangle analog)")
    p.add_argument("query", nargs="+", help="index (.npz) or genome files")
    p.add_argument("-l", "--list", action="store_true",
                   help="query inputs are text files listing paths (mash -l)")
    p.add_argument("-o", "--output", default="-",
                   help="output file (default stdout)")
    p.add_argument("--tile", type=int, default=engine.DEFAULT_TILE)
    _add_common(p)
    p.set_defaults(fn=cmd_triangle)

    p = sub.add_parser("info", help="describe a sketch index")
    p.add_argument("db")
    p.add_argument("-d", "--dump", action="store_true",
                   help="dump full sketch hashes as JSON (mash info -d)")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("compress", help="convert an index to 32-bit compact "
                       "fingerprints (half size, ~3e-4 jaccard bias)")
    p.add_argument("db")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_compress)

    p = sub.add_parser("merge", help="concatenate sketch indexes "
                       "(mash paste analog)")
    p.add_argument("inputs", nargs="+", help="input indexes (.npz)")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_merge)
    return ap


def main(argv=None) -> int:
    from .utils import compile_cache

    compile_cache.enable()
    args = build_parser().parse_args(argv)
    if getattr(args, "profile", None):
        import jax

        with jax.profiler.trace(args.profile):
            return args.fn(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
