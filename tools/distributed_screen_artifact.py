"""Distributed-screen artifact (VERDICT r3 #5 / BASELINE config 4 at host
scale): 10M FASTQ reads screened against a 1k-genome sketch DB through
`parallel.screen_sharded` on the faked 8-device CPU mesh, in BOTH layouts:

  * 1-D ``data`` mesh — reads sharded, flat DB replicated;
  * 2-D ``data`` x ``db`` mesh — reads sharded AND the flat DB value-sharded
    (the pod layout where the DB exceeds one chip's HBM).

Rows must be bit-identical to single-device `engine.screen` (the config-4
production path).  Writes artifacts/distributed_screen.jsonl (one JSON line
per layout with timings + equality verdicts).

Run: nohup timeout 7200 python tools/distributed_screen_artifact.py &
(CPU-only; ~20-60 min depending on host contention.)
Scale knobs: --reads (default 10M), --genomes (default 1000).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_reads_fastq(path, genomes, n_reads, read_len, rng):
    """10M-read FASTQ written in bulk (per-record Python would take
    minutes): sample (genome, offset) pairs, slice with stride tricks,
    emit in ~64k-record chunks."""
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    qual = b"I" * read_len
    chunk = 1 << 16
    with open(path, "wb") as f:
        done = 0
        while done < n_reads:
            c = min(chunk, n_reads - done)
            gsel = rng.integers(0, len(genomes), c)
            lines = []
            for gi in np.unique(gsel):
                g = genomes[gi]
                offs = rng.integers(0, len(g) - read_len,
                                    int((gsel == gi).sum()))
                win = np.lib.stride_tricks.sliding_window_view(
                    g, read_len)[offs]
                seqs = ACGT[win]
                for r, row in enumerate(seqs):
                    lines.append(b"@r%d_%d\n" % (gi, done + r))
                    lines.append(row.tobytes())
                    lines.append(b"\n+\n")
                    lines.append(qual)
                    lines.append(b"\n")
            f.write(b"".join(lines))
            done += c
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=1000)
    ap.add_argument("--s", type=int, default=1000)
    ap.add_argument("--genome-len", type=int, default=100_000)
    ap.add_argument("--reads", type=int, default=10_000_000)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--workdir", default="/tmp/miekki_dscreen")
    ap.add_argument("--out", default="artifacts/distributed_screen.jsonl")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from miekki_tpu import engine
    from miekki_tpu.params import SketchParams
    from miekki_tpu.parallel import local_mesh, screen_sharded
    from miekki_tpu.parallel.mesh import DATA_AXIS, DB_AXIS

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(17)
    k = 21
    params = SketchParams(k=k, s=args.s)
    t_all = time.time()

    print(f"[dscreen] generating {args.genomes} genomes "
          f"({args.genome_len} bases)", flush=True)
    genomes = [rng.integers(0, 4, args.genome_len).astype(np.uint8)
               for _ in range(args.genomes)]
    fa = os.path.join(args.workdir, "db.fa")
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    with open(fa, "wb") as f:
        for i, g in enumerate(genomes):
            f.write(b">g%d\n" % i)
            f.write(ACGT[g].tobytes())
            f.write(b"\n")
    t0 = time.time()
    idx = engine.build_index_per_record([fa], params)
    t_sketch = time.time() - t0
    print(f"[dscreen] sketched {len(idx)} genomes in {t_sketch:.0f}s",
          flush=True)

    fq = os.path.join(args.workdir, "reads.fq")
    if not os.path.exists(fq):
        t0 = time.time()
        write_reads_fastq(fq, genomes[:32], args.reads, args.read_len, rng)
        print(f"[dscreen] wrote {args.reads} reads in {time.time()-t0:.0f}s "
              f"({os.path.getsize(fq)/1e9:.1f} GB)", flush=True)

    results = []

    t0 = time.time()
    ref_rows = engine.screen(idx, [fq])
    t_ref = time.time() - t0
    gbase = args.reads * args.read_len / 1e9
    print(f"[dscreen] single-device screen: {t_ref:.0f}s "
          f"({gbase/t_ref:.3f} Gbase/s)", flush=True)
    results.append({"layout": "single_device", "seconds": round(t_ref, 1),
                    "reads": args.reads, "genomes": len(idx),
                    "gbase_per_s": round(gbase / t_ref, 4)})

    for layout, mesh_kw in (
        ("data_1d", dict(axis_names=(DATA_AXIS,))),
        ("data_x_db_2d", dict(shape=(4, 2), axis_names=(DATA_AXIS, DB_AXIS))),
    ):
        mesh = local_mesh(**mesh_kw)
        kw = {"db_axis": DB_AXIS} if layout == "data_x_db_2d" else {}
        t0 = time.time()
        rows = screen_sharded(idx, fq, mesh, **kw)
        dt = time.time() - t0
        identical = rows == ref_rows
        print(f"[dscreen] {layout}: {dt:.0f}s identical={identical}",
              flush=True)
        results.append({"layout": layout, "seconds": round(dt, 1),
                        "mesh": dict(mesh.shape),
                        "rows_bit_identical": bool(identical)})

    ok = all(r.get("rows_bit_identical", True) for r in results)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        for r in results:
            r["pass"] = bool(ok)
            f.write(json.dumps(r) + "\n")
    print(json.dumps({"pass": ok,
                      "total_seconds": round(time.time() - t_all, 1)}),
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
