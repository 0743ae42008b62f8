"""Realistic-genome FILE→INDEX ingest evidence (VERDICT r4 #1a).

Sketches N multi-Mbp gzipped FASTA files (default 500 x 4.6 Mbp ≈ 2.3
Gbase — the RefSeq-bacteria workload shape of BASELINE configs 3/5,
150x the 30 kb toys of the r4 scale artifacts) through the production
`build_index` path from FILES ON DISK, and reports wall-clock Gbase/s
per stage:

- parse:   threaded native C++ parse + 2-bit encode + record packing
           (io/native.cpp; the r5 loader race fix made the pool actually
           use it)
- device:  base-5 packed upload (3 codes/byte, r5) + the vmapped device
           sketch pipeline
- total:   file→index including everything

Honest-analysis fields record where the platform caps each stage: this
machine's host→device tunnel moves ~25 MB/s (measured r4), so the
end-to-end number here is tunnel-bound by construction; the artifact
separately reports the host parse rate (the real-host ceiling for
gzipped input: single-stream zlib inflate ~200 Mbase/s/core, files
parallelized across cores) and the device sketch rate (bench.py,
~2.1 Gbase/s on this chip), which is what a PCIe-attached host would
see.  Generation note: files cycle a pool of --unique distinct genomes
(gzip-compressing 2.3 GB of unique sequence would dominate tool wall;
parse cost per file is content-shape-identical).

Correctness: two sampled genomes' sketches verified bitwise vs the
numpy oracle.

Run: nohup python tools/ingest_realistic.py &   (TPU; ~10-20 min)
     JAX_PLATFORMS=cpu python tools/ingest_realistic.py --files 8  (CI)
"""

import argparse
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=500)
    ap.add_argument("--genome-len", type=int, default=4_600_000)
    ap.add_argument("--unique", type=int, default=32)
    ap.add_argument("--s", type=int, default=10_000)
    ap.add_argument("--workdir", default="/tmp/miekki_ingest")
    ap.add_argument("--out", default="artifacts/ingest_realistic.json")
    args = ap.parse_args()

    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    from concurrent.futures import ThreadPoolExecutor

    from miekki_tpu import engine
    from miekki_tpu.io import encode as _encode
    from miekki_tpu.io import reader as _reader
    from miekki_tpu.oracle import sketch as osk
    from miekki_tpu.params import SketchParams

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.time()
    k = 31
    params = SketchParams(k=k, s=args.s)
    report = {"files": args.files, "genome_len": args.genome_len,
              "unique_genomes": min(args.unique, args.files),
              "s": args.s, "k": k, "backend": jax.default_backend()}

    # ---- phase 0: lay the files on disk (pool of unique genomes, 8%
    # family mutation from a root — the config-3/5 relatedness shape) ----
    n_unique = min(args.unique, args.files)
    rng = np.random.default_rng(11)
    root = rng.integers(0, 4, size=args.genome_len, dtype=np.int64)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    t0 = time.time()
    pool_paths = []

    def write_unique(u):
        r = np.random.default_rng(500 + u)
        g = root.copy()
        hit = r.random(args.genome_len) < 0.08
        g[hit] = (g[hit] + r.integers(1, 4, size=int(hit.sum()))) % 4
        seq = ACGT[g]
        lines = [f">u{u}".encode()]
        lines += [seq[i:i + 80].tobytes()
                  for i in range(0, len(seq), 80)]
        p = os.path.join(args.workdir, f"u{u}.fa.gz")
        with gzip.open(p, "wb", compresslevel=1) as f:
            f.write(b"\n".join(lines) + b"\n")
        return p

    with ThreadPoolExecutor(max_workers=4) as ex:
        pool_paths = list(ex.map(write_unique, range(n_unique)))
    paths = []
    for i in range(args.files):
        src = pool_paths[i % n_unique]
        if i < n_unique:
            paths.append(src)
        else:
            dst = os.path.join(args.workdir, f"g{i}.fa.gz")
            if not os.path.exists(dst):
                shutil.copyfile(src, dst)
            paths.append(dst)
    gen_dt = time.time() - t0
    report["file_bytes_total"] = sum(os.path.getsize(p) for p in paths)
    report["generate_seconds"] = round(gen_dt, 1)
    print(f"[ingest] {args.files} files "
          f"({report['file_bytes_total']/1e9:.2f} GB gz) in {gen_dt:.0f}s",
          flush=True)

    total_bases = args.files * args.genome_len

    # ---- phase 1: threaded parse (measured separately, then reused) ----
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as ex:
        codes_list = list(ex.map(
            lambda p: _encode.pack_records(_reader.read_genome_codes(p), k),
            paths))
    parse_dt = time.time() - t0
    parsed = sum(len(c) for c in codes_list)
    report["parse_seconds"] = round(parse_dt, 2)
    report["parse_gbase_per_s"] = round(parsed / parse_dt / 1e9, 3)
    print(f"[ingest] parse: {parsed/1e9:.2f} Gbase in {parse_dt:.1f}s = "
          f"{report['parse_gbase_per_s']} Gbase/s", flush=True)

    # ---- phase 2: device phase (packed upload + vmapped sketch) ----
    t0 = time.time()
    idx = engine._build_index_from_codes(
        codes_list, [f"g{i}" for i in range(args.files)], params,
        chunk=1 << 13, batch=engine.MAX_GENOME_BATCH)
    dev_dt = time.time() - t0
    report["device_seconds"] = round(dev_dt, 1)
    report["device_gbase_per_s"] = round(total_bases / dev_dt / 1e9, 3)
    report["packed_upload_bytes"] = total_bases // 3
    print(f"[ingest] device (upload+sketch): {dev_dt:.1f}s = "
          f"{report['device_gbase_per_s']} Gbase/s", flush=True)

    # ---- end-to-end (parse + device, the file→index wall) ----
    e2e = parse_dt + dev_dt
    report["file_to_index_seconds"] = round(e2e, 1)
    report["file_to_index_gbase_per_s"] = round(total_bases / e2e / 1e9, 3)

    # ---- correctness: sampled oracle parity ----
    ok = True
    for i in (0, min(1, args.files - 1)):
        want = osk.sketch_codes(codes_list[i], k, args.s)
        ok &= bool(np.array_equal(idx.sketch_u64(i), want))
    report["oracle_ok"] = bool(ok)

    report["analysis"] = {
        "tunnel_mb_per_s": 25,
        "note": (
            "This machine reaches the chip through a ~25 MB/s tunnel "
            "(docs/DESIGN.md r4), so the end-to-end rate is transfer-"
            "bound: the base-5 packed upload moves bases/3 bytes at "
            "~25 MB/s (~75 Mbase/s ceiling).  On a PCIe-attached host "
            "(>= 8 GB/s) the upload vanishes and file->index converges "
            "to min(host parse rate, device sketch rate) — both "
            "reported above; the gz parse rate is inflate-bound "
            "(~200 Mbase/s/core x 4 cores), plain-FASTA parse measured "
            "420 Mbase/s/core."),
    }
    report["total_seconds"] = round(time.time() - t_start, 1)
    report["pass"] = bool(ok)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
