"""BASELINE config-5 DB SCALE on one chip: a 102,400-genome sketch DB
(s=10k — the pod-scale genome count of BASELINE.json config 5) driven
through the production comparison + screening paths on the real TPU.

The pod itself (v5p-16, N>=2 hosts) is not available on this machine, so
this demonstrates the DB-scale mechanics that don't need one:

  A. rectangular dist: 256 queries vs the full 102,400-genome DB through
     dist_tiles (26.2M pairs, Pallas tile kernel), spot-verified against
     the independent bitonic-XLA implementation, with identity invariants
     on the 128 real genomes embedded in the DB;
  B. production screen: reads sampled from 3 of the real genomes screened
     against the full DB (1.024G flat sketch values resident on device),
     asserting the 3 sources are the top hits with containment ~1, other
     genomes ~0, and the prefilter survivor-rate metric is emitted.

DB synthesis: 128 REAL genomes (0.5 Mbase each, sketched through the
production pipeline) + 102,272 synthetic sketches drawn uniform in
[0, 2^58) — the same value range as a real bottom-10k sketch of a
~0.5-Mbase genome (max ~ s/n * 2^64), so the screen threshold prefilter
behaves realistically (~2% survivor rate).

Run: nohup timeout 3600 python tools/scale100k_tpu.py &   (~15 min)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def synth_sketches(n, s, chunk=4096, seed=7):
    """[n, s] sorted-ascending synthetic sketch planes, values < 2^58.

    Generated and sorted ON DEVICE: this machine's numpy BitGenerator
    streams ~3 MB/s (a 1G-value table would take ~45 min of host CPU);
    jax.random.bits + lax.sort produce the same thing in seconds."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        # hi gets 26 random bits -> values uniform in [0, 2^58)
        h = jax.random.bits(k1, (chunk, s), jnp.uint32) >> 6
        l = jax.random.bits(k2, (chunk, s), jnp.uint32)
        return jax.lax.sort((h, l), dimension=-1, num_keys=2)

    hi = np.empty((n, s), np.uint32)
    lo = np.empty((n, s), np.uint32)
    keys = jax.random.split(jax.random.PRNGKey(seed), -(-n // chunk))
    for i, o in enumerate(range(0, n, chunk)):
        c = min(chunk, n - o)
        h, l = gen(keys[i])
        hi[o : o + c] = np.asarray(h)[:c]
        lo[o : o + c] = np.asarray(l)[:c]
    return hi, lo


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=102_400)
    ap.add_argument("--real", type=int, default=128)
    ap.add_argument("--s", type=int, default=10_000)
    ap.add_argument("--genome-len", type=int, default=500_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--reads-per-genome", type=int, default=30_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--workdir", default="/tmp/miekki_100k")
    ap.add_argument("--out", default="artifacts/scale100k_tpu.json")
    ap.add_argument("--skip-dist", action="store_true",
                    help="run only the screen phase (phase B)")
    args = ap.parse_args()

    from pathlib import Path

    import jax

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    from miekki_tpu import engine
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.ops import intersect as I
    from miekki_tpu.params import SketchParams

    sys.path.insert(0, os.path.join(__file__.rsplit("/", 2)[0], "tests"))
    from fixtures import random_seq, reads_from_genome, write_fasta, write_fastq

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.time()
    k = 31
    n, n_real, s = args.genomes, args.real, args.s
    params = SketchParams(k=k, s=s)
    report = {"genomes": n, "real_genomes": n_real, "s": s, "k": k,
              "backend": jax.default_backend()}

    # --- build the DB: 128 real genomes + synthetic rows in the same range
    rng = np.random.default_rng(7)
    print(f"[100k] generating {n_real} real genomes "
          f"({args.genome_len} bases)", flush=True)
    genomes = [random_seq(rng, args.genome_len) for _ in range(n_real)]
    fa = write_fasta(Path(args.workdir) / "real.fa",
                     [(f"real{i}", g) for i, g in enumerate(genomes)])
    t0 = time.time()
    real_idx = engine.build_index_per_record([str(fa)], params)
    report["real_sketch_seconds"] = round(time.time() - t0, 1)
    print(f"[100k] sketched real genomes in {report['real_sketch_seconds']}s",
          flush=True)

    t0 = time.time()
    # Synthetic planes are deterministic (seed 7) — cache them in the
    # workdir so retries skip the ~30 min device generation + download.
    cache_hi = Path(args.workdir) / f"syn_hi_{n - n_real}x{s}.npy"
    cache_lo = Path(args.workdir) / f"syn_lo_{n - n_real}x{s}.npy"
    if cache_hi.exists() and cache_lo.exists():
        syn_hi = np.load(cache_hi, mmap_mode="r")
        syn_lo = np.load(cache_lo, mmap_mode="r")
        print("[100k] loaded cached synthetic planes", flush=True)
    else:
        syn_hi, syn_lo = synth_sketches(n - n_real, s)
        np.save(cache_hi, syn_hi)
        np.save(cache_lo, syn_lo)
    hi = np.concatenate([real_idx.hi, syn_hi])
    lo = np.concatenate([real_idx.lo, syn_lo])
    del syn_hi, syn_lo
    names = real_idx.names + [f"syn{i}" for i in range(n - n_real)]
    index = SketchIndex(params, names, hi, lo)
    report["synth_seconds"] = round(time.time() - t0, 1)
    report["db_bytes"] = int(hi.nbytes + lo.nbytes)
    print(f"[100k] DB assembled: {n} x {s} "
          f"({report['db_bytes']/1e9:.1f} GB) in {report['synth_seconds']}s",
          flush=True)

    # --- phase A: rectangular dist, 256 queries vs the full DB
    nq = args.queries
    ident_ok = spot_ok = True
    if args.skip_dist:
        report["dist_skipped"] = True
    else:
        q_idx = SketchIndex(params, names[:nq], hi[:nq].copy(), lo[:nq].copy())
        T = args.tile
        sh = np.zeros((nq, n), np.int32)
        un = np.zeros((nq, n), np.int32)
        it = np.zeros((nq, n), np.int32)
        t0 = time.time()
        n_tiles = -(-nq // T) * (-(-n // T))
        for ti, (bi, bj, gi, gj, tsh, tun, tit) in enumerate(
                engine.dist_tiles(q_idx, index, tile=T)):
            sh[gi, gj], un[gi, gj], it[gi, gj] = tsh, tun, tit
            if ti % 64 == 0:
                print(f"[100k] dist tile {ti}/{n_tiles} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        dt = time.time() - t0
        pairs = nq * n
        report["dist_pairs"] = pairs
        report["dist_seconds"] = round(dt, 1)
        report["dist_pairs_per_s"] = round(pairs / dt, 1)
        print(f"[100k] dist: {pairs} pairs in {dt:.0f}s "
              f"({pairs/dt/1e3:.1f}k pairs/s)", flush=True)

        # identity invariant: query row i IS DB row i
        sizes = index.sizes()[:nq]
        ident_ok = (bool(np.array_equal(np.diagonal(sh[:, :nq]),
                                        np.minimum(sizes, s)))
                    and bool(np.array_equal(np.diagonal(it[:, :nq]), sizes)))
        # spot parity vs the independent bitonic-XLA implementation
        import jax.numpy as jnp

        # 64-wide slices: the bitonic path pads s to pow2 (32768 lanes) and
        # broadcasts [ROW_GROUP, Tc, 32768] temps — Tc=256 OOMs the 16 GB
        # HBM, 64 fits comfortably
        rv = np.random.default_rng(11)
        V = 64
        for _ in range(4):
            bj = int(rv.integers(0, n // V))
            c0, c1 = bj * V, (bj + 1) * V
            out = I.tile_counts(
                (jnp.asarray(hi[:V]), jnp.asarray(lo[:V])),
                (jnp.asarray(hi[c0:c1]), jnp.asarray(lo[c0:c1])), s,
                impl="bitonic")
            spot_ok &= bool(np.array_equal(np.asarray(out["shared_in_x"]),
                                           sh[:V, c0:c1]))
            spot_ok &= bool(np.array_equal(np.asarray(out["union_size"]),
                                           un[:V, c0:c1]))
            spot_ok &= bool(np.array_equal(np.asarray(out["inter_full"]),
                                           it[:V, c0:c1]))
        report["dist_identity_ok"] = ident_ok
        report["dist_bitonic_spots_ok"] = bool(spot_ok)
        print(f"[100k] dist identity={ident_ok} bitonic_spots={spot_ok}",
              flush=True)
        del sh, un, it

    # --- phase B: production screen vs the 102,400-genome DB
    sources = [0, 1, 7]
    reads = []
    for g in sources:
        reads += [(f"r{g}_{i}", r) for i, r in enumerate(
            reads_from_genome(rng, genomes[g], args.reads_per_genome,
                              args.read_len))]
    fq = write_fastq(Path(args.workdir) / "reads.fq", reads)
    report["n_reads"] = len(reads)
    t0 = time.time()
    stats: dict = {}
    rows = engine.screen(index, [str(fq)], stats=stats)
    dt = time.time() - t0
    report["screen_seconds"] = round(dt, 1)
    report["screen_stats"] = {k_: (round(v, 6) if isinstance(v, float) else v)
                              for k_, v in stats.items()}
    by_cont = sorted(rows, key=lambda r: -r["containment"])
    top = [(r["reference"], round(r["containment"], 4)) for r in by_cont[:5]]
    want_top = {f"real{g}" for g in sources}
    got_top = {nm for nm, _ in top[:3]}
    top_ok = got_top == want_top and all(c > 0.9 for _, c in top[:3])
    others_max = max(r["containment"] for r in rows
                     if r["reference"] not in want_top)
    report["screen_top5"] = top
    report["screen_top_ok"] = bool(top_ok)
    report["screen_others_max_containment"] = round(others_max, 6)
    print(f"[100k] screen: {len(reads)} reads in {dt:.0f}s; top5={top} "
          f"others_max={others_max:.2e} survivor_rate="
          f"{stats.get('survivor_rate'):.4f}", flush=True)

    report["pass"] = bool(ident_ok and spot_ok and top_ok
                          and others_max < 0.01)
    report["total_seconds"] = round(time.time() - t_start, 1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
