"""BASELINE config-5 DB SCALE on one chip: a 102,400-genome sketch DB
(s=10k — the pod-scale genome count of BASELINE.json config 5) driven
through the production comparison + screening paths on the real TPU.

The pod itself (v5p-16, N>=2 hosts) is not available on this machine, so
this demonstrates the DB-scale mechanics that don't need one:

  A. rectangular dist: 256 queries vs the full 102,400-genome DB on
     COMPACT single-plane fingerprints whose code table is built and kept
     ON DEVICE during synthesis (ops.compact.compact_rows + donated
     dynamic_update_slice — the r4 u64 run streamed the 8.2 GB
     host-resident DB through the ~25 MB/s tunnel at 109k pairs/s;
     VERDICT r4 #4), spot-verified against the independent compact
     bitonic-XLA implementation, identity invariants on the embedded real
     genomes, and the compact-vs-u64 collision bias revalidated on
     sampled slices at this scale.  --dist-u64 additionally reruns the r4
     u64 host-plane phase for comparison;
  B. production screen: reads sampled from 3 of the real genomes screened
     against the full DB (1.024G flat sketch values — the r5 grouped
     hash-once screen), asserting the 3 sources are the top hits with
     containment ~1, other genomes ~0, and the survivor-rate metric is
     emitted.

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


def synth_db_device(n, n_real, real_codes, s, chunk=4096, seed=7,
                    pull_planes=True, pull_codes=True):
    """Synthesize the (n - n_real)-row synthetic tail of the DB ON DEVICE
    (values uniform in [0, 2^58) — the bottom-10k range of a ~0.5-Mbase
    genome) and build the full-DB COMPACT code table device-resident as it
    goes (ops.compact.compact_rows + donated dynamic_update_slice — no
    8 GB host link crossing; VERDICT r4 #4).

    Generation is deterministic (seed): reruns with cached host planes
    still rebuild the identical device table in seconds.  Returns
    (syn_hi, syn_lo, syn_codes — host arrays or None if not pulled,
    dev_codes — device uint32 [n, s]).  This machine's numpy BitGenerator
    streams ~3 MB/s (a 1G-value table would take ~45 min of host CPU);
    jax.random.bits + lax.sort produce the same table in seconds."""
    import jax
    import jax.numpy as jnp

    from miekki_tpu.ops import compact as C

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        # hi gets 26 random bits -> values uniform in [0, 2^58)
        h = jax.random.bits(k1, (chunk, s), jnp.uint32) >> 6
        l = jax.random.bits(k2, (chunk, s), jnp.uint32)
        h, l = jax.lax.sort((h, l), dimension=-1, num_keys=2)
        return h, l, C.compact_rows(h, l)

    dus = jax.jit(
        lambda big, rows, off: jax.lax.dynamic_update_slice(
            big, rows, (off, 0)),
        donate_argnums=(0,))
    dev_codes = jnp.full((n, s), np.uint32(0xFFFFFFFF), jnp.uint32)
    dev_codes = dus(dev_codes, jnp.asarray(real_codes), jnp.int32(0))
    n_syn = n - n_real
    syn_hi = np.empty((n_syn, s), np.uint32) if pull_planes else None
    syn_lo = np.empty((n_syn, s), np.uint32) if pull_planes else None
    syn_codes = np.empty((n_syn, s), np.uint32) if pull_codes else None
    keys = jax.random.split(jax.random.PRNGKey(seed), -(-n_syn // chunk))
    for i, o in enumerate(range(0, n_syn, chunk)):
        c = min(chunk, n_syn - o)
        h, l, cd = gen(keys[i])
        if pull_planes:
            syn_hi[o:o + c] = np.asarray(h)[:c]
            syn_lo[o:o + c] = np.asarray(l)[:c]
        if pull_codes:
            syn_codes[o:o + c] = np.asarray(cd)[:c]
        dev_codes = dus(dev_codes, cd[:c] if c < chunk else cd,
                        jnp.int32(n_real + o))
    return syn_hi, syn_lo, syn_codes, dev_codes


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
    ap.add_argument("--dist-u64", action="store_true",
                    help="also rerun the r4 u64 host-plane dist phase")
    args = ap.parse_args()

    from pathlib import Path

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor a CPU
    # request through the config API (same idiom as the other tools)
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

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
    import dataclasses

    from miekki_tpu.ops import compact as C

    real32 = real_idx.to_compact()
    # Synthetic planes are deterministic (seed 7) — cache them in the
    # workdir so retries skip the download; the device code table is
    # rebuilt on device either way (seconds, no host link).
    cache_hi = Path(args.workdir) / f"syn_hi_{n - n_real}x{s}.npy"
    cache_lo = Path(args.workdir) / f"syn_lo_{n - n_real}x{s}.npy"
    cache_cd = Path(args.workdir) / f"syn_cd_{n - n_real}x{s}.npy"
    have = cache_hi.exists() and cache_lo.exists() and cache_cd.exists()
    syn_hi2, syn_lo2, syn_cd2, dev_codes = synth_db_device(
        n, n_real, real32.hi, s, pull_planes=not have,
        pull_codes=not have)
    if have:
        syn_hi = np.load(cache_hi, mmap_mode="r")
        syn_lo = np.load(cache_lo, mmap_mode="r")
        syn_cd = np.load(cache_cd, mmap_mode="r")
        print("[100k] loaded cached synthetic planes", flush=True)
    else:
        syn_hi, syn_lo, syn_cd = syn_hi2, syn_lo2, syn_cd2
        np.save(cache_hi, syn_hi)
        np.save(cache_lo, syn_lo)
        np.save(cache_cd, syn_cd)
    hi = np.concatenate([real_idx.hi, syn_hi])
    lo = np.concatenate([real_idx.lo, syn_lo])
    codes_host = np.concatenate([real32.hi, syn_cd])
    del syn_hi, syn_lo, syn_cd, syn_hi2, syn_lo2, syn_cd2
    names = real_idx.names + [f"syn{i}" for i in range(n - n_real)]
    index = SketchIndex(params, names, hi, lo)
    params32 = dataclasses.replace(params, compact=True)
    index32 = SketchIndex(params32, names, codes_host,
                          C.lo_plane_np(codes_host))
    index32.device_planes = dev_codes
    report["synth_seconds"] = round(time.time() - t0, 1)
    report["db_bytes"] = int(hi.nbytes + lo.nbytes)
    report["db_bytes_compact"] = int(codes_host.nbytes)
    print(f"[100k] DB assembled: {n} x {s} "
          f"({report['db_bytes']/1e9:.1f} GB u64, "
          f"{report['db_bytes_compact']/1e9:.1f} GB compact device-"
          f"resident) in {report['synth_seconds']}s", flush=True)

    # --- phase A: rectangular dist, 256 queries vs the full DB on the
    # device-resident compact table (the r4 u64 host-plane form measured
    # 109k pairs/s, tunnel-bound streaming 8.2 GB at ~25 MB/s)
    nq = args.queries
    ident_ok = spot_ok = True
    bias_ok = True
    if args.skip_dist:
        report["dist_skipped"] = True
    else:
        os.environ.setdefault("MIEKKI_INTERSECT", "mxu")
        q32 = SketchIndex(params32, names[:nq], codes_host[:nq].copy(),
                          C.lo_plane_np(codes_host[:nq]))
        q32.device_planes = dev_codes[:nq]
        T = args.tile
        t0 = time.time()
        state = {"last": -1.0}

        def progress(done, tot):
            now = time.time()
            if now - state["last"] > 30:
                state["last"] = now
                print(f"[100k] dist tile {done}/{tot} ({now-t0:.0f}s)",
                      flush=True)

        counts = engine.dist_counts_matrix(q32, index32, tile=T,
                                           progress=progress)
        sh, un, it = counts["shared"], counts["union"], counts["inter"]
        dt = time.time() - t0
        pairs = nq * n
        report["dist_pairs"] = pairs
        report["dist_seconds"] = round(dt, 1)
        report["dist_pairs_per_s"] = round(pairs / dt, 1)
        report["dist_form"] = "compact_device_resident"
        print(f"[100k] dist (compact, device-resident): {pairs} pairs in "
              f"{dt:.0f}s ({pairs/dt/1e3:.1f}k pairs/s)", flush=True)

        # identity invariant: query row i IS DB row i
        sizes32 = index32.sizes()[:nq]
        ident_ok = (bool(np.array_equal(np.diagonal(sh[:, :nq]),
                                        np.minimum(sizes32, s)))
                    and bool(np.array_equal(np.diagonal(it[:, :nq]),
                                            sizes32)))
        # spot parity vs the independent compact bitonic-XLA impl
        rv = np.random.default_rng(11)
        V = min(64, nq)
        bias_max = 0
        bias_sum = 0.0
        bias_pairs = 0
        for _ in range(4):
            bj = int(rv.integers(0, n // V))
            c0, c1 = bj * V, (bj + 1) * V
            out = I.tile_counts_compact(
                jnp.asarray(codes_host[:V]),
                jnp.asarray(codes_host[c0:c1]), s, "bitonic")
            spot_ok &= bool(np.array_equal(np.asarray(out["shared_in_x"]),
                                           sh[:V, c0:c1]))
            spot_ok &= bool(np.array_equal(np.asarray(out["union_size"]),
                                           un[:V, c0:c1]))
            spot_ok &= bool(np.array_equal(np.asarray(out["inter_full"]),
                                           it[:V, c0:c1]))
            # compact-vs-u64 collision bias at scale (VERDICT r4 #4): the
            # spurious shared count must stay ~O(3) per pair (ops/compact
            # collision math), far under bottom-s sampling noise
            ref = I.tile_counts(
                (jnp.asarray(hi[:V]), jnp.asarray(lo[:V])),
                (jnp.asarray(hi[c0:c1]), jnp.asarray(lo[c0:c1])), s,
                impl="bitonic")
            d = (sh[:V, c0:c1].astype(np.int64)
                 - np.asarray(ref["shared_in_x"]).astype(np.int64))
            bias_max = max(bias_max, int(np.abs(d).max()))
            bias_sum += float(np.abs(d).sum())
            bias_pairs += d.size
        report["dist_identity_ok"] = ident_ok
        report["dist_bitonic_spots_ok"] = bool(spot_ok)
        report["compact_bias_max_shared_delta"] = bias_max
        report["compact_bias_mean_shared_delta"] = round(
            bias_sum / bias_pairs, 4)
        bias_ok = bias_max <= 32  # >> expected ~3, << s=10k noise ~500
        report["compact_bias_ok"] = bool(bias_ok)
        print(f"[100k] dist identity={ident_ok} spots={spot_ok} "
              f"bias_max={bias_max} bias_mean="
              f"{report['compact_bias_mean_shared_delta']}", flush=True)
        del sh, un, it

        if args.dist_u64:
            q_idx = SketchIndex(params, names[:nq], hi[:nq].copy(),
                                lo[:nq].copy())
            t0 = time.time()
            counts = engine.dist_counts_matrix(q_idx, index, tile=T,
                                               progress=progress)
            dt = time.time() - t0
            report["dist_u64_seconds"] = round(dt, 1)
            report["dist_u64_pairs_per_s"] = round(pairs / dt, 1)
            print(f"[100k] dist (u64 host planes): {pairs} pairs in "
                  f"{dt:.0f}s ({pairs/dt/1e3:.1f}k/s)", flush=True)
            del counts

    # Free the device-resident compact table before the screen phase: the
    # grouped screen holds the u64 flat planes (8.2 GB) + hit bitmap on
    # device, and keeping the 4.1 GB code table alive alongside would
    # overcommit the 16 GB chip.
    index32.device_planes = None
    del dev_codes
    if not args.skip_dist:
        q32.device_planes = None

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

    report["pass"] = bool(ident_ok and spot_ok and bias_ok and top_ok
                          and others_max < 0.01)
    report["total_seconds"] = round(time.time() - t_start, 1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
