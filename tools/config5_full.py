"""BASELINE config 5 at FULL contract scale (VERDICT r1 item 3): 10k-genome
sketch DB (s=10k, k=31), sharded over an 8-device CPU mesh, ring all-vs-all
with per-step checkpoints, verified against the single-device tile engine
on sampled blocks.

--method hostring (default, r5): the production single-process multi-device
path (parallel.allvsall.dist_sharded_hostring — dist_sharded's own routing
for this mesh shape), measured 12x the traced searchsorted ring on the CPU
backend at s=10k (12.2k vs 1.0k pairs/s, n=512 probe) — full-s validation
drops from a ~35 h extrapolation to ~2.5 h (VERDICT r4 #9).  Per-step
checkpoints via dist_sharded_hostring(checkpoint=...); crash-resume replays
only the column rotations.  Verification: random blocks of the final
matrix recomputed with single-device `intersect.tile_counts` and compared
exactly, plus diagonal and symmetry invariants.

--method ring: the r4 traced `ring_chunk_counts` path (kept for
comparison; per-chunk checkpoints + per-chunk verification).

Run (hours on the 4-core CPU backend; nice it):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      nice -19 python tools/config5_full.py [--genomes 10240] [--s 10000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=10_240)
    ap.add_argument("--s", type=int, default=10_000)
    ap.add_argument("--genome-len", type=int, default=30_000)
    ap.add_argument("--workdir", default="/tmp/miekki_config5_full")
    ap.add_argument("--out", default="artifacts/config5_full.json")
    ap.add_argument("--method", choices=("hostring", "ring"),
                    default="hostring")
    ap.add_argument("--tile", type=int, default=64,
                    help="hostring mxu sub-tile (64 measured best on cpu)")
    args = ap.parse_args()

    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    from miekki_tpu import engine
    from miekki_tpu.io import encode
    from miekki_tpu.ops import intersect as I
    from miekki_tpu.ops import u64
    from miekki_tpu.params import SketchParams
    from miekki_tpu.parallel import local_mesh
    from miekki_tpu.parallel.allvsall import ring_chunk_counts

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.time()
    k = 31
    params = SketchParams(k=k, s=args.s)
    mesh = local_mesh()
    D = int(np.prod(list(mesh.shape.values())))
    n = args.genomes - args.genomes % D

    # ---- phase 1: sketch the DB through the production pipeline ----
    db_path = os.path.join(args.workdir, "db.npz")
    if os.path.exists(db_path):
        from miekki_tpu.index.store import SketchIndex

        idx = SketchIndex.load(db_path)
        print(f"[config5] loaded existing DB ({len(idx)} genomes)",
              flush=True)
    else:
        print(f"[config5] sketching {n} genomes of {args.genome_len} bases "
              f"(k={k}, s={args.s})", flush=True)
        rng = np.random.default_rng(5)
        root = rng.integers(0, 4, size=args.genome_len, dtype=np.int64)
        codes_list = []
        for i in range(n):
            g = root.copy()
            hit = rng.random(args.genome_len) < 0.08
            g[hit] = (g[hit] + rng.integers(1, 4, size=int(hit.sum()))) % 4
            codes_list.append(g.astype(np.uint8))
        t0 = time.time()
        idx = engine._build_index_from_codes(
            codes_list, [f"g{i}" for i in range(n)], params,
            chunk=1 << 13, batch=engine.MAX_GENOME_BATCH)
        print(f"[config5] sketched in {time.time()-t0:.0f}s", flush=True)
        idx.save(db_path)

    nl = n // D
    rng_v = np.random.default_rng(77)

    if args.method == "hostring":
        # ---- phase 2h: host-orchestrated device ring (the production
        # single-process multi-device path), per-step checkpoints ----
        from miekki_tpu.parallel.allvsall import dist_sharded_hostring

        hi = jnp.asarray(idx.hi)
        lo = jnp.asarray(idx.lo)
        report = {"genomes": n, "s": args.s, "devices": D,
                  "method": "hostring", "tile": args.tile}
        t0 = time.time()
        counts = dist_sharded_hostring(
            idx, mxu_tile=args.tile,
            checkpoint=os.path.join(args.workdir, "hostring_ckpt"))
        dt = time.time() - t0
        shared_m = counts["shared"]
        pairs = n * n
        report["compare_seconds"] = round(dt, 1)
        report["pairs"] = pairs
        report["pairs_per_s"] = round(pairs / dt, 1)
        print(f"[config5] hostring {pairs} pairs in {dt:.0f}s "
              f"({pairs/dt:.0f}/s)", flush=True)

        # ---- phase 3h: spot verification + invariants ----
        n_checked = 0
        blk = 16
        I_mod = I
        for _ in range(64):
            r0 = int(rng_v.integers(0, n - blk + 1))
            c0 = int(rng_v.integers(0, n - blk + 1))
            want = I_mod.tile_counts(
                (hi[r0:r0 + blk], lo[r0:r0 + blk]),
                (hi[c0:c0 + blk], lo[c0:c0 + blk]), args.s)
            assert np.array_equal(
                shared_m[r0:r0 + blk, c0:c0 + blk],
                np.asarray(want["shared_in_x"])), (r0, c0)
            assert np.array_equal(
                counts["inter"][r0:r0 + blk, c0:c0 + blk],
                np.asarray(want["inter_full"])), (r0, c0)
            n_checked += blk * blk
        sizes = idx.sizes()
        diag_ok = bool(np.array_equal(
            np.diagonal(shared_m), np.minimum(sizes, args.s)))
        sym_ok = bool(np.array_equal(shared_m, shared_m.T))
        report["verified_pairs"] = n_checked
        report["diag_ok"] = diag_ok
        report["sym_ok"] = sym_ok
        report["total_seconds"] = round(time.time() - t_start, 1)
        report["pass"] = bool(diag_ok and sym_ok)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({"config": 5, "full": True,
                          **{k2: report[k2] for k2 in
                             ("pass", "genomes", "s", "devices",
                              "pairs_per_s", "total_seconds")}}),
              flush=True)
        return 0 if report["pass"] else 1

    hi = jnp.asarray(idx.hi)
    lo = jnp.asarray(idx.lo)

    # ---- phase 2: chunked ring with checkpoints + per-chunk verification --
    chunk_files = []
    report = {"genomes": n, "s": args.s, "devices": D, "method": "ring",
              "chunks": []}
    for t in range(D):
        cpath = os.path.join(args.workdir, f"ring_step{t}.npz")
        chunk_files.append(cpath)
        if os.path.exists(cpath):
            print(f"[config5] step {t}: checkpoint exists, skipping",
                  flush=True)
            continue
        t0 = time.time()
        shared, union, inter = ring_chunk_counts(
            hi, lo, s=args.s, mesh=mesh, t0=t, n_steps=1)
        shared = np.asarray(shared)[0]
        union = np.asarray(union)[0]
        inter = np.asarray(inter)[0]
        dt = time.time() - t0
        # verify 8 random row-slices of this step against the single-device
        # tile engine: step t, device-block d covers rows [d*nl, (d+1)*nl)
        # vs the column block of device (d - t) % D
        n_checked = 0
        blk = min(16, nl)  # a block must stay inside one device's rows
        for _ in range(8):
            d = int(rng_v.integers(0, D))
            origin = (d - t) % D
            r0 = d * nl + int(rng_v.integers(0, max(1, nl - blk + 1)))
            c0 = int(rng_v.integers(0, max(1, nl - blk + 1)))
            rows_blk = (hi[r0:r0 + blk], lo[r0:r0 + blk])
            cols_blk = (hi[origin * nl + c0:origin * nl + c0 + blk],
                        lo[origin * nl + c0:origin * nl + c0 + blk])
            want = I.tile_counts(rows_blk, cols_blk, args.s)
            got_sh = shared[r0:r0 + blk, c0:c0 + blk]
            got_un = union[r0:r0 + blk, c0:c0 + blk]
            got_in = inter[r0:r0 + blk, c0:c0 + blk]
            assert np.array_equal(got_sh, np.asarray(want["shared_in_x"]))
            assert np.array_equal(got_un, np.asarray(want["union_size"]))
            assert np.array_equal(got_in, np.asarray(want["inter_full"]))
            n_checked += blk * blk
        tmp = cpath + ".tmp.npz"
        np.savez_compressed(tmp, shared=shared, union=union, inter=inter)
        os.replace(tmp, cpath)
        pairs = n * nl
        row = {"step": t, "seconds": round(dt, 1),
               "pairs": pairs, "pairs_per_s": round(pairs / dt, 1),
               "verified_pairs": n_checked}
        report["chunks"].append(row)
        print(f"[config5] {json.dumps(row)}", flush=True)

    # ---- phase 3: assemble + global invariants ----
    print("[config5] assembling matrix + invariants", flush=True)
    diag_ok = True
    sym_ok = True
    # stream the checks per step-file to bound memory: build origin maps
    blocks = {}
    for t in range(D):
        with np.load(chunk_files[t]) as z:
            sh = z["shared"]
        for d in range(D):
            origin = (d - t) % D
            blocks[(d, origin)] = sh[d * nl:(d + 1) * nl]
    sizes = idx.sizes()
    for d in range(D):
        diag = np.diagonal(blocks[(d, d)])
        want = np.minimum(sizes[d * nl:(d + 1) * nl], args.s)
        diag_ok &= bool(np.array_equal(diag, want))
    for _ in range(32):
        a, b = (int(x) for x in rng_v.integers(0, D, size=2))
        ra, rb = (int(rng_v.integers(0, nl)) for _ in range(2))
        sym_ok &= int(blocks[(a, b)][ra, rb]) == int(blocks[(b, a)][rb, ra])
    report["diag_ok"] = diag_ok
    report["sym_ok"] = sym_ok
    report["total_seconds"] = round(time.time() - t_start, 1)
    report["pass"] = bool(diag_ok and sym_ok
                          and len(chunk_files) == D)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"config": 5, "full": True, **{k2: report[k2] for k2 in
          ("pass", "genomes", "s", "devices", "total_seconds")}}),
          flush=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
