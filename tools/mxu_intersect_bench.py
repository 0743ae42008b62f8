"""Bench: MXU stream-pass tile counts vs the production Pallas pair kernel.

Production shapes (s=10k, tile 256/512), device-generated synthetic sketches
(no host upload in the timed region), host-forced sync (np.asarray — this
platform's block_until_ready lies, docs/DESIGN.md), medians over N reps.

Usage: python tools/mxu_intersect_bench.py [--s 10000] [--tiles 256,512]
       [--reps 5] [--chunk 2048] [--band 8] [--overlap 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=10_000)
    ap.add_argument("--tiles", default="256,512")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--band", type=int, default=8)
    ap.add_argument("--overlap", type=float, default=0.3,
                    help="fraction of each col sketch drawn from a shared pool")
    ap.add_argument("--skip-ref", action="store_true",
                    help="skip the production-kernel comparison timing")
    args = ap.parse_args()

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor a CPU
    # request through the config API (same idiom as scaling_bench.py).
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from miekki_tpu.ops import intersect, mxu_intersect, u64

    s = args.s
    print(f"backend={jax.default_backend()} s={s} chunk={args.chunk} "
          f"band={args.band}", flush=True)

    from functools import partial

    @partial(jax.jit, static_argnames=("n", "m"))
    def synth_pair_tiles(key, n, m):
        """Row and col tiles [(n, s)] sharing a pool: each pool value lands
        in exactly one row sketch and one col sketch (runs of length 2 —
        inside the band), everything else private. ~n*m total matches."""
        kp, kr, kc, kq = jax.random.split(key, 4)
        pool_h = jax.random.bits(kp, (n * m,), jnp.uint32) >> 1  # < 2^63
        pool_l = jax.random.bits(jax.random.fold_in(kp, 1), (n * m,), jnp.uint32)
        perm = jax.random.permutation(kq, n * m)

        def tile(k, ph, pl):
            h = jax.random.bits(k, (n, s - m), jnp.uint32) >> 1
            l = jax.random.bits(jax.random.fold_in(k, 1), (n, s - m), jnp.uint32)
            h = jnp.concatenate([h, ph.reshape(n, m)], axis=1)
            l = jnp.concatenate([l, pl.reshape(n, m)], axis=1)
            return jax.lax.sort((h, l), dimension=-1, num_keys=2)

        rows = tile(kr, pool_h, pool_l)
        cols = tile(kc, pool_h[perm], pool_l[perm])
        return rows, cols

    results = {}
    for t in (int(x) for x in args.tiles.split(",")):
        key = jax.random.PRNGKey(t)
        m = max(1, int(s * args.overlap / 10))
        rows, cols = synth_pair_tiles(key, t, m)
        np.asarray(rows[0])

        def run_mxu():
            rs = mxu_intersect.sketch_stream(rows, False)
            cs = mxu_intersect.sketch_stream(cols, True)
            out = mxu_intersect.tile_counts_mxu(
                rows, cols, s, chunk=args.chunk, band=args.band,
                row_stream=rs, col_stream=cs)
            return int(np.asarray(out["inter_full"]).sum()), bool(out["overflow"])

        # warm (compile)
        t0 = time.time()
        total, ov = run_mxu()
        print(f"tile={t} mxu compile+first: {time.time()-t0:.1f}s "
              f"inter_sum={total} overflow={ov}", flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            run_mxu()
            times.append(time.time() - t0)
        med = float(np.median(times))
        pairs = t * t
        results[f"mxu_tile{t}"] = {
            "median_s": round(med, 4),
            "pairs_per_s": round(pairs / med, 1),
            "times": [round(x, 4) for x in times],
        }
        print(f"tile={t} MXU: median {med*1e3:.1f} ms -> "
              f"{pairs/med/1e3:.1f}k pairs/s {times}", flush=True)

        if not args.skip_ref:
            def run_ref():
                out = intersect.tile_counts(rows, cols, s)
                return np.asarray(out["inter_full"]).sum()

            t0 = time.time()
            run_ref()
            print(f"tile={t} ref compile+first: {time.time()-t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                run_ref()
                times.append(time.time() - t0)
            med = float(np.median(times))
            results[f"ref_tile{t}"] = {
                "median_s": round(med, 4),
                "pairs_per_s": round(pairs / med, 1),
                "times": [round(x, 4) for x in times],
            }
            print(f"tile={t} REF: median {med*1e3:.1f} ms -> "
                  f"{pairs/med/1e3:.1f}k pairs/s {times}", flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
