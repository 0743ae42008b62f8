"""Sustained all-vs-all throughput through engine.dist_tiles — the full
host-orchestrated path (block uploads, stream sorts, packed pulls,
ambiguity resolution), not the bare per-tile dispatch that
tools/mxu_intersect_bench.py times.

The r3 10k-genome run sustained 360k pairs/s where the bare dispatch
benches 818k at tile 512: the gap is the synchronous host loop.  This
tool isolates the orchestration cost on a family-structured synthetic
index (the BASELINE config-3/5 workload shape: ~8% of slots conserved
from a root — the same generator as bench.py's pair benches) so
pipelining/tile changes can be swept in minutes instead of a full
10k-genome rerun.

Usage:
  python tools/dist_sustained_bench.py [--genomes 4096] [--s 10000]
      [--tile 512] [--pipeline 1] [--reps 2]
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
    ap.add_argument("--genomes", type=int, default=4096)
    ap.add_argument("--s", type=int, default=10_000)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--pipeline", default=None,
                    help="MIEKKI_PIPELINE depth(s), comma list (default: "
                    "current env or 1)")
    ap.add_argument("--impl", default=None, help="MIEKKI_INTERSECT override")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--share", type=float, default=0.08)
    args = ap.parse_args()

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")
    if args.impl:
        os.environ["MIEKKI_INTERSECT"] = args.impl

    from miekki_tpu import engine
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.params import SketchParams

    n, s = args.genomes, args.s

    @jax.jit
    def gen(key):
        kr, kp, km = jax.random.split(key, 3)
        root_hi = jax.random.bits(kr, (1, s), jnp.uint32) >> 1
        root_lo = jax.random.bits(jax.random.fold_in(kr, 1), (1, s),
                                  jnp.uint32)
        keep = jax.random.uniform(km, (n, s)) < args.share
        priv_hi = jax.random.bits(kp, (n, s), jnp.uint32) >> 1
        priv_lo = jax.random.bits(jax.random.fold_in(kp, 1), (n, s),
                                  jnp.uint32)
        hi = jnp.where(keep, root_hi, priv_hi)
        lo = jnp.where(keep, root_lo, priv_lo)
        return jax.lax.sort((hi, lo), dimension=-1, num_keys=2)

    hi, lo = gen(jax.random.PRNGKey(7))
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    params = SketchParams(k=31, s=s)
    index = SketchIndex(params=params, names=[f"g{i}" for i in range(n)],
                        hi=hi, lo=lo)
    n_pairs = n * (n - 1) // 2
    depths = (args.pipeline.split(",") if args.pipeline
              else [os.environ.get("MIEKKI_PIPELINE", "1")])

    print(f"backend={jax.default_backend()} n={n} s={s} tile={args.tile} "
          f"pairs={n_pairs}", flush=True)
    for depth in depths:
        os.environ["MIEKKI_PIPELINE"] = depth
        for rep in range(args.reps):
            t0 = time.perf_counter()
            total = 0
            checksum = 0
            for (_bi, _bj, _gi, _gj, sh, _un, _it) in engine.dist_tiles(
                index, tile=args.tile
            ):
                total += sh.size
                checksum += int(sh.sum())
            dt = time.perf_counter() - t0
            assert total == n_pairs, (total, n_pairs)
            print(json.dumps({
                "pipeline": depth, "tile": args.tile, "rep": rep,
                "wall_s": round(dt, 2),
                "pairs_per_s": round(n_pairs / dt, 1),
                "checksum": checksum,
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
