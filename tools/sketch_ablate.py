"""Sketch-pipeline step ablation on device (successor of the r2 /tmp probe
scripts; run on the real chip after any sketch-path change).

Attributes per-step cost across the pipeline stages at two workload shapes:

  stream: one long 134-Mbase stream (the bench.py headline shape)
  genome: a 4.6-Mbase pow2-bucketed genome (the per-genome production
          shape — 16 scan steps, where the r2s2 warmup cut applies)

Stages (each jitted separately, device-generated input, host-forced sync):

  hash       raw hash_windows over all blocks, summed (no sketch machinery)
  hashthr    hash + threshold mask against a fixed fake threshold + sum
  full       production sketch_chunked (tree strategy, group-merged)

Usage: python tools/sketch_ablate.py [--reps 5] [--k 31] [--s 10000]
Prints one JSON line per (shape, stage) with median seconds and Gbase/s.
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--s", type=int, default=10_000)
    args = ap.parse_args()

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")

    from functools import partial

    from miekki_tpu.ops import hash as H
    from miekki_tpu.ops import sketch as S
    from miekki_tpu.ops import u64

    k, s = args.k, args.s
    print(f"backend={jax.default_backend()} k={k} s={s} "
          f"warmup={S.WARMUP_STEPS} merge_every={S.MERGE_EVERY}", flush=True)

    def sync(x):
        return [np.asarray(v) for v in jax.tree.leaves(x)]

    def med(f, *a, reps=args.reps):
        sync(f(*a))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    @partial(jax.jit, static_argnames=("n", "w"))
    def gen(key, n, w):
        return jax.random.randint(key, (n, w), 0, 4,
                                  dtype=jnp.int32).astype(jnp.uint8)

    @jax.jit
    def hash_only(rows):
        g = 64  # the auto scan group at w=8K (STEP_TARGET)
        blocks = rows.reshape(-1, g, rows.shape[1])

        def body(carry, block):
            h, _ = H.hash_windows(block, k)
            return carry ^ h[0][0, 0] ^ h[1][-1, -1], None

        out, _ = jax.lax.scan(body, jnp.uint32(0), blocks)
        return out

    @jax.jit
    def hash_thr(rows):
        g = 64
        blocks = rows.reshape(-1, g, rows.shape[1])
        thr = (jnp.uint32(1 << 12), jnp.uint32(0))  # fake tight threshold

        def body(carry, block):
            h, _ = H.hash_windows(block, k)
            flat = (h[0].reshape(-1), h[1].reshape(-1))
            keep = u64.less(flat, thr)
            return carry + jnp.sum(keep.astype(jnp.int32)), None

        out, _ = jax.lax.scan(body, jnp.int32(0), blocks)
        return out

    def full(rows):
        return S.sketch_chunked(rows, k, s)

    shapes = {
        # (n_rows, row_width): stream = 16384 rows of 8K (134 Mbase);
        # genome = 1024 pow2-bucketed rows (a 4.6-Mbase genome's layout)
        "stream": (16384, (1 << 13) + k - 1),
        "genome": (1024, (1 << 13) + k - 1),
    }
    for name, (n, w) in shapes.items():
        rows = gen(jax.random.PRNGKey(0), n, w)
        sync(rows)
        bases = n * (w - k + 1)
        for stage, fn in (("hash", hash_only), ("hashthr", hash_thr),
                          ("full", full)):
            dt = med(fn, rows)
            print(json.dumps({
                "shape": name, "stage": stage, "median_s": round(dt, 4),
                "gbase_per_s": round(bases / dt / 1e9, 3),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
