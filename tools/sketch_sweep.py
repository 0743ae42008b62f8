"""Sweep the sketch pipeline's step-structure knobs on silicon (NEXT_ROUND
r3 item 4: the 1.2 Gbase/s headline's residue may be step-count-bound).

Knobs:
  * group — chunk rows per scan step (bases/step = group * 8192); the
    production auto picks STEP_TARGET // 8192 = 64.
  * MERGE_EVERY — steps per bottom-s sort-dedup merge in the group-merged
    tree path (production 8).

Each point re-jits a closure over the unjitted `_sketch_chunked` body so
MERGE_EVERY (a trace-time module constant) is honestly re-traced; the
persistent compile cache makes repeat sweeps cheap.  Timing is
host-forced (np.asarray) per the platform discipline (docs/DESIGN.md).

Usage: python tools/sketch_sweep.py [--groups 64,128] [--merges 8,16,32]
       [--n-chunks 16384] [--reps 5]
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
    ap.add_argument("--groups", default="64")
    ap.add_argument("--merges", default="8,16,32")
    ap.add_argument("--n-chunks", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=1 << 13)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--s", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")

    from miekki_tpu.ops import sketch as S

    k, s, chunk, n_chunks = args.k, args.s, args.chunk, args.n_chunks
    print(f"backend={jax.default_backend()} bases/call="
          f"{n_chunks * chunk / 1e6:.0f}M s={s} k={k}", flush=True)

    @jax.jit
    def gen(key):
        return jax.random.randint(
            key, (n_chunks, chunk + k - 1), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)

    rows = gen(jax.random.PRNGKey(0))
    np.asarray(rows[0, :8])  # force

    body = S._sketch_chunked.__wrapped__  # unjitted: re-trace per point
    bases = n_chunks * chunk
    results = {}
    baseline = None

    for g in [int(x) for x in args.groups.split(",")]:
        for me in [int(x) for x in args.merges.split(",")]:
            S.MERGE_EVERY = me
            f = jax.jit(lambda c, _g=g: body(c, k, s, _g, "tree", "auto", 1))
            t0 = time.perf_counter()
            out = f(rows)
            got = tuple(np.asarray(x) for x in out)
            print(f"group={g} merge_every={me} compile+first: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            if baseline is None:
                baseline = got
            else:
                assert all(np.array_equal(a, b)
                           for a, b in zip(baseline, got)), \
                    f"MISMATCH at group={g} merge_every={me}"
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                [np.asarray(x) for x in f(rows)]
                times.append(time.perf_counter() - t0)
            times.sort()
            med = times[len(times) // 2]
            gbs = bases / med / 1e9
            results[f"g{g}_m{me}"] = {
                "median_s": round(med, 4), "gbase_s": round(gbs, 3),
                "times": [round(t, 4) for t in times]}
            print(f"group={g} merge_every={me}: median {med*1e3:.1f} ms "
                  f"-> {gbs:.3f} Gbase/s  {[round(t,3) for t in times]}",
                  flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
