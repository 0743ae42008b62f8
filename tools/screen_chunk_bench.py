"""Bench the screening survivor-join at config-4 shapes vs
MIEKKI_SCREEN_CHUNK (r3: the hard-coded 4096 forces ~340 while-loop steps
per 4.2M-base batch at the ~33% config-4 survivor rate).

Synthetic, device-generated: a 10M-value sorted flat DB (1000 genomes x
s=10k worth of values, uniform in the bottom third of hash space so the
threshold prefilter passes ~1/3 of read hashes — the measured config-4
rate) and 4.2M-base packed read batches.  Timed region = one
_screen_update dispatch, host-forced.

Usage: python tools/screen_chunk_bench.py [--chunks 4096,65536,524288]
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
    ap.add_argument("--chunks", default="4096,32768,262144,1048576")
    ap.add_argument("--m-db", type=int, default=10_000_000)
    ap.add_argument("--flat", type=int, default=1 << 22)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")

    from miekki_tpu import engine as E

    k, flat, m = args.k, args.flat, args.m_db
    print(f"backend={jax.default_backend()} m_db={m} flat={flat}", flush=True)

    # DB values uniform in [0, 2^64 / 3): threshold (max) passes ~1/3 of
    # uniform read hashes — the config-4 survivor regime.
    @jax.jit
    def gen_db(key):
        h = jax.random.bits(key, (m,), jnp.uint32) // 3
        l = jax.random.bits(jax.random.fold_in(key, 1), (m,), jnp.uint32)
        from miekki_tpu.ops import u64

        return u64.sort((h, l))

    db_hi, db_lo = gen_db(jax.random.PRNGKey(0))
    np.asarray(db_hi[:4])
    thr_hi, thr_lo = db_hi[-1], db_lo[-1]

    @jax.jit
    def gen_batch(key):
        return jax.random.randint(key, (flat + k - 1,), 0, 4,
                                  dtype=jnp.int32).astype(jnp.uint8)

    batch = gen_batch(jax.random.PRNGKey(1))
    np.asarray(batch[:4])

    results = {}
    base_acc = None
    points = [("searchsorted", int(x)) for x in args.chunks.split(",")]
    points.insert(0, ("merge", 0))
    for join, chunk in points:
        acc0 = jnp.zeros(m + 1, dtype=jnp.bool_)
        t0 = time.perf_counter()
        acc, nv, nk = E._screen_update(acc0, db_hi, db_lo, thr_hi, thr_lo,
                                       batch, k, False, chunk or None, join)
        got = np.asarray(acc)
        tag = join if join == "merge" else f"{join}-{chunk}"
        print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s "
              f"windows={int(nv)} survivors={int(nk)} hits={int(got.sum())}",
              flush=True)
        if base_acc is None:
            base_acc = got
        else:
            assert np.array_equal(base_acc, got), f"MISMATCH at {tag}"
        times = []
        for _ in range(args.reps):
            acc0 = jnp.zeros(m + 1, dtype=jnp.bool_)
            t0 = time.perf_counter()
            out = E._screen_update(acc0, db_hi, db_lo, thr_hi, thr_lo,
                                   batch, k, False, chunk or None, join)
            np.asarray(out[0][:8])
            _ = np.asarray(out[0])
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        results[tag] = {
            "median_s": round(med, 4),
            "mbase_per_s": round(flat / med / 1e6, 1),
            "times": [round(t, 4) for t in times]}
        print(f"{tag}: median {med*1e3:.0f} ms = "
              f"{flat/med/1e6:.1f} Mbase/s  {[round(t,3) for t in times]}",
              flush=True)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
