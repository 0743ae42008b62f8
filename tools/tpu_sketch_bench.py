"""Honest sketch benchmark: merge strategies x hash impls, host-sync timing."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
from miekki_tpu.ops import sketch as S

k, s = 31, 10_000
rng = np.random.default_rng(0)
NC, C = 2048, 8192
rows = jnp.asarray(rng.integers(0, 4, size=(NC, C + k - 1), dtype=np.uint8))

def t_host(f, *a, n=3):
    [np.asarray(x) for x in f(*a)]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*a)
        [np.asarray(x) for x in out]
        ts.append(time.perf_counter() - t0)
    return min(ts)

for merge in ("fused", "tree", "threshold", "sort"):
    for hash_impl in ("xla", "pallas"):
        os.environ["MIEKKI_MERGE"] = merge
        os.environ["MIEKKI_HASH"] = hash_impl
        f = jax.jit(lambda r: S.sketch_chunked(r, k, s))
        try:
            dt = t_host(f, rows)
            print(f"sketch[{merge}/{hash_impl}]: {dt*1e3:.2f} ms = "
                  f"{NC*C/dt/1e9:.3f} Gbase/s", flush=True)
        except Exception as e:
            print(f"sketch[{merge}/{hash_impl}] FAILED: {type(e).__name__} {str(e)[:150]}",
                  flush=True)
print("DONE", flush=True)
