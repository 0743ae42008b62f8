"""Confirm the input-upload tax: same pipelines with DEVICE-GENERATED input."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
from miekki_tpu.ops import hash as H, sketch as S

k, s = 31, 10_000

@jax.jit
def gen(key):
    bits = jax.random.randint(key, (2048, 8222), 0, 4, dtype=jnp.int32)
    return bits.astype(jnp.uint8)

key = jax.random.PRNGKey(0)
blocks = gen(key)  # device-resident
np.asarray(blocks[0, :4])  # materialize

def t(name, f, *a, n=3):
    np.asarray(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)

@jax.jit
def stream_sum(b):
    return jnp.sum(b.astype(jnp.int32))
t("devgen_stream_sum", stream_sum, blocks)

@jax.jit
def hash_sum(b):
    h = H.hash_windows(b, k)[0]
    return jnp.sum(h[0]) + jnp.sum(h[1])
t("devgen_hash_sum", hash_sum, blocks)

import os
for strat in ("tree", "fused"):
    os.environ["MIEKKI_MERGE"] = strat
    S.sketch_chunked.clear_cache()
    f = jax.jit(lambda b: S.sketch_chunked(b, k, s)[0])
    try:
        t(f"devgen_sketch[{strat}]", f, blocks)
    except Exception as e:
        print(f"devgen_sketch[{strat}] FAILED: {type(e).__name__} {str(e)[:150]}", flush=True)
print("16.7 Mbase per call; DONE", flush=True)
