"""Isolate why sketch_chunked is 30x slower than its parts."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
from miekki_tpu.ops import hash as H, sketch as S, u64

k, s = 31, 10_000
rng = np.random.default_rng(0)
NC, C = 2048, 8192
rows = jnp.asarray(rng.integers(0, 4, size=(NC, C + k - 1), dtype=np.uint8))
blocks = rows.reshape(32, 64, C + k - 1)

def t(name, f, *a, n=4):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)

@jax.jit
def scan_hash_only(b):
    def body(carry, blk):
        h = H.hash_windows(blk, k)[0]
        return carry ^ h[0][0, 0], None
    out, _ = jax.lax.scan(body, jnp.uint32(0), b)
    return out

@jax.jit
def scan_hash_merge(b):
    def body(carry, blk):
        h = H.hash_windows(blk, k)[0]
        flat = (h[0].reshape(-1), h[1].reshape(-1))
        return S.merge_into_sketch(carry, flat, s), None
    out, _ = jax.lax.scan(body, S.empty_sketch(s), b)
    return out

@jax.jit
def loop_hash_merge(b):
    sk = S.empty_sketch(s)
    for i in range(b.shape[0]):
        h = H.hash_windows(b[i], k)[0]
        sk = S.merge_into_sketch(sk, (h[0].reshape(-1), h[1].reshape(-1)), s)
    return sk

t("scan_hash_only", scan_hash_only, blocks)
t("scan_hash_merge", scan_hash_merge, blocks)
t("unrolled_hash_merge", loop_hash_merge, blocks)
print("DONE", flush=True)
