"""Pin the fixed per-step cost: (a) scan that only streams+sums the block,
(b) scan that hashes and sums all hashes. Host-forced sync."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
from miekki_tpu.ops import hash as H

k = 31
rng = np.random.default_rng(0)
blocks = jnp.asarray(rng.integers(0, 4, size=(32, 64, 8222), dtype=np.uint8))

def t(name, f, *a, n=3):
    np.asarray(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms total, {min(ts)/32*1e3:.3f} ms/step", flush=True)

@jax.jit
def scan_stream(bs):
    def body(c, b):
        return c + jnp.sum(b.astype(jnp.int32)), None
    out, _ = jax.lax.scan(body, jnp.int32(0), bs)
    return out
t("scan32_stream_sum", scan_stream, blocks)

@jax.jit
def scan_hash(bs):
    def body(c, b):
        h = H.hash_windows(b, k)[0]
        return c + jnp.sum(h[0]) + jnp.sum(h[1]), None
    out, _ = jax.lax.scan(body, jnp.uint32(0), bs)
    return out
t("scan32_hash_sum", scan_hash, blocks)

@jax.jit
def nohash_once(bs):
    h = H.hash_windows(bs.reshape(2048, 8222), k)[0]
    return jnp.sum(h[0]) + jnp.sum(h[1])
t("hash_flat_2048rows", nohash_once, blocks)
print("DONE", flush=True)
