"""Attribute per-step sketch cost: every probe consumes its result via a
reduction so nothing is DCE'd, and only scalars cross to the host."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
from miekki_tpu.ops import hash as H, sketch as S, u64

k, s = 31, 10_000
rng = np.random.default_rng(0)
blk = jnp.asarray(rng.integers(0, 4, size=(64, 8222), dtype=np.uint8))
blocks = jnp.asarray(rng.integers(0, 4, size=(32, 64, 8222), dtype=np.uint8))
big_hi = jnp.asarray(rng.integers(0, 2**32, size=(1 << 19,), dtype=np.uint32))
big_lo = jnp.asarray(rng.integers(0, 2**32, size=(1 << 19,), dtype=np.uint32))

def t(name, f, *a, n=3):
    try:
        np.asarray(f(*a))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
        print(f"{name}: {min(ts)*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)

t("hash_1blk_sum", jax.jit(lambda b: H.hash_windows(b, k)[0][0].sum()), blk)

@jax.jit
def scan_hash_sum(bs):
    def body(c, b):
        h = H.hash_windows(b, k)[0]
        return c + h[0].sum() + h[1].sum(), None
    out, _ = jax.lax.scan(body, jnp.uint32(0), bs)
    return out
t("scan32_hash_sum", scan_hash_sum, blocks)

@jax.jit
def scan_hash_thr(bs):
    thr = (jnp.uint32(1 << 8), jnp.uint32(0))
    def body(c, b):
        h = H.hash_windows(b, k)[0]
        keep = u64.less(h, thr)
        return c + jnp.sum(keep.astype(jnp.int32)), None
    out, _ = jax.lax.scan(body, jnp.int32(0), bs)
    return out
t("scan32_hash_thr_count", scan_hash_thr, blocks)

t("topk16k_512k_sum", jax.jit(lambda a: jax.lax.top_k(a.astype(jnp.int32), 16384)[0].sum()), big_hi)
t("topk4k_512k_sum", jax.jit(lambda a: jax.lax.top_k(a.astype(jnp.int32), 4096)[0].sum()), big_hi)
t("sort512k_sum", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2)[0][:16].sum()), big_hi, big_lo)
t("merge26k", jax.jit(lambda a, b: S._merge_sorted_trunc(u64.inf_like((s,)), (a[:16384], b[:16384]), s)[0].sum()), big_hi, big_lo)

os.environ["MIEKKI_MERGE"] = "threshold"
S.sketch_chunked.clear_cache()
t("full_sketch_threshold", jax.jit(lambda bs: S.sketch_chunked(bs.reshape(2048, 8222), k, s)[0].sum()), blocks)
print("DONE", flush=True)
