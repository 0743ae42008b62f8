"""Attribute the screen step's ~130ms/Mbase cost: each component timed
separately with host-forced sync and DCE-proof consumption."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from miekki_tpu.utils import compile_cache
compile_cache.enable()
from miekki_tpu.ops import hash as H, intersect as I, u64
from miekki_tpu import engine

k = 31
F = 1 << 20
rng = np.random.default_rng(0)
batch = jax.random.randint(jax.random.PRNGKey(3), (F + k - 1,), 0, 4,
                           dtype=jnp.int32).astype(jnp.uint8)
db_vals = np.sort(rng.integers(0, 1 << 44, size=(10_000_000,), dtype=np.uint64))
db_hi = jnp.asarray((db_vals >> np.uint64(32)).astype(np.uint32))
db_lo = jnp.asarray((db_vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))

def t(name, f, *a, n=3):
    try:
        np.asarray(f(*a))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)

t("a_hash1d_1M", jax.jit(lambda b: H.hash_windows(b, k)[0][0].sum()), batch)

@jax.jit
def b_sort_partition(b):
    h, _ = H.hash_windows(b, k)
    n = h[0].shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    key = jnp.where(h[0] < (1 << 12), pos, n + pos)
    _, ph, pl = jax.lax.sort((key, h[0], h[1]), num_keys=1)
    return ph[:16].sum() + pl[:16].sum()
t("b_hash+partition", b_sort_partition, batch)

@jax.jit
def c_join(b):
    acc = jnp.zeros(len(db_vals) + 1, dtype=jnp.bool_)
    thr_hi = jnp.uint32(1 << 12)
    return engine._screen_update_impl(acc, db_hi, db_lo, thr_hi, jnp.uint32(0),
                                      b, k).sum()
t("c_full_screen_step", c_join, batch)

# searchsorted of 4096 needles into 10M haystack, alone
needles = (jnp.asarray(rng.integers(0, 1 << 44, size=4096, dtype=np.uint64) >> np.uint64(32), jnp.uint32) ,
           jnp.asarray(rng.integers(0, 2**32, size=4096, dtype=np.uint64).astype(np.uint32)))
t("d_searchsorted_4k_in_10M",
  jax.jit(lambda n0, n1: I.searchsorted_u64((db_hi, db_lo), (n0, n1)).sum()),
  needles[0], needles[1])
print("DONE", flush=True)
