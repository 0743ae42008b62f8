"""Measure TPU primitive costs that drive sketch/merge design decisions."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/..")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
print("backend:", jax.default_backend(), flush=True)

N, B = 1 << 19, 1 << 14
rng = np.random.default_rng(0)
hi = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
lo = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
mask = jnp.asarray(rng.random(N) < 0.01)

def t(name, f, *a, n=5):
    # HOST-FORCED sync: block_until_ready lies on this platform (see
    # docs/DESIGN.md) — np.asarray per iteration is the only honest timer.
    try:
        [np.asarray(x) for x in jax.tree.leaves(f(*a))]
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            [np.asarray(x) for x in jax.tree.leaves(f(*a))]
            ts.append(time.perf_counter()-t0)
        print(f"{name}: {min(ts)*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)

t("sort_u64_512k", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2)), hi, lo)
t("nonzero16k_512k", jax.jit(lambda m: jnp.nonzero(m, size=B, fill_value=N)[0]), mask)
t("topk16k_512k", jax.jit(lambda a: jax.lax.top_k(a, B)), hi)
t("cumsum_512k", jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32))), mask)
t("take16k_from_512k", jax.jit(lambda a, i: jnp.take(a, i, mode="fill", fill_value=0)),
  hi, jnp.asarray(rng.integers(0, N, size=B, dtype=np.int32)))
t("sort_u64_32k", jax.jit(lambda a, b: jax.lax.sort((a[:32768], b[:32768]), num_keys=2)), hi, lo)

# hash alone per step shape
from miekki_tpu.ops import hash as H
codes = jnp.asarray(rng.integers(0, 4, size=(64, 8222), dtype=np.uint8))
t("hash_64x8222", jax.jit(lambda c: H.hash_windows(c, 31)[0]), codes)
from miekki_tpu.ops import pallas_hash as PH
t("hash_pallas_64x8222", jax.jit(lambda c: PH.hash_windows_pallas(c, 31)[0]), codes)

# merge step alone
from miekki_tpu.ops import sketch as S, u64
sk = u64.inf_like((10000,))
hh = (hi, lo)
t("merge_step_current", jax.jit(lambda s0, s1, a, b: S.merge_into_sketch((s0, s1), (a, b), 10000)), sk[0], sk[1], hi, lo)
print("DONE", flush=True)
