"""Round-final consolidated TPU evaluation: correctness spot checks + honest
perf for every hot path, one process, host-forced sync."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
print("backend:", jax.default_backend(), flush=True)
from miekki_tpu.oracle import nthash as O
from miekki_tpu.ops import sketch as S, intersect as I, u64
from miekki_tpu import engine

k, s = 31, 10_000
rng = np.random.default_rng(0)

def sync_host(out):
    return [np.asarray(x) for x in jax.tree.leaves(out)]

def t_host(f, *a, n=3):
    sync_host(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); sync_host(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)

# ---- correctness: sketch (tree) vs oracle ----
g = rng.integers(0, 4, size=100_000, dtype=np.int64)
got = S.sketch_codes_device(g.astype(np.uint8), k, 1000)
want = np.unique(O.canonical_hashes(g, k))[:1000]
print("sketch == oracle:", np.array_equal(got, want), flush=True)

# ---- perf: sketch (device-generated input, big workload) ----
NC = 16384
rows = jax.random.randint(jax.random.PRNGKey(0), (NC, 8192 + k - 1), 0, 4,
                          dtype=jnp.int32).astype(jnp.uint8)
sync_host(rows[:1, :4])
f = jax.jit(lambda r: S.sketch_chunked(r, k, s))
dt = t_host(f, rows)
print(f"PERF sketch: {dt*1e3:.1f} ms = {NC*8192/dt/1e9:.3f} Gbase/s", flush=True)

# ---- perf: intersection tile (pallas) ----
hi = jax.random.bits(jax.random.PRNGKey(1), (256, s), jnp.uint32) >> 1
lo = jax.random.bits(jax.random.PRNGKey(2), (256, s), jnp.uint32)
hi, lo = jax.lax.sort((hi, lo), dimension=-1, num_keys=2)
sync_host((hi[:1, :4],))
gtile = jax.jit(lambda a0, a1, b0, b1: I.tile_counts((a0, a1), (b0, b1), s))
def gt(a0, a1, b0, b1):
    o = gtile(a0, a1, b0, b1)
    return (o["shared_in_x"], o["union_size"])
dt = t_host(gt, hi[:128], lo[:128], hi[128:], lo[128:])
print(f"PERF tile: {dt*1e3:.1f} ms = {128*128/dt/1e3:.1f}k pairs/s", flush=True)

# ---- perf: screen step (hash+filter+join) on a 1M-base device batch ----
F = 1 << 20
db_vals = np.sort(rng.integers(0, 1 << 44, size=(1000 * s,), dtype=np.uint64))
db_hi = jnp.asarray((db_vals >> np.uint64(32)).astype(np.uint32))
db_lo = jnp.asarray((db_vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
thr_hi = jnp.uint32(int(db_vals[-1] >> np.uint64(32)))
thr_lo = jnp.uint32(int(db_vals[-1] & np.uint64(0xFFFFFFFF)))
batch = jax.random.randint(jax.random.PRNGKey(3), (F + k - 1,), 0, 4,
                           dtype=jnp.int32).astype(jnp.uint8)
sync_host(batch[:4])
acc0 = jnp.zeros(len(db_vals) + 1, dtype=jnp.bool_)

@jax.jit
def screen_step(acc, b):
    return engine._screen_update_impl(acc, db_hi, db_lo, thr_hi, thr_lo, b, k)

dt = t_host(lambda b: screen_step(acc0, b), batch)
print(f"PERF screen: {dt*1e3:.1f} ms = {F/dt/1e6:.1f} Mbase/s/batch-call",
      flush=True)
print("DONE", flush=True)
