"""Ground-truth timing: np.asarray(result) forces real completion; check
time scales with input size to rule out async/DCE artifacts."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
from miekki_tpu.ops import sketch as S, intersect as I

k, s = 31, 10_000
rng = np.random.default_rng(0)

def t_host(name, f, *a, n=3):
    np.asarray(f(*a)[0])  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(out[0]); np.asarray(out[1])
        ts.append(time.perf_counter() - t0)
    return min(ts)

for NC in (2048,):
    rows = jnp.asarray(rng.integers(0, 4, size=(NC, 8192 + k - 1), dtype=np.uint8))
    f = jax.jit(lambda r: S.sketch_chunked(r, k, s))
    dt = t_host(f"sketch NC={NC}", f, rows)
    print(f"sketch NC={NC}: {dt*1e3:.2f} ms -> {NC*8192/dt/1e9:.3f} Gbase/s", flush=True)

T = 128
tab = np.sort(rng.integers(0, 2**63, size=(2*T, s), dtype=np.uint64), axis=-1)
hi = jnp.asarray((tab >> np.uint64(32)).astype(np.uint32)); lo = jnp.asarray((tab & np.uint64(0xFFFFFFFF)).astype(np.uint32))
import os
for impl in ("pallas",):
    os.environ["MIEKKI_INTERSECT"] = impl
    I.tile_counts.clear_cache()
    g = jax.jit(lambda a0,a1,b0,b1: I.tile_counts((a0,a1),(b0,b1),s))
    def gg(a0,a1,b0,b1):
        o = g(a0,a1,b0,b1); return (o["shared_in_x"], o["union_size"])
    dt = t_host("tile", gg, hi[:T], lo[:T], hi[T:], lo[T:])
    print(f"tile[{impl}]: {dt*1e3:.2f} ms -> {T*T/dt/1e3:.1f}k pairs/s", flush=True)
print("DONE", flush=True)
