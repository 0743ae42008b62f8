"""One-shot TPU eval: correctness vs oracle + perf for all impl variants."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from miekki_tpu.utils import compile_cache
compile_cache.enable()
print("backend:", jax.default_backend(), flush=True)
from miekki_tpu.oracle import nthash as O
from miekki_tpu.oracle import compare as OC
from miekki_tpu.ops import hash as H, sketch as S, intersect as I, u64
from miekki_tpu.ops import pallas_intersect as PI

rng = np.random.default_rng(0)
k = 31

def sync(x):
    # host-forced completion; block_until_ready is untrustworthy here
    [np.asarray(v) for v in jax.tree.leaves(x)]
    return x

def timeit(f, *a, n=4):
    sync(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); sync(f(*a)); ts.append(time.perf_counter() - t0)
    return min(ts)

# ---------- correctness: hash ----------
codes = rng.integers(0, 5, size=2048 + k - 1, dtype=np.int64)
oh, ov = O.hash_kmers(codes, k)
codes2d_x = jnp.asarray(codes[None, :].repeat(8, 0), jnp.int32)
(dh, dl), dv = H.hash_windows(codes2d_x, k)
dev = u64.join(np.asarray(dh)[0], np.asarray(dl)[0])
ref = np.where(ov, oh, np.uint64(0xFFFFFFFFFFFFFFFF))
print("hash xla mismatches:", int((dev != ref).sum()), "/", len(dev), flush=True)

from miekki_tpu.ops import pallas_hash as PH
codes2 = codes[None, :].repeat(8, 0)
(ph, pl2), pv = PH.hash_windows_pallas(jnp.asarray(codes2, jnp.int32), k)
pdev = u64.join(np.asarray(ph)[0], np.asarray(pl2)[0])
print("hash pallas mismatches:", int((pdev != ref).sum()), "/", len(ref), flush=True)

# ---------- correctness: sketch ----------
g = rng.integers(0, 4, size=100_000, dtype=np.int64)
want = np.unique(O.canonical_hashes(g, k))[:1000]
for impl in ("xla", "pallas"):
    os.environ["MIEKKI_HASH"] = impl
    got = S.sketch_codes_device(g.astype(np.uint8), k, 1000)
    print(f"sketch[{impl}] == oracle:", np.array_equal(got, want), flush=True)

# ---------- correctness: intersect (8x8 tile vs numpy oracle) ----------
s_small = 256
sketches = []
for i in range(16):
    gg = rng.integers(0, 4, size=3000, dtype=np.int64)
    if i % 2: gg[:1500] = sketches_src  # overlap with prev genome
    sketches_src = gg[:1500].copy()
    sketches.append(np.unique(O.canonical_hashes(gg, k))[:s_small])
pad = np.uint64(0xFFFFFFFFFFFFFFFF)
tab = np.full((16, s_small), pad, np.uint64)
for i, sk in enumerate(sketches): tab[i, :len(sk)] = sk
hi = jnp.asarray((tab >> np.uint64(32)).astype(np.uint32)); lo = jnp.asarray((tab & np.uint64(0xFFFFFFFF)).astype(np.uint32))
rows, cols = (hi[:8], lo[:8]), (hi[8:], lo[8:])
oracle_shared = np.zeros((8, 8), np.int64); oracle_union = np.zeros((8, 8), np.int64)
for i in range(8):
    for j in range(8):
        sh, un, _ = OC.mash_jaccard(sketches[i], sketches[8 + j], s_small)
        oracle_shared[i, j], oracle_union[i, j] = sh, un
for impl in ("bitonic", "pallas", "mxu"):
    os.environ["MIEKKI_INTERSECT"] = impl
    c = I.tile_counts(rows, cols, s_small)
    ok = np.array_equal(np.asarray(c["shared_in_x"]), oracle_shared) and \
         np.array_equal(np.asarray(c["union_size"]), oracle_union)
    print(f"intersect[{impl}] == oracle:", ok, flush=True)
os.environ.pop("MIEKKI_INTERSECT", None)

# ---------- perf: sketch ----------
s = 10_000
C, NC = 1 << 13, 2048
big = jnp.asarray(rng.integers(0, 4, size=(NC, C + k - 1), dtype=np.uint8))
for impl in ("xla", "pallas"):
    os.environ["MIEKKI_HASH"] = impl
    f = lambda r: S.sketch_chunked(r, k, s)
    dt = timeit(f, big)
    print(f"PERF sketch[{impl}]: {dt*1e3:.2f} ms = {NC*C/dt/1e9:.2f} Gbase/s", flush=True)

# ---------- perf: intersect ----------
T = 128
tab = np.sort(rng.integers(0, 2**63, size=(2*T, s), dtype=np.uint64), axis=-1)
thi = jnp.asarray((tab >> np.uint64(32)).astype(np.uint32)); tlo = jnp.asarray((tab & np.uint64(0xFFFFFFFF)).astype(np.uint32))
rows, cols = (thi[:T], tlo[:T]), (thi[T:], tlo[T:])
for impl in ("pallas", "bitonic"):
    os.environ["MIEKKI_INTERSECT"] = impl
    f = lambda a0, a1, b0, b1: I.tile_counts((a0, a1), (b0, b1), s)
    try:
        dt = timeit(f, rows[0], rows[1], cols[0], cols[1])
        print(f"PERF intersect[{impl}]: {dt*1e3:.2f} ms = {T*T/dt/1e3:.1f}k pairs/s", flush=True)
    except Exception as e:
        print(f"PERF intersect[{impl}] FAILED: {type(e).__name__} {str(e)[:160]}", flush=True)
print("DONE", flush=True)

# ---------- correctness: screen step vs oracle (on device) ----------
def _check_screen():
    import jax.numpy as jnp
    from miekki_tpu import engine as E
    rng2 = np.random.default_rng(5)
    k2 = 31
    codes_pre = rng2.integers(0, 4, size=65536 + k2 - 1, dtype=np.int64)
    h_pre, v_pre = O.hash_kmers(codes_pre, k2)
    planted = rng2.choice(np.unique(h_pre[v_pre]), size=2000, replace=False)
    noise = rng2.integers(0, 1 << 62, size=3000, dtype=np.uint64)
    db_vals = np.unique(np.concatenate([planted, noise]))
    dbh = jnp.asarray((db_vals >> np.uint64(32)).astype(np.uint32))
    dbl = jnp.asarray((db_vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    thr = db_vals[-1]
    th = jnp.uint32(int(thr >> np.uint64(32))); tl = jnp.uint32(int(thr & np.uint64(0xFFFFFFFF)))
    codes = codes_pre  # reads whose hashes contain the planted db values
    h_all, v_all = h_pre, v_pre
    hits_oracle = np.isin(db_vals, h_all[v_all])
    acc = jnp.zeros(len(db_vals) + 1, dtype=jnp.bool_)
    # _screen_update_impl returns (bitmap, n_windows, n_survivors) since the
    # r2 survivor-rate observability change
    acc, n_win, n_surv = jax.jit(
        lambda a, b: E._screen_update_impl(a, dbh, dbl, th, tl, b, k2))(
        acc, jnp.asarray(codes, jnp.int32).astype(jnp.uint8))
    got_first = np.asarray(acc)[:-1]
    first_occ = np.searchsorted(db_vals, db_vals, side="left")
    got = got_first[first_occ]
    print("screen step == oracle membership:", np.array_equal(got, hits_oracle),
          f"(matches: {int(hits_oracle.sum())})", flush=True)

_check_screen()
print("DONE2", flush=True)


# ---------- correctness + perf: compact (single-plane) path ----------
def _check_compact():
    from miekki_tpu.ops import compact as CP
    from miekki_tpu.ops import intersect as I2

    rng3 = np.random.default_rng(9)
    # device encoder vs host encoder on random + per-exponent values
    v = np.concatenate([
        rng3.integers(0, 1 << 63, size=8192, dtype=np.uint64) * 2
        + rng3.integers(0, 2, size=8192, dtype=np.uint64),
        np.array([(np.uint64(1) << np.uint64(e)) for e in range(64)],
                 dtype=np.uint64),
        np.array([0, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64),
    ])
    want = CP.encode_u64(v)
    got = np.asarray(CP.encode_pair(
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))))
    print("compact encode device == host:", np.array_equal(got, want), flush=True)

    # single-plane pallas kernel vs pair path on (code, 0) planes
    s2 = 512
    tabc = np.sort(rng3.integers(0, 1 << 31, size=(16, s2), dtype=np.int64)
                   .astype(np.uint32), axis=-1)
    tabc[:, -7:] = np.uint32(0xFFFFFFFF)
    r32 = jnp.asarray(tabc[:8]); c32 = jnp.asarray(tabc[8:])
    zeros_r = jnp.where(r32 == np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF),
                        np.uint32(0))
    zeros_c = jnp.where(c32 == np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF),
                        np.uint32(0))
    ref = I2.tile_counts((r32, zeros_r), (c32, zeros_c), s2, impl="bitonic")
    got32 = I2.tile_counts_compact(r32, c32, s2, impl="pallas")
    ok = all(np.array_equal(np.asarray(ref[key]), np.asarray(got32[key]))
             for key in ("shared_in_x", "union_size", "inter_full"))
    print("compact pallas32 == pair path:", ok, flush=True)

    # x2 column-unrolled single-plane kernel (VMEM-feasible at s=10k only
    # on the compact plane) vs unroll=1, compiled on silicon
    from miekki_tpu.ops import pallas_intersect as PI2
    u1 = PI2.tile_counts_pallas32(r32, c32, s2, unroll=1)
    u2 = PI2.tile_counts_pallas32(r32, c32, s2, unroll=2)
    ok2 = all(np.array_equal(np.asarray(u1[key]), np.asarray(u2[key]))
              for key in ("shared_in_x", "union_size", "inter_full"))
    print("compact pallas32 unroll2 == unroll1:", ok2, flush=True)

    # perf: compact kernel at production shapes
    s3 = 10_000
    T2 = 128
    tabp = np.sort(rng3.integers(0, 1 << 31, size=(2 * T2, s3), dtype=np.int64)
                   .astype(np.uint32), axis=-1)
    rp = jnp.asarray(tabp[:T2]); cp_ = jnp.asarray(tabp[T2:])
    f32 = lambda a, b: I2.tile_counts_compact(a, b, s3, impl="pallas")
    try:
        dt = timeit(f32, rp, cp_)
        print(f"PERF intersect[compact-pallas]: {dt*1e3:.2f} ms = "
              f"{T2*T2/dt/1e3:.1f}k pairs/s", flush=True)
    except Exception as e:
        print(f"PERF intersect[compact-pallas] FAILED: "
              f"{type(e).__name__} {str(e)[:160]}", flush=True)
    tgt = -(-s3 // 128) * 128  # the kernel needs 128-aligned widths
    rp_p, cp_p = I2._pad32(rp, tgt), I2._pad32(cp_, tgt)
    for unroll in (1, 2):
        from miekki_tpu.ops import pallas_intersect as PI2

        fu = lambda a, b: PI2.tile_counts_pallas32(a, b, s3, unroll=unroll)
        try:
            dt = timeit(fu, rp_p, cp_p)
            print(f"PERF intersect[compact-pallas-u{unroll}]: {dt*1e3:.2f} ms"
                  f" = {T2*T2/dt/1e3:.1f}k pairs/s", flush=True)
        except Exception as e:
            print(f"PERF intersect[compact-pallas-u{unroll}] FAILED: "
                  f"{type(e).__name__} {str(e)[:160]}", flush=True)

_check_compact()
print("DONE3", flush=True)
