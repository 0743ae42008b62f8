"""2-process host-orchestrated ring (VERDICT r4 #5): per-process
orchestration of LOCAL devices + the gRPC-bootstrapped traced collective for
the cross-process rotation — the pod-production shape of
parallel.allvsall.dist_sharded_hostring.

Each of 2 processes owns 4 of the 8 CPU-mesh devices.  A row blocks stay
resident per device with their sub-block streams sorted once; each ring
step runs the small cached-compile mxu tile dispatches on the process's
ADDRESSABLE shards only (host-orchestrated, async per device), while the
column state (planes + 3-plane streams) rotates as GLOBAL arrays through
one tiny jitted shard_map ppermute program — the only traced collective,
executed by both processes in lockstep (the host cannot device_put across
process boundaries; on a real pod this ppermute rides ICI/DCN).  Ambiguity
resolution is deferred across all steps and resolved per process on the
host table.  Each process verifies its owned rows bitwise against a local
numpy two-pointer reference.

Run:  python tools/multiprocess_hostring_test.py        (spawns 2 workers)
      ... --process-id 0|1                              (manual)
"""

import os
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PORT = int(os.environ.get("MIEKKI_HOSTRING_PORT", "9953"))
N_PROC = 2
DEV_PER_PROC = 4
TILE = 3
N_SUB = 2          # sub-blocks per device row block
S = 64


def worker(process_id: int) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    from functools import partial

    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from miekki_tpu.ops import mxu_intersect as _mxu
    from miekki_tpu.parallel.allvsall import shard_map
    from miekki_tpu.parallel.mesh import DB_AXIS

    assert jax.process_count() == N_PROC
    devices = list(np.array(jax.devices()).reshape(-1))
    mesh = Mesh(np.array(devices), (DB_AXIS,))
    D = len(devices)
    nl = N_SUB * TILE
    n = D * nl
    s = S

    # deterministic global DB with heavy value sharing (forces lb != ub
    # ambiguity through the mxu brackets), identical in both processes
    rng = np.random.default_rng(7)
    pool = np.unique(rng.integers(0, 2**40, size=6 * s, dtype=np.uint64))
    table = np.stack([
        np.sort(rng.choice(pool, size=s, replace=False)) for _ in range(n)
    ])
    hi_np = (table >> np.uint64(32)).astype(np.uint32)
    lo_np = (table & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    local = [d for d in devices if d.process_index == process_id]
    dev_index = {id(d): devices.index(d) for d in local}

    # A row blocks: committed per local device, streams sorted once
    row_planes = {}
    row_streams = {}
    for d in local:
        g = dev_index[id(d)]
        sl = np.s_[g * nl:(g + 1) * nl]
        ph = jax.device_put(hi_np[sl], d)
        pl = jax.device_put(lo_np[sl], d)
        row_planes[g] = (ph, pl)
        row_streams[g] = [
            _mxu.sketch_stream((ph[i * TILE:(i + 1) * TILE],
                                pl[i * TILE:(i + 1) * TILE]), False)
            for i in range(N_SUB)
        ]

    # global column state: planes [D, nl, s] and stacked streams
    # [D, N_SUB, 3, TILE*s], sharded one device-block each
    sh1 = NamedSharding(mesh, P(DB_AXIS))
    L = TILE * s

    def make_global(shape, fill):
        pieces = []
        for d in local:
            g = dev_index[id(d)]
            pieces.append(jax.device_put(fill(g), d))
        return jax.make_array_from_single_device_arrays(shape, sh1, pieces)

    cp_hi = make_global((D, nl, s),
                        lambda g: hi_np[g * nl:(g + 1) * nl][None])
    cp_lo = make_global((D, nl, s),
                        lambda g: lo_np[g * nl:(g + 1) * nl][None])

    def col_stack(g):
        subs = []
        for i in range(N_SUB):
            st = _mxu.stream_with_col_tag(row_streams[g][i])
            subs.append(jnp.stack(st))
        return jnp.stack(subs)[None]  # [1, N_SUB, 3, L]

    cst = make_global((D, N_SUB, 3, L), col_stack)

    perm = [(i, (i + 1) % D) for i in range(D)]
    spec = P(DB_AXIS)

    @jax.jit
    def rotate(a, b, c):
        return shard_map(
            lambda x, y, z: tuple(
                lax.ppermute(v, DB_AXIS, perm) for v in (x, y, z)),
            mesh=mesh, in_specs=(spec,) * 3, out_specs=(spec,) * 3,
            check_vma=False,
        )(a, b, c)

    shared = np.zeros((n, n), np.int32)
    inter = np.zeros((n, n), np.int32)
    amb = []
    for t in range(D):
        # local shards of the current column state, keyed by device
        col_shards = {}
        for piece in cp_hi.addressable_shards:
            col_shards.setdefault(dev_index[id(piece.device)], {})[
                "hi"] = piece.data[0]
        for piece in cp_lo.addressable_shards:
            col_shards[dev_index[id(piece.device)]]["lo"] = piece.data[0]
        for piece in cst.addressable_shards:
            col_shards[dev_index[id(piece.device)]]["st"] = piece.data[0]
        handles = []
        for g in sorted(col_shards):
            o = (g - t) % D  # origin of the block device g holds at step t
            cs = col_shards[g]
            for i in range(N_SUB):
                for j in range(N_SUB):
                    cj = np.s_[j * TILE:(j + 1) * TILE]
                    stj = cs["st"][j]
                    h = _mxu.tile_counts_mxu_start(
                        (row_planes[g][0][i * TILE:(i + 1) * TILE],
                         row_planes[g][1][i * TILE:(i + 1) * TILE]),
                        (cs["hi"][cj], cs["lo"][cj]), s,
                        row_stream=row_streams[g][i],
                        col_stream=(stj[0], stj[1], stj[2]), slim=True)
                    handles.append((g, o, i, j, h))
        if t + 1 < D:
            # the ONE traced collective: both processes execute in lockstep
            cp_hi, cp_lo, cst = rotate(cp_hi, cp_lo, cst)
        for g, o, i, j, h in handles:
            res, ai, aj = _mxu.tile_counts_mxu_finish_deferred(h)
            r0 = g * nl + i * TILE
            c0 = o * nl + j * TILE
            shared[r0:r0 + TILE, c0:c0 + TILE] = res["shared_in_x"]
            inter[r0:r0 + TILE, c0:c0 + TILE] = res["inter_full"]
            if ai.size:
                amb.append((r0 + ai, c0 + aj))
    if amb:
        ai = np.concatenate([a for a, _ in amb])
        aj = np.concatenate([b for _, b in amb])
        shared[ai, aj] = _mxu.resolve_pairs_host(
            (hi_np, lo_np), (hi_np, lo_np), ai, aj, s)

    # bitwise verification of this process's OWNED rows vs a local oracle
    def ref_counts(i, j):
        a, b = table[i], table[j]
        it = np.intersect1d(a, b, assume_unique=True)
        uni = np.union1d(a, b)[:s]
        return (int(np.isin(uni, it, assume_unique=True).sum()),
                int(len(it)))

    checked = n_amb = 0
    own = sorted(row_planes)
    for g in own:
        for ri in range(g * nl, (g + 1) * nl):
            for cj in range(n):
                want_sh, want_it = ref_counts(ri, cj)
                assert shared[ri, cj] == want_sh, (ri, cj)
                assert inter[ri, cj] == want_it, (ri, cj)
                checked += 1
    n_amb = sum(len(a) for a, _ in amb)
    assert n_amb > 0, "fixture must exercise the deferred resolve"
    print(f"[proc {process_id}] hostring-mp verified {checked} pairs "
          f"({n_amb} deferred-resolved) across {jax.process_count()} "
          "processes OK", flush=True)
    return 0


def main() -> int:
    if "--process-id" in sys.argv:
        return worker(int(sys.argv[sys.argv.index("--process-id") + 1]))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--process-id",
             str(i)],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for i in range(N_PROC)
    ]
    rc = max(p.wait() for p in procs)
    print("HOSTRING-MP OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
