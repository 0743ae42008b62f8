"""REAL multi-process distributed validation (M5's strongest evidence on a
single machine): two separate JAX processes bootstrap through
`jax.distributed.initialize` (gRPC coordinator — the same mechanism as
multi-host pods, with DCN-analog transport), form one global 2x4-device CPU
mesh, and run the ppermute-ring all-vs-all with the sketch DB sharded
across BOTH processes.  Each process checks its addressable slice of the
result against a locally-computed reference.

Run:  python tools/multiprocess_ring_test.py          (spawns both workers)
      JAX_COORD=localhost:9911 python ... --process-id 0|1   (manual)
"""

import os
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PORT = int(os.environ.get("MIEKKI_MPTEST_PORT", "9911"))
N_PROC = 2
DEV_PER_PROC = 4


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
    import numpy as np

    from miekki_tpu.parallel.mesh import DB_AXIS
    from miekki_tpu.parallel.allvsall import _ring_counts_local, shard_map
    from functools import partial
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == N_PROC
    devices = np.array(jax.devices()).reshape(N_PROC * DEV_PER_PROC)
    mesh = Mesh(devices, (DB_AXIS,))
    D = N_PROC * DEV_PER_PROC

    # deterministic global DB, identical in both processes
    rng = np.random.default_rng(0)
    s, n = 64, 4 * D
    table = np.sort(
        rng.integers(0, 2**63, size=(n, s), dtype=np.uint64), axis=-1
    )
    hi_np = (table >> np.uint64(32)).astype(np.uint32)
    lo_np = (table & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    sh_in = NamedSharding(mesh, P(DB_AXIS, None))

    def make_global(arr):
        return jax.make_array_from_callback(
            arr.shape, sh_in, lambda idx: arr[idx]
        )

    hi = make_global(hi_np)
    lo = make_global(lo_np)

    fn = jax.jit(
        shard_map(
            partial(_ring_counts_local, s=s, axis=DB_AXIS),
            mesh=mesh,
            in_specs=(P(DB_AXIS, None), P(DB_AXIS, None)),
            out_specs=(P(None, DB_AXIS, None),) * 3,
            check_vma=False,
        )
    )
    shared, union, inter = fn(hi, lo)

    # reference: local numpy intersection counts for the addressable slice
    nl = n // D

    def ref_counts(i, j):
        a = table[i][table[i] != np.uint64(0xFFFFFFFFFFFFFFFF)]
        b = table[j]
        inter = np.intersect1d(a, b, assume_unique=True)
        uni = np.union1d(a, b)
        x = uni[:s]
        return int(np.isin(x, inter, assume_unique=True).sum())

    checked = 0
    for piece in shared.addressable_shards:
        arr = np.asarray(piece.data)  # [D, nl_rows_of_this_shard, nl]
        row0 = piece.index[1].start or 0
        d = row0 // nl
        for t in range(D):
            origin = (d - t) % D
            for ri in range(nl):
                for ci in range(nl):
                    gi, gj = d * nl + ri, origin * nl + ci
                    assert arr[t, ri, ci] == ref_counts(gi, gj), (
                        t, d, ri, ci)
                    checked += 1
    print(f"[proc {process_id}] verified {checked} pair counts "
          f"across {jax.process_count()} processes OK", flush=True)
    return 0


def main() -> int:
    if "--process-id" in sys.argv:
        return worker(int(sys.argv[sys.argv.index("--process-id") + 1]))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--process-id", str(i)],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for i in range(N_PROC)
    ]
    rc = max(p.wait() for p in procs)
    print("ALL PROCESSES OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
