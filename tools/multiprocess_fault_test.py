"""Multi-host fault injection + manifest resume (SURVEY.md §5 "Failure
detection": kill a host mid-run, restart, assert the resumed run reproduces
the full bitwise-identical matrix; VERDICT r1 missing #5 / next-round #8).

Two separate JAX processes (gRPC coordinator, 4 faked CPU devices each)
run the chunked ppermute-ring all-vs-all (`parallel.allvsall.
ring_chunk_counts`): the D=8 ring steps are split into 4 chunks of 2; each
process checkpoints its addressable slice of every completed chunk to a
.npz + manifest file.  The orchestrator then:

  1. runs an uninterrupted GOLDEN 2-process job;
  2. runs a FAULT job where process 1 calls os._exit(17) right after
     committing chunk 1 (process 0, stuck in chunk 2's collective without
     its peer, is killed by PID by the orchestrator — the external
     failure-detector role);
  3. restarts the job on the same state dir: processes agree on the resume
     point (min first-missing chunk across processes, via
     multihost_utils.process_allgather), recompute from there, and verify
     their local count blocks against an independent numpy reference;
  4. asserts every chunk artifact of the resumed run is bitwise-identical
     to the golden run's.

Run:  python tools/multiprocess_fault_test.py
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PORT = int(os.environ.get("MIEKKI_FAULT_PORT", "9923"))
N_PROC = 2
DEV_PER_PROC = 4
D = N_PROC * DEV_PER_PROC          # ring size (mesh devices)
CHUNK_STEPS = 2
N_CHUNKS = D // CHUNK_STEPS
S, NL = 64, 2                      # sketch width, genomes per device
N = D * NL


def _state_paths(state_dir: str, chunk: int, pid: int):
    return os.path.join(state_dir, f"chunk{chunk}_proc{pid}.npz")


def _make_db():
    import numpy as np

    rng = np.random.default_rng(0)
    table = np.sort(
        rng.integers(0, 2**40, size=(N, S), dtype=np.uint64), axis=-1
    )
    # force real overlaps: every third genome shares half its hashes
    table[2::3, : S // 2] = table[1::3, : S // 2]
    table = np.sort(table, axis=-1)
    for row in table:  # re-unique per row (sketches are distinct sets)
        u = np.unique(row)
        row[: len(u)] = u
        row[len(u):] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return table


def worker(process_id: int, state_dir: str, die_after: int) -> int:
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
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from miekki_tpu.parallel.allvsall import ring_chunk_counts
    from miekki_tpu.parallel.mesh import DB_AXIS

    devices = np.array(jax.devices())
    mesh = Mesh(devices, (DB_AXIS,))
    table = _make_db()
    hi_np = (table >> np.uint64(32)).astype(np.uint32)
    lo_np = (table & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sh_in = NamedSharding(mesh, P(DB_AXIS, None))
    hi = jax.make_array_from_callback(hi_np.shape, sh_in, lambda i: hi_np[i])
    lo = jax.make_array_from_callback(lo_np.shape, sh_in, lambda i: lo_np[i])

    # resume point: first chunk THIS process is missing, then the global
    # minimum across processes (peers must enter every collective together)
    mine = next(
        (c for c in range(N_CHUNKS)
         if not os.path.exists(_state_paths(state_dir, c, process_id))),
        N_CHUNKS,
    )
    start = int(multihost_utils.process_allgather(np.int32(mine)).min())
    print(f"[proc {process_id}] resuming at chunk {start}", flush=True)

    for c in range(start, N_CHUNKS):
        shared, union, inter = ring_chunk_counts(
            hi, lo, s=S, mesh=mesh, t0=c * CHUNK_STEPS,
            n_steps=CHUNK_STEPS,
        )
        # checkpoint the addressable slice (rows owned by this process)
        local = {}
        for name, arr in (("shared", shared), ("union", union),
                          ("inter", inter)):
            shards = sorted(arr.addressable_shards,
                            key=lambda p: p.index[1].start or 0)
            local[name] = np.concatenate(
                [np.asarray(p.data) for p in shards], axis=1
            )
            local[name + "_row0"] = np.int32(
                shards[0].index[1].start or 0)
        tmp = _state_paths(state_dir, c, process_id) + ".tmp.npz"
        np.savez(tmp, **local)
        os.replace(tmp, _state_paths(state_dir, c, process_id))
        print(f"[proc {process_id}] committed chunk {c}", flush=True)
        if die_after == c and process_id == 1:
            print(f"[proc 1] FAULT INJECTION: dying after chunk {c}",
                  flush=True)
            os._exit(17)

    # verify every local chunk block against an independent numpy reference
    def ref_counts(i, j):
        a = table[i][table[i] != np.uint64(0xFFFFFFFFFFFFFFFF)]
        b = table[j][table[j] != np.uint64(0xFFFFFFFFFFFFFFFF)]
        inter_v = np.intersect1d(a, b, assume_unique=True)
        uni = np.union1d(a, b)
        x = uni[:S]
        return (int(np.isin(x, inter_v, assume_unique=True).sum()),
                min(len(uni), S), len(inter_v))

    checked = 0
    for c in range(N_CHUNKS):
        data = np.load(_state_paths(state_dir, c, process_id))
        row0 = int(data["shared_row0"])
        for st in range(CHUNK_STEPS):
            t = c * CHUNK_STEPS + st
            for d_local in range(DEV_PER_PROC):
                d = row0 // NL + d_local
                origin = (d - t) % D
                for ri in range(NL):
                    for ci in range(NL):
                        gi, gj = d * NL + ri, origin * NL + ci
                        want = ref_counts(gi, gj)
                        got = (
                            int(data["shared"][st, d_local * NL + ri, ci]),
                            int(data["union"][st, d_local * NL + ri, ci]),
                            int(data["inter"][st, d_local * NL + ri, ci]),
                        )
                        assert got == want, (c, st, d, ri, ci, got, want)
                        checked += 1
    print(f"[proc {process_id}] verified {checked} pair counts OK",
          flush=True)
    return 0


def _spawn(state_dir: str, die_after: int):
    procs = []
    for i in range(N_PROC):
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--process-id",
             str(i), "--state-dir", state_dir, "--die-after",
             str(die_after)],
            env=env,
        ))
    return procs


def main() -> int:
    if "--process-id" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--process-id") + 1])
        sd = sys.argv[sys.argv.index("--state-dir") + 1]
        da = int(sys.argv[sys.argv.index("--die-after") + 1])
        return worker(pid, sd, da)

    import numpy as np

    base = tempfile.mkdtemp(prefix="miekki_fault_")
    golden_dir = os.path.join(base, "golden")
    fault_dir = os.path.join(base, "fault")
    os.makedirs(golden_dir)
    os.makedirs(fault_dir)

    print("=== phase 1: golden uninterrupted run ===", flush=True)
    procs = _spawn(golden_dir, die_after=-1)
    rc = max(p.wait() for p in procs)
    assert rc == 0, f"golden run failed rc={rc}"

    print("=== phase 2: fault run (proc 1 dies after chunk 1) ===",
          flush=True)
    procs = _spawn(fault_dir, die_after=1)
    rc1 = procs[1].wait()
    assert rc1 == 17, f"expected injected death rc=17, got {rc1}"
    # external failure detector: give proc 0 a moment, then kill it by PID
    time.sleep(3.0)
    if procs[0].poll() is None:
        procs[0].send_signal(signal.SIGKILL)
    procs[0].wait()
    done = sorted(f for f in os.listdir(fault_dir) if f.endswith(".npz"))
    print(f"    state after crash: {done}", flush=True)
    assert "chunk1_proc1.npz" in done and "chunk3_proc1.npz" not in done

    print("=== phase 3: restart + resume ===", flush=True)
    procs = _spawn(fault_dir, die_after=-1)
    rc = max(p.wait() for p in procs)
    assert rc == 0, f"resumed run failed rc={rc}"

    print("=== phase 4: bitwise compare golden vs resumed ===", flush=True)
    for c in range(N_CHUNKS):
        for pid in range(N_PROC):
            g = np.load(_state_paths(golden_dir, c, pid))
            f = np.load(_state_paths(fault_dir, c, pid))
            for key in g.files:
                assert np.array_equal(g[key], f[key]), (c, pid, key)
    print("FAULT INJECTION + RESUME: bitwise identical — PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
