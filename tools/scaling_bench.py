"""Multi-device scaling-efficiency harness (BASELINE.json metric 3).

Runs the ppermute-ring all-vs-all at every mesh size 1..D over the visible
devices and reports throughput + scaling efficiency
(T_1 / (D * T_D) per-work normalization: efficiency_D =
pairs_per_s_D / (D * pairs_per_s_1)).

On a real pod slice this measures ICI/DCN overlap quality (target ≥ 80%,
BASELINE.json north_star); on a single chip or the faked CPU mesh it
validates the machinery and records the numbers for metrics.json.

Usage: python tools/scaling_bench.py [--genomes N] [--s S] [--out metrics.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=256)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os

    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor a CPU
    # request through the config API (same dance as __graft_entry__).
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from miekki_tpu.utils import compile_cache, metrics

    compile_cache.enable()
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.params import SketchParams
    from miekki_tpu.parallel import dist_sharded, local_mesh

    devices = jax.devices()
    rng = np.random.default_rng(0)
    params = SketchParams(k=31, s=args.s)
    table = np.sort(
        rng.integers(0, 2**63, size=(args.genomes, args.s), dtype=np.uint64),
        axis=-1,
    )
    idx = SketchIndex.from_sketches(
        list(table), [f"g{i}" for i in range(args.genomes)], params
    )

    results = []
    mesh_sizes = sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)))
    for d in mesh_sizes:
        mesh = local_mesh(devices=devices[:d])
        # warm (compile), then median of >=5 timed reps with host-forced
        # completion (VERDICT r1 weak #7: single-rep timings are not
        # defensible at ±20% platform variance)
        counts = dist_sharded(idx, mesh)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            counts = dist_sharded(idx, mesh)
            _ = counts["shared"].sum()
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        pairs = args.genomes * args.genomes
        results.append({"mesh": d, "seconds": dt, "pairs_per_s": pairs / dt,
                        "reps_ms": [round(t * 1e3, 1) for t in times]})
        print(f"mesh={d}: {dt*1e3:.1f} ms median, {pairs/dt/1e3:.1f}k pairs/s",
              flush=True)

    base = results[0]["pairs_per_s"]
    for r in results:
        r["scaling_efficiency"] = r["pairs_per_s"] / (r["mesh"] * base)
    print(json.dumps(results))
    if args.out:
        for r in results:
            metrics.emit(args.out, phase="scaling", **r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
