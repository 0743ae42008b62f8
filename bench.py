"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: sketching throughput in Gbases/s/chip (BASELINE.json
"metric"), measured on the fused device pipeline (hash → bottom-s merge)
over synthetic genome chunks.  vs_baseline is against the roofline-derived
build anchor of 1.0 Gbase/s/chip (BASELINE.md "build roofline anchor" —
the reference publishes no numbers; see SURVEY.md §6).

Secondary metrics (pair comparisons/s on the tiled intersection kernel) are
reported in the "extra" field.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_GBASES = 1.0  # Gbase/s/chip — BASELINE.md roofline anchor


def _sync(out):
    """Force REAL completion: pull every output leaf to the host.  On the
    tunneled TPU platform block_until_ready alone has been observed to
    return before execution finishes; a device→host copy cannot lie."""
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(out)]


def _time(fn, *args, warmup: int = 2, iters: int = 7) -> float:
    """Median of per-iteration wall times, each synchronized via _sync."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _time_pipelined(fn, inputs, warmup: int = 2, iters: int = 8,
                    trials: int = 3) -> float:
    """Sustained per-call wall time with depth-1 dispatch pipelining —
    dispatch call t+1 before host-pulling call t, exactly how the
    production paths run (engine.build_index batches, engine.dist_tiles
    tiles both pipeline with MIEKKI_PIPELINE=1).  Every output is still
    host-forced via _sync (nothing can be skipped); `inputs` must hold >=2
    distinct arrays, alternated so XLA cannot hoist or reuse anything
    across iterations.  Returns the median over `trials` of total/iters."""
    for _ in range(warmup):
        _sync(fn(inputs[0]))
        _sync(fn(inputs[-1]))
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        handles = []
        for i in range(iters):
            handles.append(fn(inputs[i % len(inputs)]))
            if len(handles) > 1:
                _sync(handles.pop(0))
        while handles:
            _sync(handles.pop(0))
        rates.append((time.perf_counter() - t0) / iters)
    rates.sort()
    return rates[len(rates) // 2]


def bench_sketch(k: int = 31, s: int = 10_000, chunk: int = 1 << 13,
                 n_chunks: int = 16384) -> float:
    """Gbases/s through sketch_chunked (the sketch-phase hot path).

    Uses the engine's production layout: narrow 8K-base rows (Pallas
    VMEM-sized), grouped into ~512K-base scan steps.  Input codes are
    GENERATED ON DEVICE and the workload is large (134 Mbase/call): this
    machine's tunneled TPU re-uploads host arrays at ~0.4 GB/s and charges
    a ~40 ms fixed overhead per execution, both of which would otherwise
    swamp the kernel being measured (production hosts feed chips over
    local PCIe with ~µs dispatch)."""
    import jax
    import jax.numpy as jnp
    from miekki_tpu.ops import sketch as _sketch

    @jax.jit
    def gen(key):
        return jax.random.randint(
            key, (n_chunks, chunk + k - 1), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)

    @jax.jit
    def run(r):
        # ONE stacked output = one device→host transfer in _sync, matching
        # the production pull pattern (engine._sketch_batch): the tunnel
        # charges ~40 ms fixed per transfer, and pulling the hi/lo planes
        # separately was measured to add ~40 ms — 30% of the whole
        # iteration — of pure transfer artifact to the timing.
        return jnp.stack(_sketch.sketch_chunked(r, k, s))

    # Two distinct inputs, alternated; sustained depth-1 pipelined timing
    # (the production ingest overlaps the next dispatch with the previous
    # pull — serialized per-call timing double-charges the tunnel's fixed
    # dispatch+transfer costs against the kernel being measured).
    rows = [gen(jax.random.PRNGKey(i)) for i in range(2)]
    _sync(rows)
    dt = _time_pipelined(run, rows)
    bases = n_chunks * chunk
    return bases / dt / 1e9


def _family_index(n: int, s: int, seed: int = 1, compact: bool = False):
    """FAMILY-structured sketch index with device planes attached exactly
    as the production builder leaves them (engine._keep_device_planes).

    Not uniform random: each member keeps ~8% of a conserved root (the
    k=31 share rate of an 8%-mutated family, the BASELINE config-3/5
    workload), so tile value-streams contain the long equal runs real
    related genomes produce — uniform data has no runs and overstated the
    banded kernel by ~2x vs the measured 10k-genome run."""
    import jax
    import jax.numpy as jnp
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.params import SketchParams

    @jax.jit
    def gen(key):
        kr, kp, km = jax.random.split(key, 3)
        root_hi = jax.random.bits(kr, (1, s), jnp.uint32) >> 1
        root_lo = jax.random.bits(jax.random.fold_in(kr, 1), (1, s),
                                  jnp.uint32)
        keep = jax.random.uniform(km, (n, s)) < 0.08
        priv_hi = jax.random.bits(kp, (n, s), jnp.uint32) >> 1
        priv_lo = jax.random.bits(jax.random.fold_in(kp, 1), (n, s),
                                  jnp.uint32)
        hi = jnp.where(keep, root_hi, priv_hi)
        lo = jnp.where(keep, root_lo, priv_lo)
        return jax.lax.sort((hi, lo), dimension=-1, num_keys=2)

    dev_hi, dev_lo = gen(jax.random.PRNGKey(seed))
    idx = SketchIndex(SketchParams(k=31, s=s),
                      [f"g{i}" for i in range(n)],
                      np.asarray(dev_hi), np.asarray(dev_lo))
    if compact:
        idx = idx.to_compact()
        # single code-plane device residency (r5 dist_tiles support)
        idx.device_planes = jnp.asarray(idx.hi)
    else:
        idx.device_planes = (dev_hi, dev_lo)
    return idx


def _time_counts_matrix(idx, tile: int, trials: int = 3) -> float:
    """Median wall seconds of engine.dist_counts_matrix — THE shipped bulk
    path (pipelined dispatches, deferred ambiguity resolution, device-
    resident planes when attached), so BENCH pair rates reflect production
    throughput (VERDICT r4 #6), not a hand-rolled dispatch loop."""
    from miekki_tpu import engine

    engine.dist_counts_matrix(idx, tile=tile)  # warmup/compile
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        counts = engine.dist_counts_matrix(idx, tile=tile)
        times.append(time.perf_counter() - t0)
        del counts
    times.sort()
    return times[len(times) // 2]


def bench_pairs(s: int = 10_000, n: int = 4096, tile: int = 512) -> float:
    """Sketch-pair comparisons/s through the production bulk path
    (engine.dist_counts_matrix) on an n-genome family index with device
    planes — the same code path, pipeline depth, block cache, and deferred
    native ambiguity resolution as the committed all-vs-all artifact
    (artifacts/allvsall_10k_tpu.json), at bench-sized n.  Pair count =
    upper triangle + diagonal, matching the artifact's accounting."""
    idx = _family_index(n, s, seed=1)
    dt = _time_counts_matrix(idx, tile)
    return (n * (n + 1) // 2) / dt


def bench_pairs_compact(s: int = 10_000, n: int = 2048,
                        tile: int = 512) -> float:
    """Pair comparisons/s on COMPACT (single-plane uint32 code) sketches
    through the same production bulk path — the single-plane MXU stream
    pass with half the block bytes (ops/compact.py, ops/mxu_intersect.py
    *32 entry points)."""
    idx = _family_index(n, s, seed=2, compact=True)
    dt = _time_counts_matrix(idx, tile)
    return (n * (n + 1) // 2) / dt


def main() -> None:
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    gbases = bench_sketch()
    pairs = bench_pairs()
    pairs32 = bench_pairs_compact()
    print(json.dumps({
        "metric": "sketch_throughput",
        "value": round(gbases, 4),
        "unit": "Gbases/s/chip",
        "vs_baseline": round(gbases / BASELINE_GBASES, 4),
        "extra": {"pair_comparisons_per_s": round(pairs, 1),
                  "pair_comparisons_per_s_compact": round(pairs32, 1)},
    }))


if __name__ == "__main__":
    main()
