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


def bench_pairs(s: int = 10_000, tile: int = 512) -> float:
    """Sketch-pair comparisons/s through the tiled intersection path at the
    production tile size (engine.DEFAULT_TILE), steady-state: when auto
    resolves to the MXU stream-pass counter, the per-block sorted streams
    are prebuilt exactly as engine.dist_tiles caches them (each block is
    sorted once and reused across every tile it appears in — at nb blocks
    the sort amortizes over nb tiles), so the timed region is the per-tile
    cost that dominates an all-vs-all.  Per-dispatch fixed cost (~200 ms on
    this tunnel) dominates small tiles — 128 measured 69k, 256 230k,
    512 375k pairs/s on the pallas kernel.  Sketches are generated + sorted
    on device (see bench_sketch note)."""
    import jax
    import jax.numpy as jnp
    from miekki_tpu.ops import intersect as _intersect

    @jax.jit
    def gen(key):
        # FAMILY-structured sketches, not uniform random: each member keeps
        # ~8% of a conserved root (the k=31 share rate of an 8%-mutated
        # family, the BASELINE config-3/5 workload), so tile value-streams
        # contain the long runs (~0.08 * 2 * tile slots) that real related
        # genomes produce — uniform data has no runs and overstated the
        # banded kernel by ~2x vs the measured 10k-genome run.
        kr, kp, km = jax.random.split(key, 3)
        root_hi = jax.random.bits(kr, (1, s), jnp.uint32) >> 1
        root_lo = jax.random.bits(jax.random.fold_in(kr, 1), (1, s),
                                  jnp.uint32)
        keep = jax.random.uniform(km, (2 * tile, s)) < 0.08
        priv_hi = jax.random.bits(kp, (2 * tile, s), jnp.uint32) >> 1
        priv_lo = jax.random.bits(jax.random.fold_in(kp, 1), (2 * tile, s),
                                  jnp.uint32)
        hi = jnp.where(keep, root_hi, priv_hi)
        lo = jnp.where(keep, root_lo, priv_lo)
        return jax.lax.sort((hi, lo), dimension=-1, num_keys=2)

    hi, lo = gen(jax.random.PRNGKey(1))
    _sync((hi, lo))
    rows = (hi[:tile], lo[:tile])
    cols = (hi[tile:], lo[tile:])
    impl = _intersect._intersect_impl(tile)
    if impl == "mxu":
        # Mirror the PRODUCTION loop (r4 dist_counts_matrix): pipelined
        # dispatches with deferred ambiguity resolution — per-tile
        # finishes are one packed pull each, the lb != ub pairs of ALL
        # tiles resolve at the end in one threaded native pass.  The r3
        # synchronous per-tile form (dispatch → pull → resolve, serial)
        # measured 408-415k pairs/s where the production loop sustains
        # ~800k-1M on the same tiles.
        from collections import deque

        from miekki_tpu.ops import mxu_intersect as _mxu

        rs = _mxu.sketch_stream(rows, False)
        cs = _mxu.sketch_stream(cols, True)
        rs2 = _mxu.sketch_stream(cols, False)  # swapped-role second tile
        cs2 = _mxu.stream_with_col_tag(rs)
        _sync((rs, cs, rs2, cs2))
        rows_np = (np.asarray(rows[0]), np.asarray(rows[1]))
        cols_np = (np.asarray(cols[0]), np.asarray(cols[1]))
        jobs = [(rows, cols, rs, cs), (cols, rows, rs2, cs2)]
        n_tiles = 8

        def run_once():
            pend = deque()
            amb = []
            for t in range(n_tiles):
                r, c, a, b = jobs[t % 2]
                pend.append((t % 2, _mxu.tile_counts_mxu_start(
                    r, c, s, row_stream=a, col_stream=b)))
                while len(pend) > 6:
                    role, h = pend.popleft()
                    _, ai, aj = _mxu.tile_counts_mxu_finish_deferred(h)
                    amb.append((role, ai, aj))
            while pend:
                role, h = pend.popleft()
                _, ai, aj = _mxu.tile_counts_mxu_finish_deferred(h)
                amb.append((role, ai, aj))
            # deferred resolution (native threaded two-pointer)
            for role, ai, aj in amb:
                if ai.size:
                    a_np, b_np = ((rows_np, cols_np) if role == 0
                                  else (cols_np, rows_np))
                    _mxu.resolve_pairs_host(a_np, b_np, ai, aj, s)
            return len(amb)

        run_once()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_once()
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2] / n_tiles
    else:
        dt = _time(lambda: _intersect.tile_counts(rows, cols, s, impl))
    return tile * tile / dt


def bench_pairs_compact(s: int = 10_000, tile: int = 512) -> float:
    """Pair comparisons/s on COMPACT (single-plane uint32 code) sketches
    through tile_counts_compact's Pallas kernel — half the merge ops and
    VMEM of the u64 pair kernel (ops/compact.py, ops/pallas_intersect.py
    tile_counts_pallas32)."""
    import jax
    import jax.numpy as jnp
    from miekki_tpu.ops import intersect as _intersect

    @jax.jit
    def gen(key):
        # family-structured codes (see bench_pairs): conserved root shared
        # at the 8%-mutation rate, private values elsewhere
        kr, kp, km = jax.random.split(key, 3)
        root = jax.random.bits(kr, (1, s), jnp.uint32) >> 1
        keep = jax.random.uniform(km, (2 * tile, s)) < 0.08
        priv = jax.random.bits(kp, (2 * tile, s), jnp.uint32) >> 1
        return jax.lax.sort(jnp.where(keep, root, priv), dimension=-1)

    codes = gen(jax.random.PRNGKey(2))
    _sync(codes)
    rows, cols = codes[:tile], codes[tile:]
    impl = _intersect._intersect_impl(tile)
    if impl == "mxu":
        # r4 single-plane stream pass: one (code, payload) 1-key sort per
        # stream instead of deriving a fake lo plane and paying the full
        # 3-plane u64 machinery.
        from miekki_tpu.ops import mxu_intersect as _mxu

        rs = _mxu.sketch_stream32(rows, False)
        cs = _mxu.sketch_stream32(cols, True)
        _sync((rs, cs))
        dt = _time(lambda: _mxu.tile_counts_mxu_exact32(
            rows, cols, s, row_stream=rs, col_stream=cs))
    else:
        dt = _time(lambda r, c: _intersect.tile_counts_compact(r, c, s, impl),
                   rows, cols)
    return tile * tile / dt


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
