"""Ring communication/compute overlap evidence (VERDICT r1 item 5).

BASELINE's ≥80% multi-host scaling-efficiency target rests on the claim
that XLA overlaps each ring step's `collective-permute` with that step's
(independent) tile intersection.  Round 1 asserted this from the program
structure; this harness MEASURES it by decomposition on a real mesh:

  T_ring     — the production ring all-vs-all (compute + transfer, fused)
  T_compute  — identical tile work, no collectives (each device re-uses its
               local column block D times)
  T_permute  — the D-step ppermute rotation alone, no tile work

  overlap_fraction = (T_compute + T_permute − T_ring) / min(T_compute,
  T_permute): 1.0 = the cheaper phase is fully hidden behind the other,
  0.0 = fully serialized, negative = the fused program is slower than the
  sum of its parts (scheduling regression).

All numbers are medians over ≥5 reps with host-forced completion.  On the
faked multi-device CPU mesh this validates the program structure (CPU
"collectives" are memcpys); on one real chip the ring degenerates to D=1
(no transfer); the same harness run on a real pod slice yields the ICI
evidence.  Results land in docs/RING_OVERLAP.md via --doc.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/ring_overlap_bench.py [--genomes 256] [--s 1024] [--doc]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--doc", action="store_true",
                    help="append a results table to docs/RING_OVERLAP.md")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from functools import partial

    from jax import lax
    from jax.sharding import PartitionSpec as P

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    from miekki_tpu.ops import intersect as _intersect
    from miekki_tpu.parallel import local_mesh
    from miekki_tpu.parallel.allvsall import shard_map
    from miekki_tpu.parallel.mesh import DB_AXIS

    mesh = local_mesh()
    D = mesh.devices.size
    n, s = args.genomes, args.s
    n -= n % max(1, D)
    rng = np.random.default_rng(0)
    table = np.sort(rng.integers(0, 2**63, size=(n, s), dtype=np.uint64),
                    axis=-1)
    hi = jnp.asarray((table >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((table & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    impl = _intersect._intersect_impl_traced()

    def ring_body(rows_hi, rows_lo):
        perm = [(i, (i + 1) % D) for i in range(D)]

        def step(carry, _):
            c_hi, c_lo = carry
            counts = _intersect.tile_counts((rows_hi, rows_lo),
                                            (c_hi, c_lo), s, impl=impl)
            c_hi = lax.ppermute(c_hi, DB_AXIS, perm)
            c_lo = lax.ppermute(c_lo, DB_AXIS, perm)
            return (c_hi, c_lo), counts["shared_in_x"]

        _, out = lax.scan(step, (rows_hi, rows_lo), None, length=D)
        return out

    def compute_body(rows_hi, rows_lo, all_hi, all_lo):
        # Honest baseline: identical tile work with per-step VARYING column
        # panels from a replicated table and no collectives.  (A first
        # version used cols == rows — loop-invariant, so XLA hoisted the
        # tile out of the scan and "compute-only" measured ONE step; that
        # made the ring look 8x slower than its parts and sent r2 chasing
        # a serialization pathology that did not exist.)
        def step(carry, cols):
            c_hi, c_lo = cols
            counts = _intersect.tile_counts((rows_hi, rows_lo),
                                            (c_hi, c_lo), s, impl=impl)
            return carry, counts["shared_in_x"]

        _, out = lax.scan(step, jnp.int32(0), (all_hi, all_lo))
        return out

    def permute_body(rows_hi, rows_lo):
        perm = [(i, (i + 1) % D) for i in range(D)]

        def step(carry, _):
            c_hi, c_lo = carry
            c_hi = lax.ppermute(c_hi, DB_AXIS, perm)
            c_lo = lax.ppermute(c_lo, DB_AXIS, perm)
            return (c_hi, c_lo), c_hi[0, 0]

        (c_hi, c_lo), out = lax.scan(step, (rows_hi, rows_lo), None,
                                     length=D)
        return c_hi ^ c_lo  # consume the rotated block

    nl = n // D
    panels = (hi.reshape(D, nl, s), lo.reshape(D, nl, s))
    variants = {}
    for name, body, out_spec, extra in (
        ("ring", ring_body, P(None, DB_AXIS, None), False),
        ("compute", compute_body, P(None, DB_AXIS, None), True),
        ("permute", permute_body, P(DB_AXIS, None), False),
    ):
        in_specs = (P(DB_AXIS, None), P(DB_AXIS, None))
        if extra:
            in_specs += (P(None, None, None), P(None, None, None))
        variants[name] = (jax.jit(shard_map(
            body, mesh=mesh, in_specs=in_specs,
            out_specs=out_spec, check_vma=False,
        )), extra)

    def timed(f, extra):
        a = (hi, lo) + (panels if extra else ())
        np.asarray(f(*a))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(f(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2], ts

    res = {}
    for name, (f, extra) in variants.items():
        med, ts = timed(f, extra)
        res[name] = med
        print(f"{name:8s}: {med*1e3:8.1f} ms median "
              f"{[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    hidden = res["compute"] + res["permute"] - res["ring"]
    denom = min(res["compute"], res["permute"])
    overlap = hidden / denom if denom > 0 else float("nan")
    summary = {
        "devices": D, "genomes": n, "s": s,
        "ring_ms": round(res["ring"] * 1e3, 1),
        "compute_ms": round(res["compute"] * 1e3, 1),
        "permute_ms": round(res["permute"] * 1e3, 1),
        "overlap_fraction": round(overlap, 3),
        "unhidden_overhead_pct": round(
            100 * (res["ring"] - res["compute"]) / res["compute"], 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(summary))

    if args.doc:
        import datetime
        import os as _os

        path = _os.path.join(_os.path.dirname(__file__), "..", "docs",
                             "RING_OVERLAP.md")
        fresh = not _os.path.exists(path)
        with open(path, "a") as f:
            if fresh:
                f.write(
                    "# Ring transfer/compute overlap measurements\n\n"
                    "Method: tools/ring_overlap_bench.py — decompose the "
                    "production ring into its compute-only and "
                    "permute-only halves and compare the fused time "
                    "against their sum.  overlap_fraction = (compute + "
                    "permute − ring) / min(compute, permute); 1.0 = "
                    "cheaper phase fully hidden, ≤0 = serialized.  When "
                    "permute is negligible (CPU mesh: collectives are "
                    "memcpys) the overlap fraction is degenerate — read "
                    "`overhead%` = (ring − compute)/compute instead: the "
                    "ring's total unhidden cost over its "
                    "collective-free equivalent.  Real ICI overlap "
                    "evidence requires pod hardware; this harness is the "
                    "method, runnable there unchanged.\n\n"
                    "| date | backend | devices | genomes | s | ring ms | "
                    "compute ms | permute ms | overlap | overhead% |\n"
                    "|---|---|---|---|---|---|---|---|---|---|\n")
            f.write(
                f"| {datetime.date.today()} | {summary['backend']} | {D} "
                f"| {n} | {s} | {summary['ring_ms']} "
                f"| {summary['compute_ms']} | {summary['permute_ms']} "
                f"| {summary['overlap_fraction']} "
                f"| {summary['unhidden_overhead_pct']} |\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
