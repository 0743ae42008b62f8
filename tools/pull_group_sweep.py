"""Sweep the round-5 bulk-path pull levers on silicon (NEXT_ROUND r5 #3):
MIEKKI_PULL_GROUP in {1,4,8} x MIEKKI_PRESORT in {0,1}, all through
engine.dist_counts_matrix on ONE family-structured device-resident index
(the bench.py workload shape), so the only variable is the lever.

The r5 builder shipped PULL_GROUP default=4 on reasoning alone — the axon
tunnel died before the measurement rerun.  This tool decides the default
on measured medians (3 trials per cell; DESIGN.md discipline: accept a
win only if it reproduces).

Usage: python tools/pull_group_sweep.py [--genomes 4096] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=4096)
    ap.add_argument("--s", type=int, default=10_000)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--groups", default="1,4,8")
    ap.add_argument("--presort", default="0,1")
    ap.add_argument("--out", default="artifacts/pull_group_sweep.json")
    args = ap.parse_args()

    from miekki_tpu.utils import compile_cache

    compile_cache.enable()
    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B
    from miekki_tpu import engine

    n = args.genomes
    idx = B._family_index(n, args.s, seed=1)
    pairs = n * (n + 1) // 2
    report = {"genomes": n, "s": args.s, "tile": args.tile,
              "backend": jax.default_backend(), "pairs": pairs,
              "trials": args.trials, "cells": []}

    # one warmup/compile pass before any timed cell (env defaults)
    engine.dist_counts_matrix(idx, tile=args.tile)

    base_check = None
    for presort in [p.strip() for p in args.presort.split(",")]:
        for group in [g.strip() for g in args.groups.split(",")]:
            os.environ["MIEKKI_PULL_GROUP"] = group
            os.environ["MIEKKI_PRESORT"] = presort
            times = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                counts = engine.dist_counts_matrix(idx, tile=args.tile)
                times.append(time.perf_counter() - t0)
            check = int(np.asarray(counts["shared"], dtype=np.int64).sum())
            if base_check is None:
                base_check = check
            assert check == base_check, (group, presort, check, base_check)
            times.sort()
            med = times[len(times) // 2]
            cell = {"pull_group": int(group), "presort": int(presort),
                    "wall_s": [round(t, 2) for t in times],
                    "median_s": round(med, 2),
                    "pairs_per_s": round(pairs / med, 1)}
            report["cells"].append(cell)
            print(json.dumps(cell), flush=True)
    os.environ.pop("MIEKKI_PULL_GROUP", None)
    os.environ.pop("MIEKKI_PRESORT", None)
    best = max(report["cells"], key=lambda c: c["pairs_per_s"])
    report["best"] = {k: best[k] for k in ("pull_group", "presort",
                                           "pairs_per_s")}
    report["checksum"] = base_check
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["best"]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
