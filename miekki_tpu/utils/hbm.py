"""Single source of truth for device-memory budgets (VERDICT r4 #8).

Prior rounds sized three HBM consumers against independently probed limits
with separate hard-coded fractions — builder-retained device planes (25%),
the dist block cache (40%), the screen DB-value budget (10%) — each tuned
alone on the same 16 GB chip and unaware of the others, so the combined
worst case could overcommit (ADVICE r3/r4).  This module centralizes the
limit probe and the combination arithmetic; tests/test_utils.py asserts the
dist-time worst case stays bounded by construction.

Budget map (fractions of bytes_limit):

- ``PLANES_FRAC`` = 0.25 — builder-retained [N, s] sketch planes.
- ``DIST_TOTAL_FRAC`` = 0.55 — ceiling for everything the dist sweep holds
  concurrently: resident planes + block cache + in-flight pipelined tile
  passes.  The cache budget is what REMAINS under this ceiling after the
  other two, so "planes resident" shrinks the cache instead of stacking on
  top of it.  The ~45% left over covers XLA scratch, the ambiguity-resolve
  sort, and allocator slack.
- Screen: the merge join costs ~38 B/value END TO END (r4 measured: 515M
  values compiled to 19.9 GB), so its DB budget is 10% of HBM in values.
  The r5 grouped-searchsorted screen holds only the 8 B/value planes + the
  1 B/value hit bitmap resident with tiny join temporaries, so its
  residency budget is 60% of HBM at 9 B/value.

``MIEKKI_HBM_LIMIT`` (bytes) overrides the probed limit — used by tests to
exercise the arithmetic at fake sizes, and by operators on parts whose
allocator under-reports.
"""

from __future__ import annotations

import os

DEFAULT_LIMIT = 16 << 30  # this machine's v5e when memory_stats is silent

PLANES_FRAC = 0.25
DIST_TOTAL_FRAC = 0.55
SCREEN_MERGE_FRAC = 0.10
SCREEN_RESIDENT_FRAC = 0.60
SCREEN_RESIDENT_BYTES_PER_VALUE = 9  # 8 B planes + 1 B hit bitmap
CACHE_MIN_BYTES = 64 << 20  # cache floor: ~2 blocks even on tiny parts


def bytes_limit() -> int:
    """Device HBM capacity: MIEKKI_HBM_LIMIT override, else the allocator's
    bytes_limit, else DEFAULT_LIMIT."""
    env = os.environ.get("MIEKKI_HBM_LIMIT")
    if env:
        return max(1, int(env))
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        return int(stats.get("bytes_limit") or DEFAULT_LIMIT)
    except Exception:
        return DEFAULT_LIMIT


def keep_planes_ok(table_bytes: int) -> bool:
    """May the index builder retain its [N, s] planes on device?"""
    return table_bytes <= bytes_limit() * PLANES_FRAC


def dist_cache_bytes(resident_plane_bytes: int, depth: int,
                     bytes_per_block: int) -> int:
    """Block-cache byte budget for the dist tile sweep.

    What remains of the DIST_TOTAL_FRAC ceiling after the resident builder
    planes and the in-flight pipeline (``depth`` async tile passes, each
    estimated at one block's planes+streams of live temporaries).  Floored
    at CACHE_MIN_BYTES so the sweep always caches >= ~2 blocks."""
    total = int(bytes_limit() * DIST_TOTAL_FRAC)
    spend = int(resident_plane_bytes) + int(depth) * int(bytes_per_block)
    return max(CACHE_MIN_BYTES, total - spend)


def screen_merge_value_budget() -> int:
    """Max flat-DB VALUES for the one-pass merge-join screen program."""
    return int(bytes_limit() * SCREEN_MERGE_FRAC) // 8


def screen_resident_value_budget() -> int:
    """Max flat-DB VALUES resident per group in the grouped-searchsorted
    screen (planes + hit bitmap live across the whole read stream)."""
    return int(bytes_limit() * SCREEN_RESIDENT_FRAC) \
        // SCREEN_RESIDENT_BYTES_PER_VALUE
