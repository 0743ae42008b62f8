"""Device-side bottom-s MinHash sketch construction (component C5, SURVEY.md §2).

TPU-first design (SURVEY.md §7 item 3): instead of the reference's per-hash
heap, the running sketch is merged with each chunk of candidate hashes by
branch-free array ops.  Four bitwise-equivalent strategies (MIEKKI_MERGE,
equivalence property-tested against the numpy oracle):

  * **tree** (default): threshold mask (h < current s-th min, +inf while the
    sketch is unfilled) → levels of [C/128, 128] row-local sorts keeping the
    32 smallest per row → small final sort-dedup-truncate.  No global
    sort/top_k over the chunk.  Any row with >32 finite candidates sets an
    overflow flag → exact full-sort fallback via `lax.while_loop` (genuine
    control flow — `lax.cond` can be lowered to a both-branches select).
  * **threshold**: same mask, survivors compacted via `lax.top_k` on
    position keys into a fixed budget, one (s + budget) sort; while_loop
    fallback on overflow.
  * **sort**: plain full sort-dedup-truncate per chunk (simplest; the TPU
    sort unit makes this serviceable).
  * **fused**: single-pass Pallas kernel (ops.pallas_sketch) doing hash +
    threshold + 16x reduction in VMEM; exact fallback on overflow.
    (Interpret-verified; blocked on this machine's remote Mosaic compiler —
    see docs/DESIGN.md.)

Sketch state is a fixed-shape [(s,), (s,)] uint32 pair padded with the
UINT64_MAX (+inf) sentinel, so the whole genome pipeline is a `lax.scan`
over fixed-size row groups — the "long context via carried state" pattern
of SURVEY.md §5.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import hash as _hash
from . import u64

# Survivor budget for the compacted merge path.  With chunk C = 2^20 the
# budget is exceeded only while seen < C·s/B  (≈ first chunk for s = 10k).
CAND_BUDGET = 16384


def empty_sketch(s: int) -> u64.Pair:
    return u64.inf_like((s,))


def _dedup_mask(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """True where element equals its predecessor (input sorted)."""
    dup_hi = jnp.concatenate([jnp.zeros(1, jnp.bool_), hi[1:] == hi[:-1]])
    dup_lo = jnp.concatenate([jnp.zeros(1, jnp.bool_), lo[1:] == lo[:-1]])
    return dup_hi & dup_lo


def _merge_sorted_trunc(sketch: u64.Pair, cand: u64.Pair, s: int) -> u64.Pair:
    """sort(concat) → dedup → resort → first s.  cand may be any length."""
    hi = jnp.concatenate([sketch[0], cand[0]])
    lo = jnp.concatenate([sketch[1], cand[1]])
    hi, lo = u64.sort((hi, lo))
    drop = _dedup_mask(hi, lo)
    hi = jnp.where(drop, u64.INF_HI, hi)
    lo = jnp.where(drop, u64.INF_LO, lo)
    hi, lo = u64.sort((hi, lo))
    return hi[:s], lo[:s]


TREE_WIDTH = 128  # lanes per row-local sort
TREE_CAP = 32     # candidates kept per row per level
TREE_CAP0 = 16    # keep per row on the widest (first) group-path level —
# same sort cost, halves every later level (see _sketch_group_merged)

# (Round-4 prune: the opt-in MIEKKI_MIN_LEVEL min-extraction levels were
# removed — they MEASURED SLOWER than the tree sort they replaced on the
# real chip, 0.66/0.68 vs 0.98/1.17 Gbase/s on the 134-Mbase bench shape,
# 2026-08-19, reproduced twice each way; docs/DESIGN.md keeps the record.)


def _tree_level(h: u64.Pair, cap: int = None, width: int = None):
    """One reduction level: row-sort [C/width, width], keep the `cap`
    smallest per row.  Returns ([C/width*cap] pair, overflowed bool) —
    `overflowed` is True if any row had more than `cap` finite candidates
    (counting duplicates), in which case the result may have dropped a
    needed value and the caller must fall back to the exact path."""
    if cap is None:
        cap = TREE_CAP
    if width is None:
        width = TREE_WIDTH
    c = h[0].size
    rows = -(-c // width)
    if rows * width != c:
        pad = rows * width - c
        h = (jnp.concatenate([h[0], jnp.full(pad, u64.INF_HI, jnp.uint32)]),
             jnp.concatenate([h[1], jnp.full(pad, u64.INF_LO, jnp.uint32)]))
    x0 = h[0].reshape(rows, width)
    x1 = h[1].reshape(rows, width)
    x0, x1 = jax.lax.sort((x0, x1), dimension=-1, num_keys=2)
    finite = ~((x0 == u64.INF_HI) & (x1 == u64.INF_LO))
    overflow = jnp.max(jnp.sum(finite.astype(jnp.int32), axis=-1)) > cap
    return (x0[:, :cap].reshape(-1), x1[:, :cap].reshape(-1)), overflow


def _env_merge_strategy() -> str:
    import os

    return os.environ.get("MIEKKI_MERGE", "tree").lower()


def _env_hash_impl() -> str:
    import os

    impl = os.environ.get("MIEKKI_HASH", "auto").lower()
    if impl == "auto":
        # r2 merge ablation: at production shapes the XLA hash beats the
        # Pallas hash kernel on this chip (0.83 vs 0.66 Gbase/s end-to-end)
        # — XLA's fusion of the hash chain into the threshold mask wins;
        # keep the kernel selectable for future toolchains.
        impl = "xla"
    return impl


def _env_fused_levels() -> int:
    import os

    return int(os.environ.get("MIEKKI_FUSED_LEVELS", "2"))


def merge_into_sketch(
    sketch: u64.Pair, hashes: u64.Pair, s: int, budget: int = CAND_BUDGET,
    strategy: str = None,
) -> u64.Pair:
    """Merge candidate hashes (INF = masked) into a bottom-s sketch.

    Exact bottom-s-distinct semantics under every strategy
    (property-tested vs the oracle).  `strategy` defaults to the
    MIEKKI_MERGE env var (default ``tree``) — note that when this function
    is called inside an outer jit WITHOUT an explicit strategy, the env var
    is read at trace time and pinned by the jit cache; pass it explicitly
    from un-traced code to make it switchable (ADVICE r1):

    * ``tree`` (default): threshold mask, then levels of row-local
      width-128 sorts keeping the 32 smallest per row; exact while_loop
      fallback on overflow.
    * ``threshold``: prefilter h < current s-th min, compact survivors into
      a fixed budget, sort only (s + budget); while_loop fallback on
      overflow (cold sketch).
    * ``sort`` (any other value): branch-free full sort-dedup-truncate.
    """
    c = hashes[0].size
    if strategy is None:
        strategy = _env_merge_strategy()
    if strategy not in ("threshold", "tree") or c <= budget + s:
        return _merge_sorted_trunc(sketch, hashes, s)

    if strategy == "tree":
        # Hierarchical pre-reduction: threshold-mask, then levels of
        # row-local width-128 sorts keeping the 32 smallest per row — no
        # global sort/top_k over the full chunk (those dominate the step
        # on TPU).  Any level overflow (cold sketch, highly repetitive
        # input) triggers the exact full-sort fallback via while_loop.
        thr = (sketch[0][s - 1], sketch[1][s - 1])
        keep = u64.less(hashes, thr)
        cand = u64.where(keep, hashes, u64.inf_like(keep.shape))
        overflow = jnp.bool_(False)
        while cand[0].size > 2 * budget:
            cand, of = _tree_level(cand)
            overflow = overflow | of
        small = _merge_sorted_trunc(sketch, cand, s)

        def fb_body(_state):
            return jnp.bool_(False), _merge_sorted_trunc(sketch, hashes, s)

        _, out = lax.while_loop(lambda st: st[0], fb_body, (overflow, small))
        return out

    # Threshold: current s-th smallest (INF while unfilled).  h == T is
    # already in the sketch; h == INF is masked — both excluded by `less`.
    thr = (sketch[0][s - 1], sketch[1][s - 1])
    keep = u64.less(hashes, thr)
    m = jnp.sum(keep.astype(jnp.int32))

    # Compact survivors with top_k over int32 position keys: kept positions
    # carry their index (>= 0), others -1, so when m <= budget EVERY kept
    # position is selected (order among them is irrelevant — the small
    # merge sorts).  Cheaper than nonzero (internal big sort) or cumsum
    # (slow sequential lowering on TPU).
    pos = jax.lax.broadcasted_iota(jnp.int32, (c,), 0)
    key = jnp.where(keep, pos, -1)
    _, idx = jax.lax.top_k(key, budget)
    cand = (hashes[0][idx], hashes[1][idx])  # non-kept picks are >= thr:
    # they sort behind every kept value and are truncated by the merge.
    small = _merge_sorted_trunc(sketch, cand, s)

    # Exact overflow fallback (m > budget: cold sketch or highly repetitive
    # genomes).  lax.while_loop is genuine control flow on TPU — unlike
    # lax.cond, it can never be lowered to a both-branches select.
    def fb_body(_state):
        return jnp.bool_(False), _merge_sorted_trunc(sketch, hashes, s)

    _, out = lax.while_loop(lambda st: st[0], fb_body, (m > budget, small))
    return out


# Target number of window starts hashed per scan step; rows are grouped so
# each merge amortizes over ~this many candidate hashes.
STEP_TARGET = 1 << 19


def _hash_rows(block: jax.Array, k: int, impl: str = None) -> u64.Pair:
    """Hash a [g, W] row block with the configured implementation.

    impl (default: MIEKKI_HASH env = pallas|xla|auto): auto uses the Pallas
    kernel on TPU and the XLA path elsewhere.  Both are bit-identical.
    """
    if impl is None:
        impl = _env_hash_impl()
    if impl == "pallas":
        from . import pallas_hash as _ph

        h, _ = _ph.hash_windows_pallas(
            block, k, interpret=jax.default_backend() != "tpu"
        )
    else:
        h, _ = _hash.hash_windows(block, k)
    return h


def sketch_chunked(chunks: jax.Array, k: int, s: int, group: int = 0,
                   strategy: str = None, hash_impl: str = None,
                   fused_levels: int = None) -> u64.Pair:
    """Sketch one genome given as [n_chunks, C + k - 1] code rows.

    Chunk rows must overlap by k-1 bases (row i covers window starts
    [i*C, (i+1)*C) of the packed genome); padding bases are INVALID_CODE.
    Rows are processed `group` at a time (0 = auto: ~STEP_TARGET bases per
    step) with ONE bottom-s merge per group, so narrow rows don't pay a
    merge each.  Returns the [(s,), (s,)] sketch pair (ascending,
    INF-padded).

    strategy/hash_impl/fused_levels default to the MIEKKI_MERGE /
    MIEKKI_HASH / MIEKKI_FUSED_LEVELS env vars, resolved HERE (call time,
    outside jit) and passed to the jitted body as static arguments, so the
    jit cache is keyed on them (ADVICE r1).  strategy=fused uses the
    single-pass Pallas kernel (ops.pallas_sketch: hash + threshold + 16x
    reduction in VMEM) with an exact full-merge fallback; other strategies
    hash first (hash_impl) and merge separately.
    """
    return _sketch_chunked(
        chunks, k, s, group,
        strategy if strategy is not None else _env_merge_strategy(),
        hash_impl if hash_impl is not None else _env_hash_impl(),
        fused_levels if fused_levels is not None else _env_fused_levels(),
        int(os.environ.get("MIEKKI_TREE_CAP0", "0")) or TREE_CAP0,
    )


@partial(jax.jit,
         static_argnames=("k", "s", "group", "strategy", "hash_impl",
                          "fused_levels", "cap0"))
def _sketch_chunked(chunks: jax.Array, k: int, s: int, group: int,
                    strategy: str, hash_impl: str,
                    fused_levels: int, cap0: int = TREE_CAP0) -> u64.Pair:
    n, w = chunks.shape
    g = group or max(1, min(n, STEP_TARGET // max(1, w - k + 1)))
    if n % g:
        chunks = jnp.pad(
            chunks, ((0, -n % g), (0, 0)), constant_values=_hash.INVALID_CODE
        )
    blocks = chunks.reshape(-1, g, w)

    if strategy == "fused" and (w - k + 1) % 2048 == 0:
        from . import pallas_sketch as _ps

        interp = jax.default_backend() != "tpu"
        levels = fused_levels

        def body(carry, block):
            thr = (carry[0][s - 1], carry[1][s - 1])
            cand, overflow = _ps.hash_reduce_pallas(
                block, k, thr, interpret=interp, levels=levels
            )
            flat = (cand[0].reshape(-1), cand[1].reshape(-1))
            while flat[0].size > 2 * CAND_BUDGET:
                flat, of = _tree_level(flat)
                overflow = overflow | of
            small = _merge_sorted_trunc(carry, flat, s)

            def fb_body(_state):
                h, _ = _hash.hash_windows(block, k)
                full = (h[0].reshape(-1), h[1].reshape(-1))
                return jnp.bool_(False), _merge_sorted_trunc(carry, full, s)

            _, out = jax.lax.while_loop(
                lambda st: st[0], fb_body, (overflow, small)
            )
            return out, None

        out, _ = jax.lax.scan(body, empty_sketch(s), blocks)
        return out

    # Group merging pays off as soon as >1 step follows the warmup (the
    # remainder-group machinery never hashes padded blocks, so there is no
    # minimum-size tax); a real ~4.6 Mbase genome (16 pow2-bucketed steps)
    # now does 2 warmup merges + 2 group merges instead of 16 per-step ones.
    if strategy == "tree" and blocks.shape[0] > WARMUP_STEPS + 1:
        return _sketch_group_merged(blocks, k, s, hash_impl, cap0)

    def body(carry, block):
        h = _hash_rows(block, k, impl=hash_impl)
        flat = (h[0].reshape(-1), h[1].reshape(-1))
        return merge_into_sketch(carry, flat, s, strategy=strategy), None

    out, _ = jax.lax.scan(body, empty_sketch(s), blocks)
    return out


# Steps per bottom-s merge in the group-merged tree path.  The r2 merge
# ablation (TPU, 134 Mbase, k=31, s=10k) attributed ~0.37 ms/step — 57% of
# step time — to the final sort-dedup merge vs ~0.075 ms for the tree
# compaction; amortizing the merge over a group roughly doubles sketch
# throughput (VERDICT r1 item 1, re-diagnosed: the merge, not the hash op
# mix, was the bound).  r3 silicon sweep (tools/sketch_sweep.py, medians
# of 5-7): cadence 2/4/6 all ≈1.06-1.09 Gbase/s vs 8 ≈0.97-1.02, then
# monotonically worse (16: 0.91, 32: 0.69 — the per-group candidate concat
# grows with the cadence); group 128 regresses at every cadence.  4 sits
# mid-plateau.  A ~7% tweak, not a headline lever — the remaining gap to
# the 2.83 Gbase/s bare-hash rate is the threshold+tree machinery itself
# (every cheap reformulation costed and rejected in DESIGN.md).
MERGE_EVERY = 4

# Per-step-merged warmup steps before group merging starts.  Two steps
# (~1 Mbase at the auto group size) pin the sketch threshold to the s-th
# min of ~1M hashes: the survivor rate for later blocks is then ~s/1e6 ≈
# 1%, i.e. Poisson(λ≈1.3) candidates per 128-lane tree row — overflow of
# the 32-per-row tree cap is ~1e-25 per row, so the group path's expensive
# whole-group fallback is unreachable for random genomes (adversarially
# repetitive genomes still fall back, exactly — same as at any warmup
# length, since their threshold stays loose regardless).  Warmup used to
# be MERGE_EVERY=8 steps, which meant a real bacterial genome (~4.6 Mbase
# ≈ 9 steps) paid a 0.37 ms sort-dedup merge on nearly every step and
# never benefited from group merging at all.
WARMUP_STEPS = 2


# (Round-4 prune: the MIEKKI_GROUP_BODY=scan inner-lax.scan group-body
# layout was removed — it lost to the python-unrolled body at every
# production shape; the r3s2 measurements live in docs/DESIGN.md.)


def _sketch_group_merged(blocks: jax.Array, k: int, s: int,
                         hash_impl: str, cap0: int = TREE_CAP0) -> u64.Pair:
    """Tree-strategy scan with ONE bottom-s merge per MERGE_EVERY steps.

    Each inner step hashes its block, threshold-filters against the (stale
    but conservative: the s-th min only decreases, so a stale threshold
    never drops a needed candidate) sketch threshold, and tree-compacts to
    a per-step candidate budget; the group's candidates are then compacted
    once more and merged in a single sort-dedup.  Bitwise-equal to the
    per-step path (bottom-s of a set is associative); exactness on tree
    overflow is preserved by the usual while_loop full-merge fallback,
    applied per-block."""
    n_steps, g, w = blocks.shape

    # Warmup head: the first WARMUP_STEPS steps run with a per-step merge so
    # the cold-sketch overflow fallback (threshold = +inf → every hash
    # survives) fires at most once on a single block, not on a whole group.
    def head_body(carry, block):
        h = _hash_rows(block, k, impl=hash_impl)
        flat = (h[0].reshape(-1), h[1].reshape(-1))
        return merge_into_sketch(carry, flat, s, strategy="tree"), None

    warm, _ = jax.lax.scan(head_body, empty_sketch(s),
                           blocks[:WARMUP_STEPS])
    tail = blocks[WARMUP_STEPS:]

    # cap0: first (widest) tree level keeps 16/128 instead of 32/128 — the
    # row sort's cost is cap-independent, but every downstream size halves
    # (level 2 input, step buffer, group concat, final merge) — measured
    # 1.90 -> 2.13 Gbase/s sustained on the 134-Mbase shape (medians,
    # reproduced; bitwise-equal).  Overflow stays negligible post-warmup:
    # worst-case survivor rate s/(2*STEP_TARGET) per lane → λ ≈ 0.8 per
    # 128-lane row at the first post-warmup step, P(row > 16) ~ 1e-14;
    # adversarial inputs still hit the exact while_loop fallback.
    # cap0=8 also measured valid but slower (2.02 — it skips level 2 and
    # pushes 2x the width into the group concat).  Resolved OUTSIDE jit
    # (sketch_chunked) and threaded here as a static arg so the jit cache
    # is keyed on it (ADVICE r3).

    def _step_cand(block, thr, overflow):
        """Hash one block, threshold-filter, compact to the per-step
        candidate budget."""
        h = _hash_rows(block, k, impl=hash_impl)
        flat = (h[0].reshape(-1), h[1].reshape(-1))
        keep = u64.less(flat, thr)
        cand = u64.where(keep, flat, u64.inf_like(keep.shape))
        cap = cap0  # first (widest) level may keep fewer per row — the
        # sort cost is unchanged but every later level halves
        while cand[0].size > 2 * CAND_BUDGET:
            cand, of = _tree_level(cand, cap=cap)
            overflow = overflow | of
            cap = TREE_CAP
        return cand, overflow

    def make_group_body(m: int):
        """Group body over m blocks (m = MERGE_EVERY for the full-group
        scan; the remainder group runs the same machinery at its exact
        size, so no padded all-INVALID blocks are ever hashed)."""

        def fallback(carry, group):
            # exact path: re-hash and merge every raw hash of the group
            # (fires only on adversarial input — the warmup head absorbs
            # the cold sketch).  Hashes are recomputed HERE rather than
            # kept live from the fast path: keeping m raw hash blocks
            # alive across the group would stop XLA fusing the
            # hash→threshold→tree chain per step.
            out = carry
            for i in range(m):
                h = _hash_rows(group[i], k, impl=hash_impl)
                out = _merge_sorted_trunc(
                    out, (h[0].reshape(-1), h[1].reshape(-1)), s)
            return out

        def finish(carry, group, cat, overflow):
            while cat[0].size > 2 * CAND_BUDGET:
                cat, of = _tree_level(cat)
                overflow = overflow | of
            small = _merge_sorted_trunc(carry, cat, s)

            def fb_body(_state):
                return jnp.bool_(False), fallback(carry, group)

            _, out = lax.while_loop(
                lambda st: st[0], fb_body, (overflow, small))
            return out, None

        def group_body_unroll(carry, group):
            thr = (carry[0][s - 1], carry[1][s - 1])
            cands = []
            overflow = jnp.bool_(False)
            for i in range(m):
                cand, overflow = _step_cand(group[i], thr, overflow)
                cands.append(cand)
            cat = (jnp.concatenate([c[0] for c in cands]),
                   jnp.concatenate([c[1] for c in cands]))
            return finish(carry, group, cat, overflow)

        return group_body_unroll

    q, r = divmod(tail.shape[0], MERGE_EVERY)
    out = warm
    if q:
        groups = tail[: q * MERGE_EVERY].reshape(q, MERGE_EVERY, g, w)
        out, _ = jax.lax.scan(make_group_body(MERGE_EVERY), out, groups)
    if r:
        out, _ = make_group_body(r)(out, tail[q * MERGE_EVERY :])
    return out


@jax.jit
def _pack_pair(hi: jax.Array, lo: jax.Array) -> jax.Array:
    return jnp.stack([hi, lo])


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def chunk_codes(codes: np.ndarray, k: int, chunk: int) -> np.ndarray:
    """Host-side: pack a 1-D code array into overlapping [n, chunk+k-1] rows."""
    codes = np.asarray(codes, dtype=np.uint8)
    n_chunks = max(1, -(-len(codes) // chunk))
    padded = np.full(n_chunks * chunk + k - 1, _hash.INVALID_CODE, dtype=np.uint8)
    padded[: len(codes)] = codes
    rows = np.stack(
        [padded[i * chunk : i * chunk + chunk + k - 1] for i in range(n_chunks)]
    )
    return rows


def bucketed_chunk_codes(codes: np.ndarray, k: int, chunk: int) -> np.ndarray:
    """chunk_codes with power-of-two shape bucketing.

    Genome lengths vary per file; naive chunking gives every genome a unique
    [n, C + k - 1] shape and triggers a fresh XLA compile each time (~30s+ on
    TPU).  Bucketing both the chunk width and the row count to powers of two
    bounds the number of distinct compiled shapes to O(log² L) per (k, s).
    Padding rows are all-INVALID → hash to INF → merge no-ops.
    """
    length = max(1, len(codes))
    c = min(chunk, max(4096, _next_pow2(length)))
    rows = chunk_codes(codes, k, c)
    n_pad = _next_pow2(rows.shape[0])
    if n_pad != rows.shape[0]:
        pad = np.full(
            (n_pad - rows.shape[0], rows.shape[1]), _hash.INVALID_CODE, np.uint8
        )
        rows = np.concatenate([rows, pad])
    return rows


def sketch_codes_device(
    codes: np.ndarray, k: int, s: int, chunk: int = 1 << 13
) -> np.ndarray:
    """End-to-end single-genome sketch on device → sorted uint64[<=s] (host).

    `codes` is a packed uint8 array (use io.encode.pack_records for
    multi-record genomes — separators invalidate boundary-spanning windows).
    """
    rows = bucketed_chunk_codes(codes, k, chunk)
    hi, lo = sketch_chunked(jnp.asarray(rows), k, s)
    # one packed device→host transfer (the tunnel charges ~40 ms fixed per
    # transfer; two separate plane pulls measured ~40 ms slower)
    packed = np.asarray(_pack_pair(hi, lo))
    out = u64.join(packed[0], packed[1])
    return out[out != np.uint64(0xFFFFFFFFFFFFFFFF)]
