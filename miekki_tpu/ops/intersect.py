"""Device sketch intersection (components C7-C8, SURVEY.md §2; §7 items 3-4).

TPU-first design: no two-pointer loops.  For a pair of sorted, distinct,
INF-padded sketches A, B (each [(s,), (s,)] uint32 pairs):

  merged   = sort_u64(concat(A, B))                       # [2s]
  dup[i]   = merged[i] == merged[i-1]  (and not INF)      # second of a pair
  distinct = valid & ~dup
  rank     = inclusive cumsum(distinct)                   # 1-based distinct rank
  X        = the s smallest distinct union values (rank <= s)

  shared_in_x = Σ dup & (rank <= s)     → Mash Jaccard numerator |X ∩ A ∩ B|
  union_size  = min(s, Σ distinct)      → |X|
  inter_full  = Σ dup                   → |A ∩ B| (containment numerator)

All outputs are exact integers; Jaccard/Mash-distance/ANI floats are computed
on the host with the same float64 formulas as the oracle
(miekki_tpu.oracle.compare), so distance tables are bitwise-reproducible.

Membership testing for read screening uses a branch-free binary search
(lower_bound) on (hi, lo) pairs — O(log m) gathers per needle, vectorized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import u64


def pair_counts_merge(a: u64.Pair, b: u64.Pair, s: int):
    """Sort-merge reference implementation of the pair counts (kept as the
    cross-check oracle for pair_counts; O(2s·log 2s) compare-exchanges)."""
    hi = jnp.concatenate([a[0], b[0]])
    lo = jnp.concatenate([a[1], b[1]])
    hi, lo = u64.sort((hi, lo))
    valid = ~((hi == u64.INF_HI) & (lo == u64.INF_LO))
    dup = jnp.concatenate(
        [jnp.zeros(1, jnp.bool_), (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1])]
    )
    dup = dup & valid
    distinct = valid & ~dup
    rank = jnp.cumsum(distinct.astype(jnp.int32))
    in_x = rank <= s
    return {
        "shared_in_x": jnp.sum((dup & in_x).astype(jnp.int32)),
        "union_size": jnp.minimum(jnp.sum(distinct.astype(jnp.int32)), s),
        "inter_full": jnp.sum(dup.astype(jnp.int32)),
        "n_a": jnp.sum((~u64.is_inf(a)).astype(jnp.int32)),
        "n_b": jnp.sum((~u64.is_inf(b)).astype(jnp.int32)),
    }


def pair_counts(a: u64.Pair, b: u64.Pair, s: int):
    """Exact counts for one sketch pair via vectorized binary search — no
    per-pair sort (SURVEY.md §7 item 4 "merge-path / searchsorted").

    For sorted DISTINCT INF-padded sketches: a_i's rank among the distinct
    union values is  i + |{b < a_i}| − |{shared < a_i}|  (shared elements
    would otherwise be counted by both terms); a_i ∈ X = bottom-s(A ∪ B)
    iff rank < s.  Returns dict of int32 scalars: shared_in_x, union_size,
    inter_full, n_a, n_b.  Bit-identical to pair_counts_merge.
    """
    m = b[0].shape[0]
    valid_a = ~u64.is_inf(a)
    pos = searchsorted_u64(b, a)  # |{b < a_i}| (INF padding sorts last)
    probe = jnp.clip(pos, 0, m - 1)
    match = (
        (pos < m)
        & u64.equal((b[0][probe], b[1][probe]), a)
        & valid_a
    )
    match_i = match.astype(jnp.int32)
    shared_less = jnp.cumsum(match_i) - match_i  # exclusive
    i = jnp.arange(a[0].shape[0], dtype=jnp.int32)
    rank = i + pos.astype(jnp.int32) - shared_less
    n_a = jnp.sum(valid_a.astype(jnp.int32))
    n_b = jnp.sum((~u64.is_inf(b)).astype(jnp.int32))
    inter = jnp.sum(match_i)
    return {
        "shared_in_x": jnp.sum((match & (rank < s)).astype(jnp.int32)),
        "union_size": jnp.minimum(n_a + n_b - inter, s),
        "inter_full": inter,
        "n_a": n_a,
        "n_b": n_b,
    }


def _bitonic_merge_u64(hi: jax.Array, lo: jax.Array, s: int):
    """Bitonic MERGE of [..., 2s] arrays whose halves are each sorted
    ascending with the second half reversed (i.e. the whole row is bitonic).

    log2(2s) compare-exchange stages, each expressed as two lane-rolls plus
    a positional mask — no gathers, no lax.sort; this is the TPU-shaped
    primitive behind pair_counts_bitonic (s must be a power of two).
    """
    L = 2 * s
    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, hi.ndim - 1)
    d = s
    while d >= 1:
        up = (pos % (2 * d)) < d  # first half of each 2d block keeps the min
        ph = jnp.roll(hi, -d, axis=-1)
        pl = jnp.roll(lo, -d, axis=-1)
        mh = jnp.roll(hi, d, axis=-1)
        ml = jnp.roll(lo, d, axis=-1)
        less_up = (hi < ph) | ((hi == ph) & (lo <= pl))   # x <= partner_fwd
        less_dn = (mh < hi) | ((mh == hi) & (ml <= lo))   # partner_bwd <= x
        keep = jnp.where(up, less_up, less_dn)
        hi = jnp.where(keep, hi, jnp.where(up, ph, mh))
        lo = jnp.where(keep, lo, jnp.where(up, pl, ml))
        d //= 2
    del L
    return hi, lo


def pair_counts_bitonic(a: u64.Pair, b: u64.Pair, s: int):
    """pair_counts via an explicit bitonic merge network — bit-identical to
    pair_counts_merge but with only rolls/selects/cumsum (the TPU fast path;
    lax.sort per pair is slow and searchsorted gathers are scalarized on
    TPU).  The sketch arrays' last dim sp may exceed s (INF padding) but
    must be a power of two; counts are capped at the true s."""
    sp = a[0].shape[-1]
    if sp & (sp - 1) or b[0].shape[-1] != sp:
        raise ValueError(
            f"pair_counts_bitonic needs equal power-of-two widths, got "
            f"{a[0].shape[-1]} / {b[0].shape[-1]}"
        )
    hi = jnp.concatenate([a[0], b[0][..., ::-1]], axis=-1)
    lo = jnp.concatenate([a[1], b[1][..., ::-1]], axis=-1)
    hi, lo = _bitonic_merge_u64(hi, lo, sp)
    valid = ~((hi == u64.INF_HI) & (lo == u64.INF_LO))
    prev_eq = (hi == jnp.roll(hi, 1, axis=-1)) & (lo == jnp.roll(lo, 1, axis=-1))
    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, hi.ndim - 1)
    dup = prev_eq & (pos > 0) & valid
    distinct = valid & ~dup
    rank = jnp.cumsum(distinct.astype(jnp.int32), axis=-1)
    in_x = rank <= s
    return {
        "shared_in_x": jnp.sum((dup & in_x).astype(jnp.int32), axis=-1),
        "union_size": jnp.minimum(
            jnp.sum(distinct.astype(jnp.int32), axis=-1), s
        ),
        "inter_full": jnp.sum(dup.astype(jnp.int32), axis=-1),
        "n_a": jnp.sum((~u64.is_inf(a)).astype(jnp.int32), axis=-1),
        "n_b": jnp.sum((~u64.is_inf(b)).astype(jnp.int32), axis=-1),
    }


ROW_GROUP = 8  # rows per sequential step — bounds gather temps to
# [ROW_GROUP, Tj, s] (fully materializing the [Ti, Tj, s] search
# intermediates OOMs at Ti = Tj = 128, s = 10k).


# auto-dispatch crossover for the MXU stream-pass counter, measured on the
# real chip (2026-08-19, medians of 5, two independent runs each): at tile
# 256 mxu LOSES (369k vs pallas 445k pairs/s — fixed per-dispatch cost);
# at 512 it wins 784-818k vs 481-520k (1.6x); at 1024, 924k vs 542k (1.7x).
MXU_AUTO_MIN_TILE = 512


def _intersect_impl(tile: int = None) -> str:
    """MIEKKI_INTERSECT=auto|pallas|bitonic|searchsorted|mxu (env).  auto:
    on TPU, the MXU stream-pass one-hot-matmul counter
    (ops/mxu_intersect.py) for host-orchestrated tiles >= MXU_AUTO_MIN_TILE
    (callers pass `tile`), the Pallas VMEM bitonic-merge kernel otherwise;
    searchsorted elsewhere (fast native gathers on CPU, where XLA
    scalarizes them on TPU).  mxu is host-synchronizing (resolves ambiguous
    pairs eagerly), so auto only selects it when `tile` is given — which
    traced callers never do (they use _intersect_impl_traced)."""
    import os

    impl = os.environ.get("MIEKKI_INTERSECT", "auto").lower()
    if impl == "auto":
        if jax.default_backend() == "tpu":
            impl = ("mxu" if tile is not None and tile >= MXU_AUTO_MIN_TILE
                    else "pallas")
        else:
            impl = "searchsorted"
    return impl


def _intersect_impl_traced() -> str:
    """Like _intersect_impl, but safe to pass into jit/scan/shard_map
    regions: the host-synchronizing ``mxu`` choice (which calls bool() on
    its overflow flag and dispatches ambiguous pairs eagerly) is mapped to
    the backend's traceable default instead of crashing at trace time with
    a TracerBoolConversionError.  Used by the ring paths and any other
    caller that bakes the impl into a traced computation."""
    impl = _intersect_impl()
    if impl == "mxu":
        impl = "pallas" if jax.default_backend() == "tpu" else "searchsorted"
    return impl


def _pad_pow2(p: u64.Pair) -> u64.Pair:
    """INF-pad the sketch width to a power of two, minimum 128: the XLA
    bitonic network needs pow2 strides."""
    sp = p[0].shape[-1]
    tgt = max(128, 1 << max(0, (sp - 1).bit_length()))
    return _pad_to(p, tgt)


def _pad_lane(p: u64.Pair) -> u64.Pair:
    """INF-pad the sketch width to the next multiple of 128 — all the Pallas
    kernel needs (its merge runs at true width inside the enclosing pow2
    network), killing the 1.64× pow2-padding waste at s=10k (VERDICT r1
    item 2)."""
    sp = p[0].shape[-1]
    return _pad_to(p, max(128, -(-sp // 128) * 128))


def _pad_to(p: u64.Pair, tgt: int) -> u64.Pair:
    sp = p[0].shape[-1]
    if tgt == sp:
        return p
    pad = [(0, 0)] * (p[0].ndim - 1) + [(0, tgt - sp)]
    return (jnp.pad(p[0], pad, constant_values=u64.INF_HI),
            jnp.pad(p[1], pad, constant_values=u64.INF_LO))


def tile_counts(rows: u64.Pair, cols: u64.Pair, s: int, impl: str = None):
    """All-pairs counts for a tile: rows [(Ti, s)], cols [(Tj, s)] →
    dict of int32 [Ti, Tj] arrays.  The inner unit of the all-vs-all
    scheduler (SURVEY.md §3.2).

    `impl` overrides MIEKKI_INTERSECT; when None the env var is read HERE,
    at call time, and passed to the jitted body as a static argument — so
    the jit cache is keyed on it and changing the env between calls takes
    effect (ADVICE r1: trace-time env reads were silently pinned).  Callers
    inside a traced context (the ring) should pass `impl` explicitly.

    auto resolves WITHOUT a tile size here (→ pallas on TPU): a bare
    tile_counts call pays the mxu stream sorts per call, which measured
    slightly WORSE than pallas at tile 512 (457k vs 481-520k pairs/s);
    only stream-caching callers (engine.dist_tiles) pass their tile so
    auto can pick mxu where it actually wins.
    """
    impl = impl or _intersect_impl()
    if impl == "mxu":
        from . import mxu_intersect

        return mxu_intersect.tile_counts_mxu_exact(rows, cols, s)
    return _tile_counts(rows, cols, s, impl)


@partial(jax.jit, static_argnames=("s", "impl"))
def _tile_counts(rows: u64.Pair, cols: u64.Pair, s: int, impl: str):
    """Jitted tile_counts body; vectorized over (row-group × Tj) pairs;
    sequential (lax.map) over row groups to bound temp memory."""
    ti = rows[0].shape[0]
    g = min(ROW_GROUP, ti)

    if impl == "pallas":
        from . import pallas_intersect as _pi

        return _pi.tile_counts_pallas(_pad_lane(rows), _pad_lane(cols), s)

    if impl not in ("pallas", "bitonic", "searchsorted"):
        raise ValueError(
            f"unknown intersect impl {impl!r} for the jitted tile path "
            "(mxu is host-orchestrated: route through tile_counts)")

    if impl == "bitonic":
        rows = _pad_pow2(rows)
        cols = _pad_pow2(cols)

        def pair(r0, r1, c0, c1):
            # broadcast [g, 1, sp] x [1, Tj, sp] → batched bitonic merge
            a = (r0[:, None, :], r1[:, None, :])
            b = (jnp.broadcast_to(c0[None], (r0.shape[0],) + c0.shape),
                 jnp.broadcast_to(c1[None], (r1.shape[0],) + c1.shape))
            a = (jnp.broadcast_to(a[0], b[0].shape), jnp.broadcast_to(a[1], b[1].shape))
            return pair_counts_bitonic(a, b, s)
    else:
        pair = jax.vmap(
            jax.vmap(lambda a0, a1, b0, b1: pair_counts((a0, a1), (b0, b1), s),
                     in_axes=(None, None, 0, 0)),
            in_axes=(0, 0, None, None),
        )

    sp = rows[0].shape[-1]
    if ti % g:
        pad = ((0, -ti % g), (0, 0))
        rows = (jnp.pad(rows[0], pad, constant_values=u64.INF_HI),
                jnp.pad(rows[1], pad, constant_values=u64.INF_LO))
    r0 = rows[0].reshape(-1, g, sp)
    r1 = rows[1].reshape(-1, g, sp)
    out = jax.lax.map(lambda r: pair(r[0], r[1], cols[0], cols[1]), (r0, r1))
    out = jax.tree.map(lambda x: x.reshape(-1, cols[0].shape[0])[:ti], out)
    return out


def searchsorted_u64(hay: u64.Pair, needles: u64.Pair) -> jax.Array:
    """Branch-free lower_bound of each needle in a sorted u64 haystack.

    hay: [(m,), (m,)] sorted ascending (INF padding sorts last).
    needles: any shape.  Returns int32 insertion indices (same shape).
    """
    m = hay[0].shape[0]
    n_steps = max(1, int(np.ceil(np.log2(m + 1))))
    pow2 = 1 << n_steps  # smallest power of two >= m+1

    idx = jnp.zeros(needles[0].shape, jnp.int32)
    step = pow2 >> 1
    while step > 0:
        cand = idx + step
        ok = cand <= m
        probe = jnp.clip(cand - 1, 0, m - 1)
        h = (hay[0][probe], hay[1][probe])
        advance = ok & u64.less(h, needles)
        idx = jnp.where(advance, cand, idx)
        step >>= 1
    return idx


def member_u64(hay: u64.Pair, needles: u64.Pair) -> jax.Array:
    """True where a needle occurs in the sorted haystack (INF never matches)."""
    idx = searchsorted_u64(hay, needles)
    m = hay[0].shape[0]
    probe = jnp.clip(idx, 0, m - 1)
    h = (hay[0][probe], hay[1][probe])
    hit = (idx < m) & u64.equal(h, needles) & ~u64.is_inf(needles)
    return hit


@jax.jit
def containment_counts(db: u64.Pair, read_hashes: u64.Pair):
    """Screening inner op (SURVEY.md §3.3): per-genome |S(g) ∩ H(reads)|.

    db: [(N, s)] sorted sketches; read_hashes: [(m,)] sorted distinct hashes
    (INF-padded).  Returns (hits int32[N], sketch_sizes int32[N]).
    """
    hits = jax.vmap(lambda h0, h1: jnp.sum(
        member_u64(read_hashes, (h0, h1)).astype(jnp.int32)
    ))(db[0], db[1])
    sizes = jnp.sum(~u64.is_inf(db), axis=-1).astype(jnp.int32)
    return hits, sizes


# ------------------------------------------------------------------ compact
# Single-plane (uint32 code) paths for compact indexes (ops/compact.py):
# same count semantics on codes, half the compare work of the u64 pair
# machinery.  Sentinel: code == 0xFFFFFFFF.

_INF32 = np.uint32(0xFFFFFFFF)


def pair_counts32(a: jax.Array, b: jax.Array, s: int):
    """pair_counts on single-plane codes via searchsorted (CPU-friendly)."""
    m = b.shape[0]
    valid_a = a != _INF32
    pos = jnp.searchsorted(b, a, side="left")
    probe = jnp.clip(pos, 0, m - 1)
    match = (pos < m) & (b[probe] == a) & valid_a
    match_i = match.astype(jnp.int32)
    shared_less = jnp.cumsum(match_i) - match_i
    i = jnp.arange(a.shape[0], dtype=jnp.int32)
    rank = i + pos.astype(jnp.int32) - shared_less
    n_a = jnp.sum(valid_a.astype(jnp.int32))
    n_b = jnp.sum((b != _INF32).astype(jnp.int32))
    inter = jnp.sum(match_i)
    return {
        "shared_in_x": jnp.sum((match & (rank < s)).astype(jnp.int32)),
        "union_size": jnp.minimum(n_a + n_b - inter, s),
        "inter_full": inter,
        "n_a": n_a,
        "n_b": n_b,
    }


def pair_counts_bitonic32(a: jax.Array, b: jax.Array, s: int):
    """pair_counts_bitonic on single-plane codes (pow2 width)."""
    sp = a.shape[-1]
    if sp & (sp - 1) or b.shape[-1] != sp:
        raise ValueError(
            f"pair_counts_bitonic32 needs equal power-of-two widths, got "
            f"{a.shape[-1]} / {b.shape[-1]}")
    x = jnp.concatenate([a, b[..., ::-1]], axis=-1)
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    d = sp
    while d >= 1:
        up = (pos % (2 * d)) < d
        fwd = jnp.roll(x, -d, axis=-1)
        bwd = jnp.roll(x, d, axis=-1)
        keep = jnp.where(up, x <= fwd, bwd <= x)
        x = jnp.where(keep, x, jnp.where(up, fwd, bwd))
        d //= 2
    valid = x != _INF32
    dup = (x == jnp.roll(x, 1, axis=-1)) & (pos > 0) & valid
    distinct = valid & ~dup
    rank = jnp.cumsum(distinct.astype(jnp.int32), axis=-1)
    return {
        "shared_in_x": jnp.sum((dup & (rank <= s)).astype(jnp.int32), axis=-1),
        "union_size": jnp.minimum(
            jnp.sum(distinct.astype(jnp.int32), axis=-1), s),
        "inter_full": jnp.sum(dup.astype(jnp.int32), axis=-1),
        "n_a": jnp.sum((a != _INF32).astype(jnp.int32), axis=-1),
        "n_b": jnp.sum((b != _INF32).astype(jnp.int32), axis=-1),
    }


def _pad32(x: jax.Array, tgt: int) -> jax.Array:
    sp = x.shape[-1]
    if tgt == sp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, tgt - sp)]
    return jnp.pad(x, pad, constant_values=_INF32)


def tile_counts_compact(rows: jax.Array, cols: jax.Array, s: int,
                        impl: str = None):
    """tile_counts for COMPACT sketches: [Ti, s] / [Tj, s] uint32 code
    planes.  Same output dict; dispatches to single-plane kernels (pallas /
    bitonic / searchsorted / the r4 single-plane mxu stream pass).
    auto → pallas here (see tile_counts: bare calls can't amortize the mxu
    stream sorts; dist_tiles passes its tile to _intersect_impl itself)."""
    impl = impl or _intersect_impl()
    if impl == "mxu":
        from . import mxu_intersect

        return mxu_intersect.tile_counts_mxu_exact32(rows, cols, s)
    return _tile_counts_compact(rows, cols, s, impl)


@partial(jax.jit, static_argnames=("s", "impl"))
def _tile_counts_compact(rows: jax.Array, cols: jax.Array, s: int, impl: str):
    ti = rows.shape[0]
    g = min(ROW_GROUP, ti)

    if impl == "pallas":
        from . import pallas_intersect as _pi

        tgt = max(128, -(-rows.shape[-1] // 128) * 128)
        return _pi.tile_counts_pallas32(
            _pad32(rows, tgt), _pad32(cols, tgt), s,
            interpret=jax.default_backend() != "tpu")

    if impl not in ("bitonic", "searchsorted"):
        raise ValueError(f"unknown compact intersect impl {impl!r}")

    if impl == "bitonic":
        tgt = max(128, 1 << max(0, (rows.shape[-1] - 1).bit_length()))
        rows = _pad32(rows, tgt)
        cols = _pad32(cols, tgt)

        def pair(r):
            a = jnp.broadcast_to(r[:, None, :],
                                 (r.shape[0],) + cols.shape)
            b = jnp.broadcast_to(cols[None], (r.shape[0],) + cols.shape)
            return pair_counts_bitonic32(a, b, s)
    else:
        def pair(r):
            return jax.vmap(
                jax.vmap(lambda x, y: pair_counts32(x, y, s),
                         in_axes=(None, 0)),
                in_axes=(0, None),
            )(r, cols)

    sp = rows.shape[-1]
    if ti % g:
        rows = jnp.pad(rows, ((0, -ti % g), (0, 0)), constant_values=_INF32)
    out = jax.lax.map(lambda r: pair(r), rows.reshape(-1, g, sp))
    return jax.tree.map(lambda x: x.reshape(-1, cols.shape[0])[:ti], out)
