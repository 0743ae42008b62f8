"""Device-side bottom-s MinHash with a minimum-copies abundance filter
(the `mash sketch -m` analog; VERDICT r1 item 9 — read-set sketching for
metagenomes must be able to drop error k-mers that occur < m times).

TPU-first design: the scan carry is a COUNTED candidate buffer — the
``cap`` smallest distinct canonical hashes seen so far with exact
occurrence counts, as three fixed-shape planes (hi, lo u32; cnt i32),
sorted ascending and INF-padded.  Per chunk: threshold-prefilter
(h <= current cap-th min — note <=, an occurrence of a value already
resident must still increment its count), compact survivors with top_k
position keys, aggregate equal-value runs with a log-doubling SEGMENTED
prefix sum, and sort-merge into the buffer (all branch-free; the overflow
path is an exact `lax.while_loop` fallback, never `lax.cond`).

Exactness argument: the buffer's cap-th smallest value T is non-increasing
over time, and a value is ever dropped (prefilter or truncation) only when
it is >= the T of that moment >= the final T.  Therefore every value
strictly below the FINAL T has an exact count.  The finalize step checks
that the s-th qualifying (cnt >= m) value lies strictly below final T (or
that nothing was ever dropped); otherwise the host wrapper retries with a
doubled cap — shapes stay power-of-two bucketed, so compiles are bounded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import hash as _hash
from . import sketch as _sketch
from . import u64

CAND_BUDGET = 16384  # compacted survivors per merge (as ops.sketch)


def empty_counted(cap: int):
    hi, lo = u64.inf_like((cap,))
    return hi, lo, jnp.zeros((cap,), jnp.int32)


def _seg_run_sum(hi, lo, cnt):
    """Inclusive segmented prefix sum of cnt over equal-(hi, lo) runs of a
    value-sorted array (Hillis-Steele with the run-equality flag as the
    segment guard).  Returns per-position run-prefix totals; the run TOTAL
    sits at each run's last position."""
    n = hi.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    d = 1
    while d < n:
        same = (pos >= d) & (hi == jnp.roll(hi, d)) & (lo == jnp.roll(lo, d))
        cnt = cnt + jnp.where(same, jnp.roll(cnt, d), 0)
        d <<= 1
    return cnt


def _merge_counted(buf, vals, cnts, cap: int):
    """Merge (vals, cnts) candidate pairs into the counted buffer.

    vals: u64.Pair [L] (INF = masked, cnt must be 0 there); returns
    (new buffer, dropped_any bool — True if a finite value was truncated)."""
    hi = jnp.concatenate([buf[0], vals[0]])
    lo = jnp.concatenate([buf[1], vals[1]])
    ct = jnp.concatenate([buf[2], cnts])
    hi, lo, ct = lax.sort((hi, lo, ct), dimension=-1, num_keys=2)
    run_tot = _seg_run_sum(hi, lo, ct)
    n = hi.shape[0]
    nxt_same = jnp.concatenate(
        [(hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1]), jnp.zeros(1, jnp.bool_)]
    )
    finite = ~((hi == u64.INF_HI) & (lo == u64.INF_LO))
    last = ~nxt_same & finite
    ohi = jnp.where(last, hi, u64.INF_HI)
    olo = jnp.where(last, lo, u64.INF_LO)
    oct_ = jnp.where(last, run_tot, 0)
    ohi, olo, oct_ = lax.sort((ohi, olo, oct_), dimension=-1, num_keys=2)
    dropped = jnp.any(
        ~((ohi[cap:] == u64.INF_HI) & (olo[cap:] == u64.INF_LO))
    )
    del n
    return (ohi[:cap], olo[:cap], oct_[:cap]), dropped


def merge_chunk_counted(buf, h: u64.Pair, cap: int,
                        budget: int = CAND_BUDGET):
    """One chunk of hashes into the counted buffer.  Returns
    (buffer, dropped_any)."""
    c = h[0].size
    thr = (buf[0][cap - 1], buf[1][cap - 1])
    finite = ~u64.is_inf(h)
    keep = finite & ~u64.less(thr, h)  # h <= thr (== must increment)
    pref_dropped = jnp.any(finite & ~keep)
    if c <= budget:
        vals = u64.where(keep, h, u64.inf_like(keep.shape))
        cnts = jnp.where(keep, 1, 0).astype(jnp.int32)
        out, trunc_dropped = _merge_counted(buf, vals, cnts, cap)
        return out, pref_dropped | trunc_dropped
    m_cnt = jnp.sum(keep.astype(jnp.int32))
    pos = lax.broadcasted_iota(jnp.int32, (c,), 0)
    key = jnp.where(keep, pos, -1)
    _, idx = lax.top_k(key, budget)
    ck = keep[idx]
    vals = u64.where(ck, (h[0][idx], h[1][idx]), u64.inf_like(ck.shape))
    cnts = jnp.where(ck, 1, 0).astype(jnp.int32)
    small, trunc_dropped = _merge_counted(buf, vals, cnts, cap)

    def fb_body(state):
        # exact path: aggregate the WHOLE chunk (budget exceeded — cold
        # buffer or highly repetitive reads)
        vals_f = u64.where(keep, h, u64.inf_like(keep.shape))
        cnts_f = jnp.where(keep, 1, 0).astype(jnp.int32)
        out, td = _merge_counted(buf, vals_f, cnts_f, cap)
        return jnp.bool_(False), out, pref_dropped | td

    flag, out, dropped = lax.while_loop(
        lambda st: st[0], fb_body,
        (m_cnt > budget, small, pref_dropped | trunc_dropped),
    )
    return out, dropped


@partial(jax.jit, static_argnames=("k", "cap", "group", "hash_impl"))
def _sketch_chunked_counted(chunks: jax.Array, k: int, cap: int, group: int,
                            hash_impl: str):
    n, w = chunks.shape
    g = group or max(1, min(n, _sketch.STEP_TARGET // max(1, w - k + 1)))
    if n % g:
        chunks = jnp.pad(chunks, ((0, -n % g), (0, 0)),
                         constant_values=_hash.INVALID_CODE)
    blocks = chunks.reshape(-1, g, w)

    def body(carry, block):
        buf, dropped = carry
        h = _sketch._hash_rows(block, k, impl=hash_impl)
        flat = (h[0].reshape(-1), h[1].reshape(-1))
        buf, d = merge_chunk_counted(buf, flat, cap)
        return (buf, dropped | d), None

    (buf, dropped), _ = lax.scan(
        body, (empty_counted(cap), jnp.bool_(False)), blocks
    )
    return buf, dropped


def sketch_codes_device_counted(
    codes: np.ndarray, k: int, s: int, min_copies: int,
    chunk: int = 1 << 13, cap: int = 0, max_cap: int = 1 << 22,
) -> np.ndarray:
    """End-to-end single-read-set counted sketch on device → sorted
    uint64[<=s] containing only hashes with >= min_copies occurrences.

    Exact: retries with a doubled candidate buffer until the exactness
    certificate holds (see module docstring); raises if max_cap is
    insufficient (pathologically error-dominated input)."""
    if min_copies <= 1:
        return _sketch.sketch_codes_device(codes, k, s, chunk=chunk)
    rows = _sketch.bucketed_chunk_codes(codes, k, chunk)
    cap = cap or _sketch._next_pow2(4 * s)
    while True:
        (hi, lo, cnt), dropped = _sketch_chunked_counted(
            jnp.asarray(rows), k, cap, 0, _sketch._env_hash_impl()
        )
        vals = u64.join(np.asarray(hi), np.asarray(lo))
        cnt = np.asarray(cnt)
        finite = vals != np.uint64(0xFFFFFFFFFFFFFFFF)
        qual = vals[finite & (cnt >= min_copies)][:s]
        if not bool(dropped):
            return qual
        # Something was dropped: counts are exact only strictly below the
        # final cap-th min.  Accept iff the sketch is full and entirely
        # below it; otherwise dropped values could still qualify → retry.
        t_final = vals[-1]  # buffer full here (dropped ⇒ saturated)
        if len(qual) == s and qual[-1] < t_final:
            return qual
        if cap >= max_cap:
            raise ValueError(
                f"min-copies sketch needs cap > {max_cap}; input too "
                f"error-dominated for device counting at s={s}, m={min_copies}"
            )
        cap *= 2
