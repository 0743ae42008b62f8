"""Device-side bottom-s MinHash sketch construction (component C5, SURVEY.md §2).

TPU-first design (SURVEY.md §7 item 3): instead of the reference's per-hash
heap, the running sketch is merged with each chunk of candidate hashes by a
branch-free sort → dedup → truncate:

  merged = sort_u64(concat(sketch, chunk))         # INF sentinels sink
  dup[i] = merged[i] == merged[i-1]                # distinct = first of run
  merged[dup or INF] = INF; re-sort; take first s

Sketch state is a fixed-shape [(s,), (s,)] uint32 pair padded with the
UINT64_MAX (+inf) sentinel, so the whole genome pipeline is a `lax.scan`
over fixed-size chunks — the "long context via carried state" pattern of
SURVEY.md §5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import hash as _hash
from . import u64


def empty_sketch(s: int) -> u64.Pair:
    return u64.inf_like((s,))


def _dedup_mask(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """True where element equals its predecessor (input sorted)."""
    dup_hi = jnp.concatenate([jnp.zeros(1, jnp.bool_), hi[1:] == hi[:-1]])
    dup_lo = jnp.concatenate([jnp.zeros(1, jnp.bool_), lo[1:] == lo[:-1]])
    return dup_hi & dup_lo


def merge_into_sketch(sketch: u64.Pair, hashes: u64.Pair, s: int) -> u64.Pair:
    """Merge candidate hashes (INF = masked) into a bottom-s sketch."""
    hi = jnp.concatenate([sketch[0], hashes[0]])
    lo = jnp.concatenate([sketch[1], hashes[1]])
    hi, lo = u64.sort((hi, lo))
    drop = _dedup_mask(hi, lo)
    hi = jnp.where(drop, u64.INF_HI, hi)
    lo = jnp.where(drop, u64.INF_LO, lo)
    hi, lo = u64.sort((hi, lo))
    return hi[:s], lo[:s]


@partial(jax.jit, static_argnames=("k", "s"))
def sketch_chunked(chunks: jax.Array, k: int, s: int) -> u64.Pair:
    """Sketch one genome given as [n_chunks, C + k - 1] code rows.

    Chunk rows must overlap by k-1 bases (row i covers window starts
    [i*C, (i+1)*C) of the packed genome); padding bases are INVALID_CODE.
    Returns the [(s,), (s,)] sketch pair (ascending, INF-padded).
    """

    def body(carry, chunk):
        h, _ = _hash.hash_windows(chunk, k)
        return merge_into_sketch(carry, h, s), None

    out, _ = jax.lax.scan(body, empty_sketch(s), chunks)
    return out


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


def sketch_codes_device(
    codes: np.ndarray, k: int, s: int, chunk: int = 1 << 16
) -> np.ndarray:
    """End-to-end single-genome sketch on device → sorted uint64[<=s] (host).

    `codes` is a packed uint8 array (use io.encode.pack_records for
    multi-record genomes — separators invalidate boundary-spanning windows).
    """
    chunk = min(chunk, max(1, len(codes)))  # don't pad tiny genomes to a full chunk
    rows = chunk_codes(codes, k, chunk)
    hi, lo = sketch_chunked(jnp.asarray(rows), k, s)
    out = u64.join(np.asarray(hi), np.asarray(lo))
    return out[out != np.uint64(0xFFFFFFFFFFFFFFFF)]
