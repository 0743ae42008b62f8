"""Device hashing + sketching vs oracle: bitwise parity (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from miekki_tpu.io import encode
from miekki_tpu.ops import hash as ops_hash
from miekki_tpu.ops import sketch as ops_sketch
from miekki_tpu.ops import u64
from miekki_tpu.oracle import nthash, sketch as oracle_sketch


def device_hashes(codes, k):
    (hi, lo), valid = ops_hash.hash_windows(jnp.asarray(codes, jnp.int32), k)
    return u64.join(np.asarray(hi), np.asarray(lo)), np.asarray(valid)


class TestHashWindows:
    @pytest.mark.parametrize("k", [1, 5, 31, 32, 64])
    def test_bitwise_parity_clean(self, k):
        rng = np.random.default_rng(k)
        codes = rng.integers(0, 4, size=400)
        want_h, want_v = nthash.hash_kmers(codes, k)
        got_h, got_v = device_hashes(codes, k)
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_array_equal(got_h[got_v], want_h[want_v])
        # masked positions must carry the sentinel
        assert (got_h[~got_v] == nthash.UINT64_MAX).all()

    @pytest.mark.parametrize("k", [5, 31])
    def test_bitwise_parity_with_invalid(self, k):
        rng = np.random.default_rng(50 + k)
        codes = rng.integers(0, 4, size=600)
        codes[rng.integers(0, 600, size=25)] = 4
        want_h, want_v = nthash.hash_kmers(codes, k)
        got_h, got_v = device_hashes(codes, k)
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_array_equal(got_h[got_v], want_h[want_v])

    def test_batched_rows(self):
        rng = np.random.default_rng(77)
        k = 21
        rows = rng.integers(0, 4, size=(4, 200))
        (hi, lo), valid = ops_hash.hash_windows(jnp.asarray(rows, jnp.int32), k)
        for i in range(4):
            want_h, want_v = nthash.hash_kmers(rows[i], k)
            got = u64.join(np.asarray(hi[i]), np.asarray(lo[i]))
            np.testing.assert_array_equal(np.asarray(valid[i]), want_v)
            np.testing.assert_array_equal(got[np.asarray(valid[i])], want_h[want_v])

    def test_long_sequence_prefix_scan(self):
        """Exercise positions past 64 (rotation-amount wraparound)."""
        rng = np.random.default_rng(88)
        codes = rng.integers(0, 4, size=5000)
        k = 31
        want_h, _ = nthash.hash_kmers(codes, k)
        got_h, got_v = device_hashes(codes, k)
        assert got_v.all()
        np.testing.assert_array_equal(got_h, want_h)


class TestSketchDevice:
    @pytest.mark.parametrize("chunk", [64, 4096])
    def test_matches_oracle_single_record(self, chunk):
        rng = np.random.default_rng(9)
        codes = rng.integers(0, 4, size=20_000).astype(np.uint8)
        k, s = 21, 500
        got = ops_sketch.sketch_codes_device(codes, k, s, chunk=chunk)
        want = oracle_sketch.sketch_codes(codes, k, s)
        np.testing.assert_array_equal(got, want)

    def test_matches_oracle_with_invalid_bases(self):
        rng = np.random.default_rng(10)
        codes = rng.integers(0, 4, size=10_000).astype(np.uint8)
        codes[rng.integers(0, 10_000, size=200)] = 4
        k, s = 31, 300
        got = ops_sketch.sketch_codes_device(codes, k, s, chunk=777)
        want = oracle_sketch.sketch_codes(codes, k, s)
        np.testing.assert_array_equal(got, want)

    def test_multi_record_packed(self):
        rng = np.random.default_rng(11)
        recs = [rng.integers(0, 4, size=n).astype(np.uint8) for n in (3000, 50, 4000)]
        k, s = 21, 400
        packed = encode.pack_records(recs, k)
        got = ops_sketch.sketch_codes_device(packed, k, s, chunk=512)
        want = oracle_sketch.sketch_records(recs, k, s)
        np.testing.assert_array_equal(got, want)

    def test_fewer_distinct_than_s(self):
        codes = encode.encode_str("ACGT" * 100)  # tiny distinct k-mer set
        k, s = 5, 1000
        got = ops_sketch.sketch_codes_device(codes, k, s)
        want = oracle_sketch.sketch_codes(codes, k, s)
        assert len(want) < s
        np.testing.assert_array_equal(got, want)

    def test_chunk_size_invariance(self):
        rng = np.random.default_rng(12)
        codes = rng.integers(0, 4, size=7919).astype(np.uint8)
        k, s = 31, 128
        a = ops_sketch.sketch_codes_device(codes, k, s, chunk=100)
        b = ops_sketch.sketch_codes_device(codes, k, s, chunk=4096)
        np.testing.assert_array_equal(a, b)

    def test_merge_into_sketch_incremental(self):
        """Streaming merge == batch bottom-s on the union."""
        rng = np.random.default_rng(13)
        s = 64
        sk = ops_sketch.empty_sketch(s)
        seen = []
        for _ in range(5):
            h = rng.integers(0, 2**64, size=200, dtype=np.uint64)
            h[rng.integers(0, 200, 10)] = h[0]  # dups
            seen.append(h)
            hi, lo = u64.split(h)
            sk = ops_sketch.merge_into_sketch(
                sk, (jnp.asarray(hi), jnp.asarray(lo)), s
            )
        got = u64.join(np.asarray(sk[0]), np.asarray(sk[1]))
        want = oracle_sketch.pad_sketch(
            oracle_sketch.bottom_s(np.concatenate(seen), s), s
        )
        np.testing.assert_array_equal(got, want)


def test_merge_threshold_overflow_fallback(monkeypatch):
    """Force the while_loop overflow fallback (m > budget) and check it is
    still exactly bottom-s distinct."""
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.ops import sketch as S, u64

    monkeypatch.setenv("MIEKKI_MERGE", "threshold")
    rng = np.random.default_rng(0)
    s, budget = 16, 8
    vals = rng.integers(0, 2**40, size=256, dtype=np.uint64)  # many survivors
    hi, lo = u64.split(vals)
    sk = S.empty_sketch(s)
    out = S.merge_into_sketch(sk, (jnp.asarray(hi), jnp.asarray(lo)), s,
                              budget=budget)
    got = u64.join(np.asarray(out[0]), np.asarray(out[1]))
    want = np.unique(vals)[:s]
    assert np.array_equal(got, want)


def test_merge_threshold_small_path_with_duplicates(monkeypatch):
    """Repetitive input (many duplicate survivors) through the top_k
    compaction path must stay exact."""
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.ops import sketch as S, u64

    monkeypatch.setenv("MIEKKI_MERGE", "threshold")
    rng = np.random.default_rng(1)
    s, budget = 8, 32
    base = rng.integers(0, 2**40, size=8, dtype=np.uint64)
    vals = np.tile(base, 8)  # 64 values, only 8 distinct
    # seed the sketch so thr is finite and c > budget + s triggers the path
    seed_vals = np.sort(rng.integers(2**41, 2**42, size=s, dtype=np.uint64))
    shi, slo = u64.split(seed_vals)
    pad = np.full(200 - len(vals), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    vals_p = np.concatenate([vals, pad])
    hi, lo = u64.split(vals_p)
    out = S.merge_into_sketch((jnp.asarray(shi), jnp.asarray(slo)),
                              (jnp.asarray(hi), jnp.asarray(lo)), s,
                              budget=budget)
    got = u64.join(np.asarray(out[0]), np.asarray(out[1]))
    want = np.unique(np.concatenate([seed_vals, vals]))[:s]
    assert np.array_equal(got, want)


@pytest.mark.parametrize("strategy", ["sort", "threshold", "tree", "fused"])
def test_merge_strategies_equivalent(monkeypatch, strategy):
    """All merge strategies must produce the identical bottom-s sketch on a
    streaming genome (incl. the cold-start overflow steps)."""
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.ops import sketch as S, u64
    from miekki_tpu.oracle import nthash as O

    monkeypatch.setenv("MIEKKI_MERGE", strategy)
    rng = np.random.default_rng(42)
    k, s = 21, 500
    genome = rng.integers(0, 4, size=60_000, dtype=np.int64)
    got = S.sketch_codes_device(genome.astype(np.uint8), k, s, chunk=4096)
    want = np.unique(O.canonical_hashes(genome, k))[:s]
    assert np.array_equal(got, want), strategy


def test_group_merged_path_oracle_parity():
    """The group-merged tree path must be bitwise-equal to the oracle,
    including the remainder-group path and invalid-code resets."""
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.ops import sketch as S
    from miekki_tpu.ops import hash as H
    from miekki_tpu.oracle import nthash as O

    rng = np.random.default_rng(11)
    k, s = 21, 400
    genome = rng.integers(0, 4, size=90_000, dtype=np.int64)
    codes = genome.astype(np.uint8)
    codes[rng.random(codes.shape) < 0.001] = H.INVALID_CODE
    rows = S.bucketed_chunk_codes(codes, k, 2048)
    # group=1 → many narrow steps → warmup + full groups + remainder group
    hi, lo = S.sketch_chunked(jnp.asarray(rows), k, s, group=1,
                              strategy="tree")
    from miekki_tpu.ops import u64

    got = u64.join(np.asarray(hi), np.asarray(lo))
    got = got[got != np.uint64(0xFFFFFFFFFFFFFFFF)]
    want = np.unique(O.canonical_hashes(codes, k))[:s]
    assert np.array_equal(got, want)


def test_merge_tree_repetitive_genome(monkeypatch):
    """A highly repetitive genome (duplicate hashes crowd tree rows) must
    still be exact via the overflow fallback."""
    import numpy as np
    from miekki_tpu.ops import sketch as S
    from miekki_tpu.oracle import nthash as O

    monkeypatch.setenv("MIEKKI_MERGE", "tree")
    rng = np.random.default_rng(7)
    k, s = 21, 200
    motif = rng.integers(0, 4, size=150, dtype=np.int64)
    genome = np.tile(motif, 300)  # 45k bases, ~150 distinct k-mers
    got = S.sketch_codes_device(genome.astype(np.uint8), k, s, chunk=4096)
    want = np.unique(O.canonical_hashes(genome, k))[:s]
    assert np.array_equal(got, want)


@pytest.mark.parametrize("k", [5, 15, 32, 33, 63])
def test_hash_windows_k_sweep(k):
    """k spanning the u64 rotate regimes (k-1 < 32, == 32, > 32, == 63):
    device must match the oracle bitwise for every k, including invalids."""
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.oracle import nthash as O
    from miekki_tpu.ops import hash as H
    from miekki_tpu.ops import u64

    rng = np.random.default_rng(k)
    codes = rng.integers(0, 5, size=500, dtype=np.int64)
    oh, ov = O.hash_kmers(codes, k)
    want = np.where(ov, oh, np.uint64(0xFFFFFFFFFFFFFFFF))
    (dh, dl), dv = H.hash_windows(jnp.asarray(codes, jnp.int32), k)
    got = u64.join(np.asarray(dh), np.asarray(dl))
    assert np.array_equal(got, want), k
    assert np.array_equal(np.asarray(dv), ov), k


@pytest.mark.parametrize("k", [15, 33, 63])
def test_sketch_end_to_end_k_sweep(k, monkeypatch):
    import numpy as np
    from miekki_tpu.oracle import nthash as O
    from miekki_tpu.ops import sketch as S

    monkeypatch.setenv("MIEKKI_MERGE", "tree")
    rng = np.random.default_rng(k * 7)
    genome = rng.integers(0, 4, size=20_000, dtype=np.int64)
    got = S.sketch_codes_device(genome.astype(np.uint8), k, 256, chunk=4096)
    want = np.unique(O.canonical_hashes(genome, k))[:256]
    assert np.array_equal(got, want), k


class TestGroupMergedSketch:
    """The group-merged tree path (one bottom-s merge per MERGE_EVERY
    steps, r2 perf restructure) must be bitwise-equal to the plain sort
    strategy."""

    def _run(self, rows, k, s, strategy):
        import jax.numpy as jnp
        from miekki_tpu.ops import sketch as S, u64
        hi, lo = S.sketch_chunked(jnp.asarray(rows), k, s, group=2,
                                  strategy=strategy, hash_impl="xla")
        return u64.join(np.asarray(hi), np.asarray(lo))

    def test_matches_sort_strategy(self):
        from miekki_tpu.ops import sketch as S
        rng = np.random.default_rng(42)
        k, s, w = 21, 300, 128 + 20
        n = 2 * 2 * S.MERGE_EVERY * 2  # group=2 → 32 steps ≥ 2*MERGE_EVERY
        rows = rng.integers(0, 4, size=(n, w), dtype=np.int64).astype(np.uint8)
        got = self._run(rows, k, s, "tree")
        want = self._run(rows, k, s, "sort")
        assert np.array_equal(got, want)

    def test_repetitive_genome_fallback(self):
        """Adversarially repetitive input keeps firing the tree-overflow
        fallback inside the grouped scan; result must stay exact."""
        from miekki_tpu.ops import sketch as S
        rng = np.random.default_rng(7)
        k, s, w = 15, 64, 128 + 14
        n = 2 * 2 * S.MERGE_EVERY * 2
        unit = rng.integers(0, 4, size=32, dtype=np.int64)
        row = np.tile(unit, w // 32 + 1)[:w].astype(np.uint8)
        rows = np.tile(row, (n, 1))
        got = self._run(rows, k, s, "tree")
        want = self._run(rows, k, s, "sort")
        assert np.array_equal(got, want)

    def test_with_invalid_and_short_tail(self):
        from miekki_tpu.ops import sketch as S
        rng = np.random.default_rng(3)
        k, s, w = 31, 500, 256 + 30
        n = 2 * S.MERGE_EVERY + 3  # pad path: not a multiple of MERGE_EVERY
        rows = rng.integers(0, 5, size=(n, w), dtype=np.int64).astype(np.uint8)
        rows[-1, 40:] = 4  # invalid tail
        got = self._run(rows, k, s, "tree")
        want = self._run(rows, k, s, "sort")
        assert np.array_equal(got, want)


def test_group_merge_gate_and_remainder_sizes():
    """The lowered group-path gate (> WARMUP_STEPS + 1 steps) and the exact
    remainder group (tail % MERGE_EVERY blocks, no padded work) must stay
    bitwise-equal to the branch-free sort strategy at every step count
    around the boundaries — covers q=0/r>0, q>0/r=0 and q>0/r>0 shapes."""
    import jax.numpy as jnp
    from miekki_tpu.ops import sketch as S, u64

    rng = np.random.default_rng(99)
    k, s, w = 21, 200, 128 + 20
    for n_steps in (2, 3, 4, 7, 8, 10, 16, 19):
        rows = rng.integers(0, 4, size=(2 * n_steps, w), dtype=np.int64
                            ).astype(np.uint8)

        def run(strategy):
            hi, lo = S.sketch_chunked(jnp.asarray(rows), k, s, group=2,
                                      strategy=strategy, hash_impl="xla")
            return u64.join(np.asarray(hi), np.asarray(lo))

        assert np.array_equal(run("tree"), run("sort")), n_steps


def test_group_merge_dense_overflow_parity():
    """End-to-end group-path parity on input dense enough to overflow the
    tree compaction caps (→ exact group fallback) and on sparse input.
    Must stay bitwise-equal to the branch-free sort strategy."""
    import jax.numpy as jnp
    from miekki_tpu.ops import sketch as S, u64

    rng = np.random.default_rng(1234)
    k, s, w = 21, 150, 137 + 20  # odd width → pad paths too
    for dense in (False, True):
        n = 2 * (S.WARMUP_STEPS + 2 * S.MERGE_EVERY + 3)
        if dense:
            # few distinct k-mers → survivors cluster → cap overflow
            unit = rng.integers(0, 4, size=24, dtype=np.int64)
            row = np.tile(unit, w // 24 + 1)[:w].astype(np.uint8)
            rows = np.tile(row, (n, 1))
        else:
            rows = rng.integers(0, 4, size=(n, w), dtype=np.int64
                                ).astype(np.uint8)

        def run(strategy):
            hi, lo = S.sketch_chunked(jnp.asarray(rows), k, s, group=2,
                                      strategy=strategy, hash_impl="xla")
            return u64.join(np.asarray(hi), np.asarray(lo))

        assert np.array_equal(run("tree"), run("sort")), dense
