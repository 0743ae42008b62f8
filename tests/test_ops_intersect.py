"""Device intersection vs oracle: exact-count parity (SURVEY.md §4 row 3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from miekki_tpu.ops import intersect, u64
from miekki_tpu.oracle import compare as oracle_compare
from miekki_tpu.oracle import nthash, sketch as oracle_sketch


def as_pair(x_u64, s):
    hi, lo = u64.split(oracle_sketch.pad_sketch(x_u64, s))
    return jnp.asarray(hi), jnp.asarray(lo)


def random_sketch(rng, n_values, value_range, s):
    vals = np.unique(rng.integers(0, value_range, size=n_values, dtype=np.uint64))
    return vals[:s]


class TestPairCounts:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        s = 32
        a = random_sketch(rng, 60, 200, s)  # small range → real overlaps
        b = random_sketch(rng, 60, 200, s)
        got = {k: int(v) for k, v in intersect.pair_counts(as_pair(a, s), as_pair(b, s), s).items()}
        shared, union, _ = oracle_compare.mash_jaccard(a, b, s)
        assert got["shared_in_x"] == shared
        assert got["union_size"] == union
        assert got["inter_full"] == oracle_compare.intersection_size(a, b)
        assert got["n_a"] == len(a) and got["n_b"] == len(b)

    def test_identical_sketches(self):
        s = 16
        a = np.arange(10, dtype=np.uint64) * 7
        got = intersect.pair_counts(as_pair(a, s), as_pair(a, s), s)
        assert int(got["shared_in_x"]) == 10
        assert int(got["union_size"]) == 10

    def test_disjoint(self):
        s = 8
        a = np.array([1, 2, 3], dtype=np.uint64)
        b = np.array([10, 20], dtype=np.uint64)
        got = intersect.pair_counts(as_pair(a, s), as_pair(b, s), s)
        assert int(got["shared_in_x"]) == 0
        assert int(got["union_size"]) == 5
        assert int(got["inter_full"]) == 0

    def test_empty_sketches(self):
        s = 8
        e = np.zeros(0, dtype=np.uint64)
        got = intersect.pair_counts(as_pair(e, s), as_pair(e, s), s)
        assert int(got["union_size"]) == 0
        assert int(got["shared_in_x"]) == 0


class TestTileCounts:
    def test_matches_pairwise_oracle(self):
        rng = np.random.default_rng(42)
        s = 24
        sketches = [random_sketch(rng, 50, 150, s) for _ in range(6)]
        rows_np = np.stack([oracle_sketch.pad_sketch(x, s) for x in sketches[:3]])
        cols_np = np.stack([oracle_sketch.pad_sketch(x, s) for x in sketches[3:]])
        rows = tuple(map(jnp.asarray, u64.split(rows_np)))
        cols = tuple(map(jnp.asarray, u64.split(cols_np)))
        got = intersect.tile_counts(rows, cols, s)
        for i in range(3):
            for j in range(3):
                shared, union, _ = oracle_compare.mash_jaccard(
                    sketches[i], sketches[3 + j], s
                )
                assert int(got["shared_in_x"][i, j]) == shared
                assert int(got["union_size"][i, j]) == union


class TestSearchSorted:
    def test_member_matches_isin(self):
        rng = np.random.default_rng(7)
        hay_np = np.unique(rng.integers(0, 500, size=300, dtype=np.uint64))
        m = 512
        hay_pad = np.full(m, nthash.UINT64_MAX, dtype=np.uint64)
        hay_pad[: len(hay_np)] = hay_np
        hay = tuple(map(jnp.asarray, u64.split(hay_pad)))
        needles_np = rng.integers(0, 500, size=200, dtype=np.uint64)
        needles = tuple(map(jnp.asarray, u64.split(needles_np)))
        got = np.asarray(intersect.member_u64(hay, needles))
        want = np.isin(needles_np, hay_np)
        np.testing.assert_array_equal(got, want)

    def test_inf_needles_never_match(self):
        hay_pad = np.full(8, nthash.UINT64_MAX, dtype=np.uint64)
        hay_pad[0] = 5
        hay = tuple(map(jnp.asarray, u64.split(hay_pad)))
        needles = u64.inf_like((4,))
        assert not np.asarray(intersect.member_u64(hay, needles)).any()

    def test_searchsorted_matches_numpy(self):
        rng = np.random.default_rng(8)
        hay_np = np.sort(rng.integers(0, 2**64, size=100, dtype=np.uint64))
        hay = tuple(map(jnp.asarray, u64.split(hay_np)))
        needles_np = np.concatenate([
            rng.integers(0, 2**64, size=50, dtype=np.uint64),
            hay_np[::10],  # exact hits
            np.array([0, 2**64 - 1], dtype=np.uint64),
        ])
        needles = tuple(map(jnp.asarray, u64.split(needles_np)))
        got = np.asarray(intersect.searchsorted_u64(hay, needles))
        want = np.searchsorted(hay_np, needles_np, side="left")
        np.testing.assert_array_equal(got, want)


class TestContainmentCounts:
    def test_matches_oracle(self):
        rng = np.random.default_rng(9)
        s = 32
        db_list = [random_sketch(rng, 40, 300, s) for _ in range(5)]
        db_np = np.stack([oracle_sketch.pad_sketch(x, s) for x in db_list])
        db = tuple(map(jnp.asarray, u64.split(db_np)))
        reads_np = np.unique(rng.integers(0, 300, size=100, dtype=np.uint64))
        m = 128
        reads_pad = np.full(m, nthash.UINT64_MAX, dtype=np.uint64)
        reads_pad[: len(reads_np)] = reads_np
        reads = tuple(map(jnp.asarray, u64.split(reads_pad)))
        hits, sizes = intersect.containment_counts(db, reads)
        for g in range(5):
            want_c = oracle_compare.containment(db_list[g], reads_np)
            assert int(sizes[g]) == len(db_list[g])
            got_c = int(hits[g]) / int(sizes[g])
            assert got_c == want_c


def test_pair_counts_matches_merge_reference():
    """The searchsorted pair_counts must be bit-identical to the sort-merge
    reference on random overlapping sketches, including partial fills."""
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.ops import intersect as I
    from miekki_tpu.ops import u64

    rng = np.random.default_rng(99)
    s = 64
    for trial in range(20):
        pool = np.unique(rng.integers(0, 2**63, size=200, dtype=np.uint64))
        na, nb = rng.integers(1, s + 1, size=2)
        a = np.sort(rng.choice(pool, size=na, replace=False))
        b = np.sort(rng.choice(pool, size=nb, replace=False))
        pad = np.uint64(0xFFFFFFFFFFFFFFFF)
        a = np.concatenate([a, np.full(s - na, pad, np.uint64)])
        b = np.concatenate([b, np.full(s - nb, pad, np.uint64)])
        ap = tuple(jnp.asarray(x) for x in u64.split(a))
        bp = tuple(jnp.asarray(x) for x in u64.split(b))
        got = I.pair_counts(ap, bp, s)
        want = I.pair_counts_merge(ap, bp, s)
        for key in want:
            assert int(got[key]) == int(want[key]), (trial, key, got, want)


def test_pair_counts_bitonic_matches_merge():
    """The roll/select bitonic merge path must be bit-identical to the
    sort-merge reference, including non-power-of-two fills and padding."""
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.ops import intersect as I
    from miekki_tpu.ops import u64

    rng = np.random.default_rng(123)
    s = 48  # deliberately not a power of two; tile path pads to 64
    pad = np.uint64(0xFFFFFFFFFFFFFFFF)
    for trial in range(15):
        pool = np.unique(rng.integers(0, 2**63, size=160, dtype=np.uint64))
        na, nb = rng.integers(1, s + 1, size=2)
        a = np.sort(rng.choice(pool, size=na, replace=False))
        b = np.sort(rng.choice(pool, size=nb, replace=False))
        a = np.concatenate([a, np.full(s - na, pad, np.uint64)])
        b = np.concatenate([b, np.full(s - nb, pad, np.uint64)])
        ap = tuple(jnp.asarray(x) for x in u64.split(a))
        bp = tuple(jnp.asarray(x) for x in u64.split(b))
        ap2 = I._pad_pow2(ap)
        bp2 = I._pad_pow2(bp)
        got = I.pair_counts_bitonic(ap2, bp2, s)
        want = I.pair_counts_merge(ap, bp, s)
        for key in want:
            assert int(got[key]) == int(want[key]), (trial, key)


def test_tile_counts_bitonic_impl_matches(monkeypatch):
    import numpy as np
    import jax.numpy as jnp
    from miekki_tpu.ops import intersect as I
    from miekki_tpu.ops import u64

    rng = np.random.default_rng(7)
    s = 40
    tab = np.sort(rng.integers(0, 2**50, size=(20, s), dtype=np.uint64), axis=-1)
    hi = jnp.asarray((tab >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((tab & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    rows, cols = (hi[:12], lo[:12]), (hi[12:], lo[12:])
    outs = {}
    for impl in ("searchsorted", "bitonic"):
        monkeypatch.setenv("MIEKKI_INTERSECT", impl)
        outs[impl] = {k: np.asarray(v)
                      for k, v in I.tile_counts(rows, cols, s).items()}
    for key in outs["bitonic"]:
        assert np.array_equal(outs["bitonic"][key], outs["searchsorted"][key]), key
