"""Oracle sketch + comparison tests (SURVEY.md §4 unit rows 2-3)."""

import math

import numpy as np

from miekki_tpu.io import encode
from miekki_tpu.oracle import compare, nthash, sketch

from fixtures import make_genome_family, random_seq


class TestBottomS:
    def test_distinct_and_sorted(self):
        h = np.array([5, 3, 5, 1, 9, 3, 7], dtype=np.uint64)
        np.testing.assert_array_equal(sketch.bottom_s(h, 3), [1, 3, 5])

    def test_fewer_than_s(self):
        h = np.array([5, 3, 5], dtype=np.uint64)
        np.testing.assert_array_equal(sketch.bottom_s(h, 10), [3, 5])

    def test_sentinel_excluded(self):
        h = np.array([nthash.UINT64_MAX, 2, 1], dtype=np.uint64)
        np.testing.assert_array_equal(sketch.bottom_s(h, 10), [1, 2])

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 4, size=5000)
        sk = sketch.sketch_codes(codes, k=21, s=100)
        all_h = nthash.canonical_hashes(codes, 21)
        expect = np.sort(np.unique(all_h))[:100]
        np.testing.assert_array_equal(sk, expect)

    def test_record_boundaries_not_spanned(self):
        rng = np.random.default_rng(4)
        a = rng.integers(0, 4, size=100)
        b = rng.integers(0, 4, size=100)
        k, s = 11, 1000
        sk_split = sketch.sketch_records([a, b], k, s)
        sk_joined = sketch.sketch_codes(np.concatenate([a, b]), k, s)
        # joined has extra boundary-spanning k-mers
        assert len(sk_joined) >= len(sk_split)
        assert set(sk_split.tolist()) <= set(sk_joined.tolist())
        # packed-with-separator must equal the split version
        packed = encode.pack_records([a, b], k)
        np.testing.assert_array_equal(sketch.sketch_codes(packed, k, s), sk_split)


class TestCompare:
    def test_self_compare_is_identity(self):
        """Acceptance config 1 analog: sketch + self-compare → j=1, d=0."""
        rng = np.random.default_rng(5)
        codes = rng.integers(0, 4, size=50_000)
        k, s = 31, 1000
        sk = sketch.sketch_codes(codes, k, s)
        rec = compare.compare_sketches(sk, sk, k, s)
        assert rec["jaccard"] == 1.0
        assert rec["distance"] == 0.0
        assert rec["ani"] == 1.0
        assert rec["shared"] == rec["union"] == min(s, len(sk))

    def test_disjoint_sketches(self):
        a = np.array([1, 2, 3], dtype=np.uint64)
        b = np.array([4, 5, 6], dtype=np.uint64)
        rec = compare.compare_sketches(a, b, k=21, s=10)
        assert rec["jaccard"] == 0.0
        assert rec["distance"] == 1.0

    def test_mash_jaccard_bruteforce(self):
        rng = np.random.default_rng(6)
        for _ in range(20):
            a = np.unique(rng.integers(0, 50, size=30).astype(np.uint64))
            b = np.unique(rng.integers(0, 50, size=30).astype(np.uint64))
            s = 10
            shared, union, j = compare.mash_jaccard(a, b, s)
            x = sorted(set(a.tolist()) | set(b.tolist()))[:s]
            expect_shared = len([v for v in x if v in set(a.tolist()) & set(b.tolist())])
            assert union == len(x)
            assert shared == expect_shared
            assert j == (expect_shared / len(x) if x else 0.0)

    def test_mash_distance_formula(self):
        k = 21
        j = 0.5
        assert math.isclose(
            compare.mash_distance(j, k), -math.log(2 * 0.5 / 1.5) / 21
        )
        assert compare.mash_distance(0.0, k) == 1.0
        assert compare.mash_distance(1.0, k) == 0.0

    def test_related_genomes_rank_by_mutation(self):
        """More mutation ⇒ larger Mash distance; ANI tracks 1 - sub_rate."""
        rng = np.random.default_rng(8)
        root = random_seq(rng, 100_000)
        k, s = 21, 2000
        from fixtures import mutate

        dists = []
        for rate in [0.005, 0.02, 0.08]:
            mutant = mutate(rng, root, rate)
            sks = [
                sketch.sketch_codes(encode.encode(g), k, s) for g in (root, mutant)
            ]
            rec = compare.compare_sketches(sks[0], sks[1], k, s)
            dists.append(rec["distance"])
            assert abs(rec["ani"] - (1 - rate)) < 0.01
        assert dists == sorted(dists)

    def test_containment_subset(self):
        rng = np.random.default_rng(9)
        genome = random_seq(rng, 50_000)
        fragment = genome[10_000:20_000]
        k, s = 21, 500
        sk_frag = sketch.sketch_codes(encode.encode(fragment), k, s)
        target_hashes = nthash.canonical_hashes(encode.encode(genome), k)
        c = compare.containment(sk_frag, target_hashes)
        assert c == 1.0
        assert compare.ani_from_containment(c, k) == 1.0

    def test_all_vs_all_shape(self):
        rng = np.random.default_rng(10)
        genomes = make_genome_family(rng, 5, 20_000)
        k, s = 21, 300
        sks = [sketch.sketch_codes(encode.encode(g), k, s) for g in genomes]
        rows = compare.all_vs_all(sks, k, s)
        assert len(rows) == 10  # 5 choose 2
        for r in rows:
            assert 0.0 <= r["jaccard"] <= 1.0
            assert 0.0 <= r["distance"] <= 1.0


class TestChancePValue:
    def test_related_pairs_significant(self):
        from miekki_tpu.oracle.compare import chance_p_value

        # 300 shared of 1000 union slots between 5Mbase genomes at k=31:
        # chance expectation is ~0 -> p-value ~ 0
        p = chance_p_value(300, 1000, 5e6, 5e6, 31)
        assert p < 1e-100

    def test_zero_shared_is_one(self):
        from miekki_tpu.oracle.compare import chance_p_value

        assert chance_p_value(0, 1000, 5e6, 5e6, 31) == 1.0

    def test_chance_level_not_significant(self):
        from miekki_tpu.oracle.compare import chance_p_value

        # tiny k -> dense k-mer space -> large chance overlap
        # n1=n2=500 at k=5 (space 1024): m = 244, q ~ 0.32
        p = chance_p_value(300, 1000, 500, 500, 5)
        assert p > 0.9  # 300 < expected 322 -> not significant

    def test_monotone_in_shared(self):
        from miekki_tpu.oracle.compare import chance_p_value

        ps = [chance_p_value(x, 1000, 1e6, 1e6, 12) for x in (20, 40, 80)]
        assert ps[0] > ps[1] > ps[2]


class TestBounds:
    def test_probit_values(self):
        from miekki_tpu.oracle.compare import _probit

        # known quantiles of the standard normal
        assert abs(_probit(0.975) - 1.959963985) < 1e-6
        assert abs(_probit(0.5) - 0.0) < 1e-9
        assert abs(_probit(0.025) + 1.959963985) < 1e-6

    def test_jaccard_ci_contains_estimate(self):
        from miekki_tpu.oracle.compare import jaccard_ci

        lo, hi = jaccard_ci(300, 1000)
        assert lo < 0.3 < hi
        assert 0.0 <= lo and hi <= 1.0
        # tighter with more trials
        lo2, hi2 = jaccard_ci(3000, 10000)
        assert hi2 - lo2 < hi - lo

    def test_distance_ci_orientation(self):
        from miekki_tpu.oracle.compare import distance_ci, mash_distance

        d_lo, d_hi = distance_ci(300, 1000, 21)
        d = mash_distance(0.3, 21)
        assert d_lo <= d <= d_hi

    def test_degenerate_cases(self):
        from miekki_tpu.oracle.compare import jaccard_ci

        assert jaccard_ci(0, 0) == (0.0, 1.0)
        lo, hi = jaccard_ci(0, 1000)
        assert lo == 0.0 and hi < 0.01
        lo, hi = jaccard_ci(1000, 1000)
        assert hi > 0.999 and lo > 0.99
