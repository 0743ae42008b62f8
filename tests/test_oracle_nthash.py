"""Oracle hash tests: scalar-roll vs closed-form agreement, invariants.

SURVEY.md §4 unit-test rows 1-2: 2-bit encode, revcomp, canonicalization,
ntHash init+roll incl. N-reset and sequence boundaries.
"""

import numpy as np
import pytest

from miekki_tpu.io import encode
from miekki_tpu.oracle import nthash


def codes_of(s: str) -> np.ndarray:
    return encode.encode_str(s)


class TestEncode:
    def test_acgt_and_case(self):
        assert codes_of("ACGTacgt").tolist() == [0, 1, 2, 3, 0, 1, 2, 3]

    def test_invalid_bases(self):
        assert codes_of("ANC-U").tolist() == [0, 4, 1, 4, 4]


class TestRotate:
    def test_rol_ror_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 2**64, size=100, dtype=np.uint64)
        for r in [0, 1, 31, 32, 33, 63, 64, 65, 127]:
            np.testing.assert_array_equal(nthash.ror64(nthash.rol64(x, r), r), x)

    def test_rol_known(self):
        assert nthash.rol64(np.uint64(1), 1) == np.uint64(2)
        assert nthash.rol64(np.uint64(1 << 63), 1) == np.uint64(1)
        assert nthash.rol64(np.uint64(0xDEADBEEF), 0) == np.uint64(0xDEADBEEF)

    def test_rol_vector_amounts(self):
        x = np.full(64, 0x0123456789ABCDEF, dtype=np.uint64)
        r = np.arange(64)
        out = nthash.rol64(x, r)
        for i in range(64):
            assert out[i] == nthash.rol64(x[i], i)


class TestHashAgreement:
    @pytest.mark.parametrize("k", [1, 2, 5, 21, 31, 32, 33, 63, 64])
    def test_scalar_vs_vector_random(self, k):
        rng = np.random.default_rng(k)
        codes = rng.integers(0, 4, size=300)
        h1, v1 = nthash.hash_kmers_scalar(codes, k)
        h2, v2 = nthash.hash_kmers(codes, k)
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_array_equal(v1, v2)
        assert v1.all()  # all-ACGT input: every window valid

    @pytest.mark.parametrize("k", [5, 31])
    def test_scalar_vs_vector_with_invalid(self, k):
        rng = np.random.default_rng(100 + k)
        codes = rng.integers(0, 4, size=500)
        bad = rng.integers(0, 500, size=20)
        codes[bad] = 4
        h1, v1 = nthash.hash_kmers_scalar(codes, k)
        h2, v2 = nthash.hash_kmers(codes, k)
        np.testing.assert_array_equal(h1[v1], h2[v2])
        np.testing.assert_array_equal(v1, v2)

    def test_short_sequence(self):
        h, v = nthash.hash_kmers(np.array([0, 1, 2]), k=31)
        assert len(h) == 0 and len(v) == 0


class TestHashSemantics:
    def test_strand_independence(self):
        """Canonical hash of a sequence == canonical hash of its revcomp."""
        rng = np.random.default_rng(7)
        k = 21
        codes = rng.integers(0, 4, size=200)
        rc = (3 - codes)[::-1]
        h_f = nthash.canonical_hashes(codes, k)
        h_r = nthash.canonical_hashes(rc, k)
        np.testing.assert_array_equal(np.sort(h_f), np.sort(h_r))

    def test_n_reset_invalidates_spanning_windows(self):
        k = 5
        codes = codes_of("ACGTACGTACGT")
        codes[6] = 4
        _, valid = nthash.hash_kmers(codes, k)
        for p in range(len(valid)):
            assert valid[p] == (not (p <= 6 <= p + k - 1))

    def test_position_independence(self):
        """A k-mer hashes identically wherever it appears."""
        k = 7
        kmer = codes_of("ACGTGCA")
        rng = np.random.default_rng(9)
        for shift in [0, 3, 64, 101]:
            prefix = rng.integers(0, 4, size=shift)
            codes = np.concatenate([prefix, kmer])
            h, v = nthash.hash_kmers(codes, k)
            assert v[shift]
            base_h, _ = nthash.hash_kmers(kmer, k)
            assert h[shift] == base_h[0]

    def test_window_determinism(self):
        k = 31
        codes = codes_of("ACGT" * 20)
        h1, _ = nthash.hash_kmers(codes, k)
        h2, _ = nthash.hash_kmers(codes, k)
        np.testing.assert_array_equal(h1, h2)

    def test_hash_distribution_sanity(self):
        """Hashes should look uniform: mean near 2^63 on a random genome."""
        rng = np.random.default_rng(11)
        codes = rng.integers(0, 4, size=20_000)
        h = nthash.canonical_hashes(codes, 31)
        assert len(np.unique(h)) > 0.99 * len(h)
        # canonical = min(F, R) halves the mean vs uniform: E ≈ 2^64 / 3
        mean = float(np.mean(h.astype(np.float64)))
        assert 0.25 * 2**64 < mean < 0.42 * 2**64
