"""Bit-proof of the byte-granular hash algebra (round-2 design)."""

import numpy as np
import pytest

from miekki_tpu.oracle import nthash, nthash_bytes


@pytest.mark.parametrize("k", [21, 31, 32, 33, 63])
def test_byte_tables_match_forward_hash(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, size=400, dtype=np.int64)
    # forward hash reference: F(p) = rol^{k-1+p}(XOR ror^j seeds)
    L = len(codes)
    j = np.arange(L)
    u = nthash.ror64(nthash.SEEDS[codes], j)
    for p in [0, 1, 2, 3, 4, 7, 63, 64, 65, 100, L - k]:
        want = nthash.rol64(
            np.bitwise_xor.reduce(u[p : p + k]), (k - 1 + p) % 64
        )
        got = nthash_bytes.forward_window_bytes(codes, k, p)
        assert got == want, (k, p)
