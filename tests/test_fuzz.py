"""Seeded fuzz: random (k, s, genome, N-rate) combinations through the whole
device pipeline vs the numpy oracle — the broad-spectrum regression net."""

import numpy as np
import pytest

from miekki_tpu.io import encode
from miekki_tpu.oracle import compare as oc, nthash, sketch as osk
from miekki_tpu.ops import sketch as dsk


@pytest.mark.parametrize("trial", range(14))
def test_fuzz_sketch_and_compare(trial):
    rng = np.random.default_rng(1000 + trial)
    k = int(rng.integers(7, 64))
    s = int(rng.integers(16, 700))
    length = int(rng.integers(k + 5, 30_000))
    n_prob = float(rng.choice([0.0, 0.0, 0.02, 0.2]))
    codes = rng.integers(0, 4, size=length, dtype=np.int64)
    if n_prob:
        codes[rng.random(length) < n_prob] = 4

    got = dsk.sketch_codes_device(codes.astype(np.uint8), k, s,
                                  chunk=int(rng.choice([2048, 4096, 8192])))
    want = np.unique(nthash.canonical_hashes(codes, k))[:s]
    assert np.array_equal(got, want), (trial, k, s, length, n_prob)

    # pair with a mutated copy through the estimator chain
    codes2 = codes.copy()
    flips = rng.random(length) < 0.05
    codes2[flips] = (codes2[flips] + 1) % 4
    sk2 = dsk.sketch_codes_device(codes2.astype(np.uint8), k, s, chunk=4096)
    want2 = np.unique(nthash.canonical_hashes(codes2, k))[:s]
    assert np.array_equal(sk2, want2)
    rec = oc.compare_sketches(got, sk2, k, s)
    assert 0.0 <= rec["jaccard"] <= 1.0
    assert 0.0 <= rec["distance"] <= 1.0


@pytest.mark.parametrize("kind", ["homopolymer", "tandem", "palindrome", "n_blocks"])
def test_structured_genomes(kind):
    """Adversarially structured sequences: massive hash duplication
    (homopolymers, tandem repeats), revcomp symmetry (palindromes: F == R),
    and long invalid blocks — all must stay oracle-exact."""
    rng = np.random.default_rng(hash(kind) % 2**31)
    k, s = 21, 200
    if kind == "homopolymer":
        codes = np.concatenate([
            np.full(3000, 0, np.int64), np.full(3000, 2, np.int64),
            rng.integers(0, 4, size=2000, dtype=np.int64)])
    elif kind == "tandem":
        motif = rng.integers(0, 4, size=37, dtype=np.int64)
        codes = np.tile(motif, 300)
    elif kind == "palindrome":
        half = rng.integers(0, 4, size=4000, dtype=np.int64)
        codes = np.concatenate([half, 3 - half[::-1]])  # revcomp mirror
    else:
        codes = rng.integers(0, 4, size=8000, dtype=np.int64)
        codes[1000:3000] = 4  # long invalid block
        codes[5000:5003] = 4
    got = dsk.sketch_codes_device(codes.astype(np.uint8), k, s, chunk=2048)
    want = np.unique(nthash.canonical_hashes(codes, k))[:s]
    assert np.array_equal(got, want), kind


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_bulk_matrix_vs_rows(trial, monkeypatch):
    """Random (n, s, tile, impl, sharing) through dist_counts_matrix vs
    the row-level dist_iter — the r4 bulk path (raw tiles, slim pulls,
    deferred + native ambiguity resolution) must agree cell-for-cell on
    every shape, including n smaller than one tile and heavy sharing."""
    from miekki_tpu import engine
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.params import SketchParams

    rng = np.random.default_rng(7000 + trial)
    s = int(rng.integers(24, 300))
    n = int(rng.integers(2, 40))
    tile = int(rng.choice([2, 3, 8, 64]))
    impl = str(rng.choice(["mxu", "searchsorted"]))
    share = float(rng.choice([0.0, 0.3, 0.8]))
    pool = np.unique(rng.integers(1, 2**63, size=4 * s, dtype=np.uint64))
    sketches = []
    for _ in range(n):
        m = int(rng.integers(1, s + 1))
        if share and len(pool) >= s:
            keep = rng.random(s) < share
            vals = np.where(keep, pool[:s],
                            rng.integers(1, 2**63, size=s, dtype=np.uint64))
        else:
            vals = rng.integers(1, 2**63, size=s, dtype=np.uint64)
        sketches.append(np.unique(vals)[:m])
    idx = SketchIndex.from_sketches(
        sketches, [f"g{i}" for i in range(n)], SketchParams(k=21, s=s))
    monkeypatch.setenv("MIEKKI_INTERSECT", impl)
    mat = engine.dist_counts_matrix(idx, tile=tile)
    for r in engine.dist_iter(idx, tile=tile):
        assert mat["shared"][r["i"], r["j"]] == r["shared"], (trial, r)
        assert mat["union"][r["i"], r["j"]] == r["union"], (trial, r)
