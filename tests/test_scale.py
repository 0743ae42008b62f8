"""Medium-scale all-vs-all invariants (SURVEY.md §4 "Scale (1 chip)" row,
downsized for the CPU test backend): full-matrix symmetry, diagonal
identity, and random-pair oracle spot checks — the checks that catch tiling
and padding bugs which small fixed cases miss."""

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.oracle import compare as oracle_compare
from miekki_tpu.oracle import nthash, sketch as oracle_sketch
from miekki_tpu.params import SketchParams
from miekki_tpu.parallel import dist_sharded, local_mesh

from fixtures import make_genome_family, write_fasta


N_GENOMES = 48
K, S = 21, 96


@pytest.fixture(scope="module")
def family_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scale")
    rng = np.random.default_rng(101)
    genomes = make_genome_family(rng, N_GENOMES, 2500, sub_rate=0.05)
    paths = [write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)])
             for i, g in enumerate(genomes)]
    idx = engine.build_index(paths, SketchParams(k=K, s=S))
    return idx, genomes


def test_allvsall_matrix_invariants(family_index):
    idx, _ = family_index
    counts = dist_sharded(idx, local_mesh())
    shared, union = counts["shared"], counts["union"]
    assert shared.shape == (N_GENOMES, N_GENOMES)
    assert np.array_equal(shared, shared.T)
    assert np.array_equal(union, union.T)
    sizes = idx.sizes()
    for i in range(N_GENOMES):
        assert shared[i, i] == min(int(sizes[i]), S)
    # related genomes must share far more than the off-family floor
    assert (shared[0, 1:] > 0).all()


def test_tiling_independence(family_index):
    """Tile size must not affect any row (catches tile-boundary bugs)."""
    idx, _ = family_index
    a = engine.dist(idx, tile=7)
    b = engine.dist(idx, tile=48)
    c = engine.dist(idx, tile=128)  # bigger than N
    assert a == b == c


def test_random_pairs_match_oracle(family_index):
    idx, genomes = family_index
    rng = np.random.default_rng(5)
    rows = {(r["i"], r["j"]): r for r in engine.dist(idx)}
    from miekki_tpu.io import encode

    sketches = [
        oracle_sketch.sketch_codes(encode.encode(g), K, S) for g in genomes
    ]
    for _ in range(12):
        i, j = sorted(rng.choice(N_GENOMES, size=2, replace=False))
        want = oracle_compare.compare_sketches(sketches[i], sketches[j], K, S)
        got = rows[(i, j)]
        assert got["shared"] == want["shared"], (i, j)
        assert got["union"] == want["union"], (i, j)
        assert got["mash_distance"] == want["distance"], (i, j)
