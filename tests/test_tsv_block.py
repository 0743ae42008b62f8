"""Vectorized TSV block path (VERDICT r1 weak #3): byte-identical output to
the scalar row path on every dist surface — plain, filters, containment,
bounds, rectangular, count-matrix, and matrix text — plus scalar/vector
estimator parity in oracle.compare."""

import io

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.oracle import compare as oracle_compare
from miekki_tpu.params import SketchParams

from fixtures import make_genome_family, write_fasta


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tsvblock")
    rng = np.random.default_rng(11)
    genomes = make_genome_family(rng, 7, 8000, sub_rate=0.05)
    paths = [
        str(write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)]))
        for i, g in enumerate(genomes)
    ]
    return engine.build_index(paths, SketchParams(k=21, s=200))


def test_plain_block_path_matches_row_path(idx):
    buf = io.StringIO()
    n = engine.dist_tsv_write(buf, idx, tile=3)
    legacy = engine.rows_to_tsv(engine.dist(idx, tile=3))
    assert buf.getvalue() == legacy
    assert n == legacy.count("\n") - 1


def test_containment_bounds_filters_block_path(idx):
    cols = engine.select_columns(True, True)
    buf = io.StringIO()
    engine.dist_tsv_write(buf, idx, tile=3, columns=cols,
                          max_dist=0.9, max_p=0.5, bounds=True)
    rows = engine.filter_rows(engine.dist(idx, tile=3), 0.9, 0.5)
    rows = engine.add_bound_columns(rows, idx.params.k)
    assert buf.getvalue() == engine.rows_to_tsv(rows, columns=cols)


def test_rectangular_block_path(idx, tmp_path):
    rng = np.random.default_rng(5)
    genomes = make_genome_family(rng, 4, 8000, sub_rate=0.08)
    paths = [
        str(write_fasta(tmp_path / f"r{i}.fa", [(f"r{i}", g)]))
        for i, g in enumerate(genomes)
    ]
    idx_b = engine.build_index(paths, SketchParams(k=21, s=200))
    buf = io.StringIO()
    engine.dist_tsv_write(buf, idx, idx_b, tile=4)
    assert buf.getvalue() == engine.rows_to_tsv(engine.dist(idx, idx_b, tile=4))


def test_counts_tsv_write_matches_rows_from_count_matrices(idx):
    n = len(idx)
    sh = np.zeros((n, n), np.int64)
    un = np.zeros_like(sh)
    it = np.zeros_like(sh)
    for _, _, gi, gj, s_, u_, i_ in engine.dist_tiles(idx, tile=4):
        sh[gi, gj] = s_
        un[gi, gj] = u_
        it[gi, gj] = i_
    buf = io.StringIO()
    engine.counts_tsv_write(buf, idx, sh, un, inter=it, row_chunk=3)
    legacy = engine.rows_to_tsv(
        engine.rows_from_count_matrices(idx, sh, un, inter=it)
    )
    assert buf.getvalue() == legacy


def test_matrix_text_vectorized(idx):
    n = len(idx)
    mat = np.zeros((n, n), dtype=np.float64)
    for r in engine.dist_iter(idx, tile=3):
        mat[r["i"], r["j"]] = mat[r["j"], r["i"]] = r["mash_distance"]
    lines = [f"\t{n}"]
    for i in range(n):
        cells = "\t".join(f"{mat[i, j]:.10g}" for j in range(n))
        lines.append(f"{idx.names[i]}\t{cells}")
    assert engine.dist_matrix_text(idx, tile=3) == "\n".join(lines) + "\n"


def test_scalar_vector_estimator_parity():
    rng = np.random.default_rng(0)
    un = rng.integers(1, 1000, 2000)
    sh = np.minimum((rng.uniform(0, 1, 2000) * (un + 1)).astype(np.int64), un)
    n1 = rng.uniform(1e3, 1e7, 2000)
    n2 = rng.uniform(1e3, 1e7, 2000)
    k = 31
    pv = oracle_compare.chance_p_value_vec(sh, un, n1, n2, k)
    dv = oracle_compare.mash_distance_vec(sh / un, k)
    lo, hi = oracle_compare.jaccard_ci_vec(sh, un)
    av = oracle_compare.ani_from_containment_vec(sh / un, k)
    for i in range(0, 2000, 61):
        assert pv[i] == oracle_compare.chance_p_value(
            int(sh[i]), int(un[i]), float(n1[i]), float(n2[i]), k)
        assert dv[i] == oracle_compare.mash_distance(float(sh[i] / un[i]), k)
        assert (float(lo[i]), float(hi[i])) == oracle_compare.jaccard_ci(
            int(sh[i]), int(un[i]))
        assert av[i] == oracle_compare.ani_from_containment(
            float(sh[i] / un[i]), k)


def test_betainc_vs_exact_binomial_tail():
    from math import comb

    def exact_tail(sh_, un_, q):
        return sum(
            comb(un_, t) * q ** t * (1 - q) ** (un_ - t)
            for t in range(sh_, un_ + 1)
        )

    for (a, n, q) in [(3, 50, 0.1), (1, 10, 0.5), (20, 400, 0.04), (5, 5, 0.9)]:
        got = float(oracle_compare.betainc_vec(
            np.float64(a), np.float64(n - a + 1), np.float64(q)))
        want = exact_tail(a, n, q)
        assert abs(got - want) < 1e-12 * max(want, 1e-30)
