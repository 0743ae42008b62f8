"""Integration tests — the acceptance-config analogs of SURVEY.md §4:

  config 1: single genome sketch + self-compare → j=1, d=0, exact vs oracle
  config 2: 10 genomes, 45 pairs, Mash-distance parity vs oracle (bitwise
            on counts; identical float formulas)
  config 4 (small): read screening containment parity vs oracle
"""

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.index.store import SketchIndex
from miekki_tpu.io import encode, reader
from miekki_tpu.oracle import compare as oracle_compare
from miekki_tpu.oracle import nthash, sketch as oracle_sketch
from miekki_tpu.params import SketchParams

from fixtures import make_genome_family, mutate, random_seq, reads_from_genome, write_fasta, write_fastq


@pytest.fixture(scope="module")
def family(tmp_path_factory):
    """10 related genomes on disk + their oracle sketches."""
    tmp = tmp_path_factory.mktemp("genomes")
    rng = np.random.default_rng(1234)
    genomes = make_genome_family(rng, 10, 30_000, sub_rate=0.03)
    params = SketchParams(k=21, s=500)
    paths = []
    for i, g in enumerate(genomes):
        paths.append(write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)]))
    oracle_sks = [
        oracle_sketch.sketch_codes(encode.encode(g), params.k, params.s)
        for g in genomes
    ]
    return paths, genomes, oracle_sks, params


class TestConfig1SelfCompare:
    def test_sketch_file_matches_oracle(self, family):
        paths, genomes, oracle_sks, params = family
        got = engine.sketch_file(paths[0], params, chunk=8192)
        np.testing.assert_array_equal(got, oracle_sks[0])

    def test_self_compare_identity(self, family):
        paths, _, _, params = family
        index = engine.build_index(paths[:1] * 2, params, names=["a", "b"])
        [row] = engine.dist(index)
        assert row["jaccard"] == 1.0
        assert row["mash_distance"] == 0.0
        assert row["ani"] == 1.0


class TestConfig2PairwiseParity:
    def test_45_pairs_bitwise_counts(self, family):
        paths, genomes, oracle_sks, params = family
        index = engine.build_index(paths, params, chunk=8192)
        # sketches bitwise-equal to oracle
        for i in range(10):
            np.testing.assert_array_equal(index.sketch_u64(i), oracle_sks[i])
        rows = engine.dist(index, tile=4)  # deliberately non-dividing tile
        assert len(rows) == 45
        want = {
            (r["i"], r["j"]): r
            for r in oracle_compare.all_vs_all(oracle_sks, params.k, params.s)
        }
        for row in rows:
            w = want[(row["i"], row["j"])]
            assert row["shared"] == w["shared"]
            assert row["union"] == w["union"]
            assert row["jaccard"] == w["jaccard"]          # same float64 math
            assert row["mash_distance"] == w["distance"]
            assert row["ani"] == w["ani"]

    def test_cross_index_dist(self, family):
        paths, _, oracle_sks, params = family
        ia = engine.build_index(paths[:3], params, chunk=8192)
        ib = engine.build_index(paths[3:6], params, chunk=8192)
        rows = engine.dist(ia, ib, tile=2)
        assert len(rows) == 9
        for row in rows:
            w = oracle_compare.compare_sketches(
                oracle_sks[row["i"]], oracle_sks[3 + row["j"]], params.k, params.s
            )
            assert row["shared"] == w["shared"]
            assert row["mash_distance"] == w["distance"]

    def test_resume_skip_tiles(self, family):
        paths, _, _, params = family
        index = engine.build_index(paths, params, chunk=8192)
        done = []
        all_rows = list(engine.dist_iter(index, tile=4, on_tile_done=done.append))
        skip = set(done[:2])
        rest = list(engine.dist_iter(index, tile=4, skip_tiles=skip))
        redone = list(engine.dist_iter(index, tile=4))
        got_keys = {(r["i"], r["j"]) for r in rest}
        # rows from skipped tiles missing, everything else identical
        assert got_keys < {(r["i"], r["j"]) for r in redone}
        assert len(all_rows) == len(redone)


class TestScreen:
    def test_containment_parity_with_oracle(self, tmp_path):
        rng = np.random.default_rng(77)
        params = SketchParams(k=21, s=300)
        genomes = make_genome_family(rng, 4, 20_000, sub_rate=0.10)
        paths = [write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]) for i, g in enumerate(genomes)]
        index = engine.build_index(paths, params, chunk=8192)

        reads = reads_from_genome(rng, genomes[0], n_reads=300, read_len=120)
        reads_path = write_fastq(tmp_path / "reads.fq", [(f"r{i}", r) for i, r in enumerate(reads)])

        rows = engine.screen(index, reads_path, flat=4096)
        # oracle: containment of each genome sketch in the full read hash set
        read_hashes = np.concatenate([
            nthash.canonical_hashes(encode.encode(r), params.k) for r in reads
        ])
        for g, row in enumerate(rows):
            sk = oracle_sketch.sketch_codes(encode.encode(genomes[g]), params.k, params.s)
            want = oracle_compare.containment(sk, read_hashes)
            assert row["containment"] == want, f"genome {g}"
        # genome 0 is the read source: highest containment
        assert rows[0]["containment"] == max(r["containment"] for r in rows)
        assert rows[0]["containment"] > 0.5

    def test_long_record_split(self, tmp_path):
        """Records longer than the flat buffer are hashed exactly."""
        rng = np.random.default_rng(78)
        params = SketchParams(k=21, s=200)
        genome = random_seq(rng, 30_000)
        gpath = write_fasta(tmp_path / "g.fa", [("g", genome)])
        index = engine.build_index([gpath], params, chunk=8192)
        # screen the genome against itself with a tiny flat buffer
        rows = engine.screen(index, gpath, flat=2048)
        assert rows[0]["containment"] == 1.0


class TestIndexStore:
    def test_save_load_roundtrip(self, family, tmp_path):
        paths, _, _, params = family
        index = engine.build_index(paths[:4], params, chunk=8192)
        index.save(tmp_path / "db.npz")
        loaded = SketchIndex.load(tmp_path / "db.npz")
        assert loaded.params == params
        assert loaded.names == index.names
        np.testing.assert_array_equal(loaded.hi, index.hi)
        np.testing.assert_array_equal(loaded.lo, index.lo)

    def test_sharded_roundtrip(self, family, tmp_path):
        paths, _, _, params = family
        index = engine.build_index(paths, params, chunk=8192)
        shard_paths = index.save_sharded(str(tmp_path / "db"), 3)
        assert len(shard_paths) == 3
        loaded = SketchIndex.load_sharded(shard_paths)
        assert loaded.names == index.names
        np.testing.assert_array_equal(loaded.hi, index.hi)

    def test_params_mismatch_rejected(self, family, tmp_path):
        paths, _, _, params = family
        ia = engine.build_index(paths[:2], params, chunk=8192)
        ib = engine.build_index(paths[:2], SketchParams(k=31, s=params.s), chunk=8192)
        with pytest.raises(ValueError, match="incompatible"):
            list(engine.dist_iter(ia, ib))


def test_screen_repeatable_with_donation(tmp_path):
    """_screen_update donates its accumulator (input_output aliasing); two
    back-to-back runs must not interfere (SURVEY.md §5 'race detection':
    donated-buffer aliasing is the one sharp edge in the functional model)."""
    rng = np.random.default_rng(77)
    genomes = make_genome_family(rng, 3, 3000, sub_rate=0.04)
    paths = [write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)])
             for i, g in enumerate(genomes)]
    idx = engine.build_index(paths, SketchParams(k=21, s=150))
    reads = reads_from_genome(rng, genomes[2], 120, 90)
    rp = write_fastq(tmp_path / "r.fq",
                     [(f"r{i}", s) for i, s in enumerate(reads)])
    r1 = engine.screen(idx, rp, flat=2048)
    r2 = engine.screen(idx, rp, flat=2048)
    assert r1 == r2
    assert r2[2]["containment"] > 0.5


def test_build_index_batched_matches_sequential(tmp_path):
    """Batched (vmapped) sketching must equal per-genome sketching exactly,
    across mixed genome lengths (different shape buckets) and a genome
    shorter than k."""
    rng = np.random.default_rng(99)
    lengths = [3000, 3000, 7000, 12000, 10, 3000]
    paths = []
    for i, L in enumerate(lengths):
        seq = random_seq(rng, L)
        paths.append(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", seq)]))
    params = SketchParams(k=21, s=300)
    a = engine.build_index(paths, params, batch=8)
    b = engine.build_index(paths, params, batch=1)
    assert a.names == b.names
    assert np.array_equal(a.hi, b.hi)
    assert np.array_equal(a.lo, b.lo)
    assert a.sizes()[4] == 0  # genome shorter than k -> empty sketch


def test_dist_containment_columns(tmp_path):
    """--containment columns: identical genomes give c=1; oracle parity for
    the full-intersection count."""
    rng = np.random.default_rng(87)
    g = random_seq(rng, 4000)
    g2 = mutate(rng, g, 0.03)
    p1 = write_fasta(tmp_path / "a.fa", [("a", g)])
    p2 = write_fasta(tmp_path / "b.fa", [("b", g2)])
    p3 = write_fasta(tmp_path / "c.fa", [("c", g)])  # identical to a
    idx = engine.build_index([p1, p2, p3], SketchParams(k=21, s=300))
    rows = {(r["i"], r["j"]): r for r in engine.dist(idx)}
    same = rows[(0, 2)]
    assert same["containment_q"] == 1.0 and same["containment_r"] == 1.0
    assert same["ani_containment"] == 1.0
    rel = rows[(0, 1)]
    assert 0.0 < rel["containment_q"] < 1.0
    # oracle parity on |S(a) ∩ S(b)|
    from miekki_tpu.io import encode as E
    from miekki_tpu.oracle import compare as OC, sketch as OS

    sa = OS.sketch_codes(E.encode(g), 21, 300)
    sb = OS.sketch_codes(E.encode(g2), 21, 300)
    want = OC.intersection_size(sa, sb)
    assert rel["containment_q"] == want / len(sa)


def test_sketch_fastq_read_set_pooled(tmp_path):
    """Sketching a FASTQ read set as ONE pooled sketch (the metagenome
    use-case: mash sketch reads.fq) must equal the oracle over the
    N-separated concatenation of the reads."""
    rng = np.random.default_rng(121)
    genome = random_seq(rng, 8000)
    reads = reads_from_genome(rng, genome, 200, 120)
    rp = write_fastq(tmp_path / "r.fq", [(f"r{i}", s) for i, s in enumerate(reads)])
    params = SketchParams(k=21, s=300)
    sk = engine.sketch_file(rp, params)
    from miekki_tpu.oracle import nthash
    want = np.unique(nthash.canonical_hashes(
        encode.encode(b"N".join(reads)), 21))[:300]
    assert np.array_equal(sk, want)


def test_screen_flat_not_multiple_of_chunk(tmp_path):
    """Regression (ADVICE r1, high): when --flat is not a multiple of
    SCREEN_CHUNK and survivors span >1 chunk, the final dynamic_slice used
    to clamp its start and silently drop trailing survivors.  A genome
    screened against itself with s > #kmers (every window survives the
    prefilter) must still report containment 1.0."""
    rng = np.random.default_rng(99)
    params = SketchParams(k=21, s=20_000)  # sketch = all distinct hashes
    genome = random_seq(rng, 12_000)
    gpath = write_fasta(tmp_path / "g.fa", [("g", genome)])
    index = engine.build_index([gpath], params, chunk=8192)
    assert 4096 < int(index.sizes()[0]) < 20_000
    rows = engine.screen(index, gpath, flat=6000)  # 6000 % 4096 != 0
    assert rows[0]["hits"] == int(index.sizes()[0])
    assert rows[0]["containment"] == 1.0
