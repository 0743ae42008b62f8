"""Environment-matrix e2e: every merge strategy x hash impl combination must
produce the identical sketch + distance table (the env toggles must never
change results, only speed)."""

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.params import SketchParams
from miekki_tpu.ops import sketch as dsk

from fixtures import make_genome_family, write_fasta


@pytest.fixture(scope="module")
def genomes_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("envmat")
    rng = np.random.default_rng(311)
    genomes = make_genome_family(rng, 4, 6000, sub_rate=0.04)
    return [write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)])
            for i, g in enumerate(genomes)]


@pytest.fixture(scope="module")
def reference_tsv(genomes_paths):
    idx = engine.build_index(genomes_paths, SketchParams(k=21, s=256))
    return engine.rows_to_tsv(engine.dist(idx))


@pytest.mark.parametrize("merge", ["sort", "threshold", "tree", "fused"])
@pytest.mark.parametrize("hash_impl", ["xla", "pallas"])
def test_env_matrix_bitwise_identical(monkeypatch, genomes_paths,
                                      reference_tsv, merge, hash_impl):
    monkeypatch.setenv("MIEKKI_MERGE", merge)
    monkeypatch.setenv("MIEKKI_HASH", hash_impl)
    idx = engine.build_index(genomes_paths, SketchParams(k=21, s=256))
    got = engine.rows_to_tsv(engine.dist(idx))
    assert got == reference_tsv, (merge, hash_impl)


@pytest.mark.parametrize("join", ["merge", "searchsorted"])
@pytest.mark.parametrize("chunk", ["4096", "999"])
def test_screen_join_matrix_identical(monkeypatch, genomes_paths, tmp_path,
                                      join, chunk):
    """The screen join impl / chunk knobs must never change results — the
    r3 gather-free sorted-merge join vs the searchsorted join, at awkward
    chunk sizes (non-pow2, smaller than the survivor count)."""
    from fixtures import reads_from_genome, write_fastq

    rng = np.random.default_rng(17)
    idx = engine.build_index(genomes_paths, SketchParams(k=21, s=256))
    import miekki_tpu.io.reader as _r

    g1 = b"".join(s for _, s in _r.read_records(str(genomes_paths[1])))
    reads = reads_from_genome(rng, g1, 60, 80)
    rp = str(write_fastq(tmp_path / f"r_{join}_{chunk}.fq",
                         [(f"r{i}", r) for i, r in enumerate(reads)]))
    monkeypatch.setenv("MIEKKI_SCREEN_JOIN", join)
    monkeypatch.setenv("MIEKKI_SCREEN_CHUNK", chunk)
    stats = {}
    got = engine.screen(idx, rp, flat=2048, stats=stats)
    monkeypatch.delenv("MIEKKI_SCREEN_JOIN")
    monkeypatch.delenv("MIEKKI_SCREEN_CHUNK")
    want = engine.screen(idx, rp, flat=2048)
    assert got == want, (join, chunk)
    assert stats["n_survivors"] > 0  # metrics contract holds on both joins


@pytest.mark.parametrize("knobs", [
    {"MIEKKI_KEEP_DEV": "1"},
    {"MIEKKI_KEEP_DEV": "0"},
    {"MIEKKI_NATIVE_RESOLVE": "0", "MIEKKI_INTERSECT": "mxu"},
    {"MIEKKI_NATIVE_RESOLVE": "1", "MIEKKI_INTERSECT": "mxu"},
    {"MIEKKI_SCREEN_DB_VALS": "200"},  # forces slabbed screen
])
def test_r4_knob_matrix_identical(monkeypatch, genomes_paths, reference_tsv,
                                  knobs):
    """The r4 knobs (device-plane retention, native vs device ambiguity
    resolve, screen slab budget) must never change results."""
    for k_, v in knobs.items():
        monkeypatch.setenv(k_, v)
    idx = engine.build_index(genomes_paths, SketchParams(k=21, s=256))
    got = engine.rows_to_tsv(engine.dist(idx))
    assert got == reference_tsv, knobs
    if "MIEKKI_SCREEN_DB_VALS" in knobs:
        from fixtures import reads_from_genome, write_fastq

        rng = np.random.default_rng(5)
        g0 = open(genomes_paths[0], "rb").read().split(b"\n", 1)[1]
        g0 = g0.replace(b"\n", b"")
        reads = [(f"r{i}", r) for i, r in enumerate(
            reads_from_genome(rng, g0, 40, 100))]
        import pathlib
        fq = write_fastq(pathlib.Path(str(genomes_paths[0]) + ".fq"), reads)
        st: dict = {}
        slabbed = engine.screen(idx, str(fq), stats=st)
        assert st.get("n_slabs", 0) >= 2
        monkeypatch.delenv("MIEKKI_SCREEN_DB_VALS")
        assert slabbed == engine.screen(idx, str(fq))
