"""FASTA/FASTQ reader tests (component C1, SURVEY.md §2)."""

import numpy as np

from miekki_tpu.io import encode, reader

from fixtures import random_seq, write_fasta, write_fastq


class TestFasta:
    def test_multiline_records(self, tmp_path):
        rng = np.random.default_rng(1)
        recs = [("g1 extra tokens", random_seq(rng, 150)), ("g2", random_seq(rng, 35))]
        p = write_fasta(tmp_path / "x.fa", recs, line_width=40)
        got = list(reader.read_records(p))
        assert [n for n, _ in got] == ["g1", "g2"]
        assert got[0][1] == recs[0][1]
        assert got[1][1] == recs[1][1]

    def test_gzip_detected_by_magic(self, tmp_path):
        rng = np.random.default_rng(2)
        recs = [("g", random_seq(rng, 500))]
        # wrong extension on purpose: detection is by magic bytes
        p = write_fasta(tmp_path / "x.fa", recs, gz=True)
        got = list(reader.read_records(p))
        assert got[0] == ("g", recs[0][1])

    def test_empty_sequence_lines(self, tmp_path):
        p = tmp_path / "x.fa"
        p.write_bytes(b">a\nACGT\n\nGGTT\n>b\nTTTT\n")
        got = list(reader.read_records(p))
        assert got == [("a", b"ACGTGGTT"), ("b", b"TTTT")]


class TestFastq:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        recs = [(f"r{i}", random_seq(rng, 100)) for i in range(10)]
        p = write_fastq(tmp_path / "x.fq", recs)
        got = list(reader.read_records(p))
        assert got == recs

    def test_gzip(self, tmp_path):
        rng = np.random.default_rng(4)
        recs = [(f"r{i}", random_seq(rng, 80)) for i in range(5)]
        p = write_fastq(tmp_path / "x.fq.gz", recs, gz=True)
        got = list(reader.read_records(p))
        assert got == recs


class TestEncoded:
    def test_read_encoded(self, tmp_path):
        p = tmp_path / "x.fa"
        p.write_bytes(b">a\nACGTN\n")
        [(name, codes)] = list(reader.read_encoded(p))
        assert name == "a"
        assert codes.tolist() == [0, 1, 2, 3, 4]

    def test_pack_records_separator(self):
        a = encode.encode_str("ACGT")
        b = encode.encode_str("TTTT")
        packed = encode.pack_records([a, b], k=3)
        assert packed.tolist() == [0, 1, 2, 3, 4, 4, 3, 3, 3, 3]


def test_sharded_index_more_shards_than_genomes(tmp_path):
    import numpy as np
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.params import SketchParams

    params = SketchParams(k=21, s=8)
    sketches = [np.sort(np.random.default_rng(i).integers(
        0, 2**60, size=8, dtype=np.uint64)) for i in range(2)]
    idx = SketchIndex.from_sketches(sketches, ["a", "b"], params)
    paths = idx.save_sharded(str(tmp_path / "db"), 4)  # empty shards exist
    back = SketchIndex.load_sharded(paths)
    assert back.names == idx.names
    assert np.array_equal(back.hi, idx.hi)
    assert np.array_equal(back.lo, idx.lo)


def test_rna_and_protein_sequences_yield_empty_sketches(tmp_path):
    """Non-DNA alphabets (RNA U, amino acids) are all-invalid by the 2-bit
    contract: sketching must succeed and produce empty sketches, not crash."""
    from miekki_tpu import engine
    from miekki_tpu.params import SketchParams

    p = tmp_path / "weird.fa"
    p.write_bytes(b">rna\nAUGGCUUAA\n>protein\nMKVLITGGAGFIGSNLVRYLLN\n"
                  b">dna\n" + b"ACGT" * 50 + b"\n")
    idx = engine.build_index([p], SketchParams(k=21, s=64))
    assert len(idx) == 1  # one file = one pooled genome
    assert idx.sizes()[0] > 0  # the DNA record still contributes


def test_profile_flag_smoke(tmp_path):
    """--profile must produce a trace directory without breaking the run."""
    import numpy as np
    from fixtures import random_genome_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(3)
    p = str(random_genome_fasta(tmp_path / "g.fa", rng, length=3000))
    db = str(tmp_path / "db.npz")
    prof = tmp_path / "trace"
    assert main(["sketch", p, "-o", db, "-k", "21", "-s", "50",
                 "--profile", str(prof)]) == 0
    assert prof.exists() and any(prof.rglob("*"))


def test_index_format_version_check(tmp_path):
    import json
    import numpy as np
    import pytest
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.params import SketchParams

    params = SketchParams(k=21, s=8)
    idx = SketchIndex.from_sketches(
        [np.sort(np.random.default_rng(0).integers(0, 2**60, size=8,
                                                   dtype=np.uint64))],
        ["g"], params)
    p = tmp_path / "db.npz"
    idx.save(p)
    # corrupt the format version
    with np.load(p) as z:
        header = json.loads(bytes(z["header"]).decode())
        hi, lo = z["hi"], z["lo"]
    header["format_version"] = 999
    np.savez(p, hi=hi, lo=lo,
             header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8))
    with pytest.raises(ValueError, match="unsupported index format"):
        SketchIndex.load(p)


def test_incompatible_params_refused(tmp_path):
    import numpy as np
    import pytest
    from miekki_tpu.params import SketchParams

    a = SketchParams(k=21, s=100)
    b = SketchParams(k=31, s=100)
    with pytest.raises(ValueError, match="incompatible sketch params"):
        a.validate_compatible(b)
    with pytest.raises(ValueError):
        SketchParams(k=0)
    with pytest.raises(ValueError):
        SketchParams(k=65)
    with pytest.raises(ValueError):
        SketchParams(s=0)


def test_base5_pack_roundtrip():
    """pack_base5 (host) ∘ _unpack_base5 (device) is exact for every code
    value incl. INVALID, any width mod 3, and batched shapes."""
    import numpy as np

    from miekki_tpu.io import encode as enc
    from miekki_tpu import engine

    rng = np.random.default_rng(9)
    for shape in ((7,), (31,), (2, 3, 17), (4, 48)):
        codes = rng.integers(0, 5, size=shape).astype(np.uint8)
        packed = enc.pack_base5(codes)
        assert packed.dtype == np.uint8
        assert packed.shape[-1] == -(-shape[-1] // 3)
        out = np.asarray(engine._unpack_base5(packed, shape[-1]))
        np.testing.assert_array_equal(out, codes)


def test_build_index_packed_upload_bitwise(tmp_path):
    """The base-5 packed upload path must leave build_index output
    bit-identical to per-genome unbatched sketching (batch=1 path skips
    packing)."""
    import numpy as np

    from miekki_tpu import engine
    from miekki_tpu.params import SketchParams

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_genome_family, write_fasta

    rng = np.random.default_rng(17)
    genomes = make_genome_family(rng, 5, 4000, sub_rate=0.05)
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(genomes)]
    params = SketchParams(k=21, s=128)
    batched = engine.build_index(paths, params)          # packed upload
    unbatched = engine.build_index(paths, params, batch=1)  # raw codes
    for i in range(len(paths)):
        np.testing.assert_array_equal(batched.sketch_u64(i),
                                      unbatched.sketch_u64(i))
