"""Parity tests: native C++ reader (io.native) vs pure-Python reader spec.

Skipped when native/libmiekki_io.so is not built (`make -C native`)."""

import gzip
import os

import numpy as np
import pytest

from miekki_tpu.io import encode as E
from miekki_tpu.io import native as N
from miekki_tpu.io import reader as R

from fixtures import random_seq, write_fasta, write_fastq

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native IO library not built"
)


def _python_records(path):
    return [(n, E.encode(s)) for n, s in R.read_records(path)]


def _native_records(path):
    return list(N.read_encoded_native(path))


def assert_same(path):
    py = _python_records(path)
    nat = _native_records(path)
    assert [n for n, _ in py] == [n for n, _ in nat]
    for (_, a), (_, b) in zip(py, nat):
        assert np.array_equal(a, b)


def test_fasta_multirecord_multiline(tmp_path):
    rng = np.random.default_rng(0)
    records = [
        ("chr1 extra description", random_seq(rng, 500, n_prob=0.05)),
        ("chr2", random_seq(rng, 137)),
        ("", b"ACGTNacgtn"),
    ]
    assert_same(write_fasta(tmp_path / "a.fa", records, line_width=60))


def test_fasta_gzip_magic_detection(tmp_path):
    rng = np.random.default_rng(1)
    records = [("g", random_seq(rng, 1000))]
    # gzipped content behind a non-.gz extension: must be detected by magic
    p = tmp_path / "plain_name.fa"
    p.write_bytes(gzip.compress((b">g\n" + records[0][1] + b"\n")))
    assert_same(p)


def test_fastq_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    records = [(f"r{i}", random_seq(rng, 80 + i)) for i in range(25)]
    assert_same(write_fastq(tmp_path / "r.fq", records))
    assert_same(write_fastq(tmp_path / "r.fq.gz", records, gz=True))


def test_crlf_line_endings(tmp_path):
    p = tmp_path / "crlf.fa"
    p.write_bytes(b">name desc\r\nACGT\r\nTTAA\r\n>n2\r\nGGGG\r\n")
    assert_same(p)


def test_malformed_fastq_missing_plus(tmp_path):
    p = tmp_path / "bad.fq"
    p.write_bytes(b"@r1\nACGT\nXXXX\nIIII\n")
    with pytest.raises(ValueError):
        _native_records(p)
    with pytest.raises(ValueError):
        _python_records(p)


def test_fastq_qual_length_mismatch(tmp_path):
    p = tmp_path / "bad2.fq"
    p.write_bytes(b"@r1\nACGT\n+\nIII\n")
    with pytest.raises(ValueError):
        _native_records(p)
    with pytest.raises(ValueError):
        _python_records(p)


def test_unrecognized_file(tmp_path):
    p = tmp_path / "junk.txt"
    p.write_bytes(b"hello world\n")
    with pytest.raises(ValueError):
        _native_records(p)
    with pytest.raises(ValueError):
        _python_records(p)


def test_empty_file(tmp_path):
    p = tmp_path / "empty.fa"
    p.write_bytes(b"")
    with pytest.raises(ValueError):
        _native_records(p)
    with pytest.raises(ValueError):
        _python_records(p)


def test_engine_uses_native_transparently(tmp_path):
    """read_encoded dispatches to native; results equal the python spec."""
    rng = np.random.default_rng(3)
    p = write_fasta(tmp_path / "g.fa", [("g", random_seq(rng, 2000))])
    via_dispatch = [(n, c.copy()) for n, c in R.read_encoded(p)]
    py = _python_records(p)
    assert [n for n, _ in via_dispatch] == [n for n, _ in py]
    for (_, a), (_, b) in zip(via_dispatch, py):
        assert np.array_equal(a, b)


def test_screen_same_with_fast_and_slow_packers(tmp_path, monkeypatch):
    """engine.screen must give identical rows whether read batches come from
    the vectorized native packer or the per-record Python packer."""
    from miekki_tpu import engine
    from miekki_tpu.params import SketchParams
    from fixtures import make_genome_family, reads_from_genome, write_fasta, write_fastq

    rng = np.random.default_rng(17)
    genomes = make_genome_family(rng, 3, 4000, sub_rate=0.05)
    paths = [write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)])
             for i, g in enumerate(genomes)]
    idx = engine.build_index(paths, SketchParams(k=21, s=300))
    reads = reads_from_genome(rng, genomes[1], 150, 90)
    rp = write_fastq(tmp_path / "r.fq", [(f"r{i}", s) for i, s in enumerate(reads)])

    fast = engine.screen(idx, rp, flat=2048)
    monkeypatch.setenv("MIEKKI_NATIVE_IO", "0")
    import miekki_tpu.io.native as N2
    monkeypatch.setattr(N2, "_lib_checked", False)
    monkeypatch.setattr(N2, "_lib", None)
    slow = engine.screen(idx, rp, flat=2048)
    assert fast == slow


def test_screen_long_records_fast_slow_parity(tmp_path, monkeypatch):
    """Records LONGER than the batch size take the record-splitting path in
    the slow packer and the plain-stream path in the fast packer — hash
    sets (and therefore screen rows) must still agree."""
    from miekki_tpu import engine
    from miekki_tpu.params import SketchParams
    from fixtures import random_seq, write_fasta, write_fastq

    rng = np.random.default_rng(19)
    genome = random_seq(rng, 6000)
    gp = write_fasta(tmp_path / "g.fa", [("g", genome)])
    idx = engine.build_index([gp], SketchParams(k=21, s=400))
    # read set: one 10kb "read" (> flat) + short reads, FASTQ
    reads = [genome[:2000] + genome[:2000] + random_seq(rng, 6000)] + [
        genome[i * 50 : i * 50 + 90] for i in range(20)
    ]
    rp = write_fastq(tmp_path / "r.fq",
                     [(f"r{i}", s) for i, s in enumerate(reads)])
    fast = engine.screen(idx, rp, flat=2048)
    monkeypatch.setenv("MIEKKI_NATIVE_IO", "0")
    import miekki_tpu.io.native as N2
    monkeypatch.setattr(N2, "_lib_checked", False)
    monkeypatch.setattr(N2, "_lib", None)
    slow = engine.screen(idx, rp, flat=2048)
    assert fast == slow
    assert fast[0]["containment"] > 0.3


def test_no_trailing_newline(tmp_path):
    p = tmp_path / "nt.fa"
    p.write_bytes(b">a\nACGT\nGGCC")  # no final newline
    assert_same(p)


def test_empty_sequence_record(tmp_path):
    p = tmp_path / "empty_rec.fa"
    p.write_bytes(b">empty\n>full\nACGTACGT\n")
    assert_same(p)


def test_fastq_no_trailing_newline(tmp_path):
    p = tmp_path / "nt.fq"
    p.write_bytes(b"@r\nACGT\n+\nIIII")  # qual line without newline
    assert_same(p)


def test_header_only_file(tmp_path):
    p = tmp_path / "ho.fa"
    p.write_bytes(b">only_header\n")
    assert_same(p)


def test_truncated_gzip_rejected(tmp_path):
    """Regression (ADVICE r1, medium): a truncated .gz must be an ERROR in
    the native parser (kErrGzip), matching the Python reader's EOFError —
    not silently-parsed partial data."""
    rng = np.random.default_rng(5)
    p = tmp_path / "g.fa.gz"
    write_fasta(p, [("g", random_seq(rng, 5000))], gz=True)
    data = p.read_bytes()
    trunc = tmp_path / "t.fa.gz"
    trunc.write_bytes(data[: len(data) - 8])  # drop gzip trailer + tail
    if N.available():
        with pytest.raises(ValueError, match="gzip"):
            list(N.read_encoded_native(str(trunc)))
    with pytest.raises(EOFError):
        list(R.read_records(str(trunc)))  # pure-Python path (the spec)


class TestStreaming:
    """Bounded-memory native streaming (mio_open/next_batch/close) must
    yield the same record stream as the whole-file parser (VERDICT r1
    item 4)."""

    def _stream_records(self, path, batch):
        out = []
        for names, codes, offs in N.stream_encoded_native(path, batch):
            for i, nm in enumerate(names):
                out.append((nm, codes[int(offs[i]):int(offs[i + 1])]))
        return out

    @pytest.mark.parametrize("gz", [False, True])
    @pytest.mark.parametrize("batch", [64, 5000])
    def test_fastq_stream_parity(self, tmp_path, gz, batch):
        rng = np.random.default_rng(3)
        reads = [("r%d" % i, random_seq(rng, int(rng.integers(30, 180))))
                 for i in range(200)]
        p = write_fastq(tmp_path / ("r.fq" + (".gz" if gz else "")),
                        reads, gz=gz)
        whole = _native_records(p)
        streamed = self._stream_records(p, batch)
        assert len(whole) == len(streamed)
        for (an, ac), (bn, bc) in zip(whole, streamed):
            assert an == bn and np.array_equal(ac, bc)

    @pytest.mark.parametrize("gz", [False, True])
    def test_fasta_stream_parity(self, tmp_path, gz):
        rng = np.random.default_rng(4)
        recs = [("g%d" % i, random_seq(rng, int(rng.integers(500, 9000))))
                for i in range(25)]
        p = write_fasta(tmp_path / ("g.fa" + (".gz" if gz else "")),
                        recs, gz=gz)
        whole = _native_records(p)
        streamed = self._stream_records(p, 2048)
        assert len(whole) == len(streamed)
        for (an, ac), (bn, bc) in zip(whole, streamed):
            assert an == bn and np.array_equal(ac, bc)

    def test_stream_truncated_gzip_raises(self, tmp_path):
        rng = np.random.default_rng(5)
        reads = [("r%d" % i, random_seq(rng, 120)) for i in range(300)]
        p = write_fastq(tmp_path / "full.fq.gz", reads, gz=True)
        data = open(p, "rb").read()
        trunc = tmp_path / "trunc.fq.gz"
        trunc.write_bytes(data[: len(data) // 2])
        with pytest.raises(ValueError, match="gzip"):
            self._stream_records(str(trunc), 1024)

    def test_stream_empty_raises(self, tmp_path):
        p = tmp_path / "empty.fa"
        p.write_bytes(b"")
        with pytest.raises(ValueError):
            self._stream_records(str(p), 1024)

    def test_screen_stream_matches_python_fallback(self, tmp_path,
                                                   monkeypatch):
        """End to end: screen over the streamed native packer must produce
        identical rows to the pure-Python whole-stream packer."""
        from miekki_tpu import engine
        from miekki_tpu.params import SketchParams
        from fixtures import write_fasta as _wf

        rng = np.random.default_rng(6)
        gpaths = [
            _wf(tmp_path / f"g{i}.fa",
                [(f"g{i}", random_seq(rng, 3000))])
            for i in range(4)
        ]
        idx = engine.build_index(gpaths, SketchParams(k=21, s=200))
        reads = [("r%d" % i, random_seq(rng, 100)) for i in range(400)]
        p = write_fastq(tmp_path / "reads.fq", reads)
        got_native = engine.screen(idx, p, flat=4096)
        monkeypatch.setattr(N, "_lib", None)
        monkeypatch.setattr(N, "_lib_checked", True)
        got_py = engine.screen(idx, p, flat=4096)
        assert got_native == got_py


def test_native_resolve_pairs_parity():
    """mio_resolve_pairs (threaded C++ two-pointer) must be bit-identical
    to pair_counts_merge AND to the device resolve path it replaces
    (resolve_pairs_host with MIEKKI_NATIVE_RESOLVE=0), including short
    (INF-padded) sketches and self-pairs."""
    import jax.numpy as jnp

    from miekki_tpu.io import native
    from miekki_tpu.ops import mxu_intersect as M
    from miekki_tpu.ops.intersect import pair_counts_merge

    if not native.has_resolve():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(3)
    s, n, p = 300, 60, 400
    pool = np.unique(rng.integers(1, 2**64 - 1, size=4 * s, dtype=np.uint64))
    tbl = np.full((n, s), np.uint64(0xFFFFFFFFFFFFFFFF))
    for i in range(n):
        m = int(rng.integers(2, s + 1))
        tbl[i, :m] = np.sort(rng.choice(pool, size=m, replace=False))
    hi = (tbl >> np.uint64(32)).astype(np.uint32)
    lo = (tbl & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    pi = rng.integers(0, n, p)
    pj = rng.integers(0, n, p)
    pi[:5] = pj[:5]  # self-pairs
    got = native.resolve_pairs_native(hi, lo, hi, lo, pi, pj, s)
    want = np.array([
        int(pair_counts_merge((jnp.asarray(hi[a]), jnp.asarray(lo[a])),
                              (jnp.asarray(hi[b]), jnp.asarray(lo[b])),
                              s)["shared_in_x"])
        for a, b in zip(pi[:64], pj[:64])])
    np.testing.assert_array_equal(got[:64], want)
    # full-path equivalence: resolve_pairs_host native vs device
    old = os.environ.get("MIEKKI_NATIVE_RESOLVE")
    try:
        os.environ["MIEKKI_NATIVE_RESOLVE"] = "0"
        dev = M.resolve_pairs_host((hi, lo), (hi, lo), pi, pj, s)
    finally:
        if old is None:
            os.environ.pop("MIEKKI_NATIVE_RESOLVE", None)
        else:
            os.environ["MIEKKI_NATIVE_RESOLVE"] = old
    np.testing.assert_array_equal(got, dev)
