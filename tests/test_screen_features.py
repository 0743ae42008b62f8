"""VERDICT r1 item 9: screening observability (prefilter survivor rate in
--metrics), minimum-copies abundance filtering for read sketching (`mash
sketch -m` analog), and winner-takes-all screening (`mash screen -w`
analog).  Reference source unavailable (SURVEY.md §0) — behavior pinned to
the Mash-family public convention [K] and an independent numpy oracle."""

import json

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.cli import main
from miekki_tpu.index.store import SketchIndex
from miekki_tpu.ops.sketch_counted import sketch_codes_device_counted
from miekki_tpu.oracle import nthash
from miekki_tpu.oracle import sketch as oracle_sketch
from miekki_tpu.params import SketchParams

from fixtures import (
    make_genome_family,
    reads_from_genome,
    write_fasta,
    write_fastq,
)


def _readset_codes(rng, n_repeat=2000, n_unique=4000, copies=3):
    """2-bit codes imitating a read set: a 'genomic' segment repeated
    `copies` times (coverage) + one-off 'error' sequence."""
    core = rng.integers(0, 4, size=n_repeat, dtype=np.uint8)
    parts = [core] * copies + [rng.integers(0, 4, size=n_unique, dtype=np.uint8)]
    return np.concatenate(parts)


class TestCountedSketch:
    @pytest.mark.parametrize("k,s,m", [(21, 64, 2), (15, 128, 3), (31, 32, 2)])
    def test_oracle_parity(self, k, s, m):
        rng = np.random.default_rng(k * 1000 + s + m)
        codes = _readset_codes(rng)
        got = sketch_codes_device_counted(codes, k, s, m)
        want = oracle_sketch.bottom_s_min_copies(
            nthash.canonical_hashes(codes, k), s, m)
        np.testing.assert_array_equal(got, want)

    def test_retry_path_exact(self):
        """A deliberately tiny starting cap forces the doubled-cap retry;
        the result must still be bitwise-exact."""
        rng = np.random.default_rng(7)
        codes = _readset_codes(rng, n_repeat=500, n_unique=8000, copies=2)
        k, s, m = 17, 48, 2
        got = sketch_codes_device_counted(codes, k, s, m, cap=64)
        want = oracle_sketch.bottom_s_min_copies(
            nthash.canonical_hashes(codes, k), s, m)
        np.testing.assert_array_equal(got, want)

    def test_min_copies_one_is_plain(self):
        rng = np.random.default_rng(11)
        codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
        k, s = 21, 64
        got = sketch_codes_device_counted(codes, k, s, 1)
        want = oracle_sketch.sketch_codes(codes, k, s)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_high_m_filters_everything(self):
        """No k-mer occurs 50 times → empty sketch."""
        rng = np.random.default_rng(13)
        codes = rng.integers(0, 4, size=3000, dtype=np.uint8)
        got = sketch_codes_device_counted(codes, 21, 64, 50)
        assert len(got) == 0

    def test_build_index_min_copies(self, tmp_path):
        rng = np.random.default_rng(21)
        genome = bytes(rng.choice(list(b"ACGT"), 4000))
        reads = reads_from_genome(rng, genome, 200, 80)
        # contaminate with error reads that appear once
        reads += [bytes(rng.choice(list(b"ACGT"), 80)) for _ in range(50)]
        fq = write_fastq(tmp_path / "r.fq", [(f"r{i}", r)
                                             for i, r in enumerate(reads)])
        params = SketchParams(k=21, s=64)
        idx = engine.build_index([fq], params, min_copies=2)
        # oracle over the pooled read k-mers
        from miekki_tpu.io import encode as _enc, reader as _reader
        codes = _enc.pack_records(_reader.read_genome_codes(fq), params.k)
        want = oracle_sketch.bottom_s_min_copies(
            nthash.canonical_hashes(codes, params.k), params.s, 2)
        np.testing.assert_array_equal(idx.sketch_u64(0), want)

    def test_cli_min_copies(self, tmp_path, capsys):
        rng = np.random.default_rng(31)
        genome = bytes(rng.choice(list(b"ACGT"), 3000))
        reads = reads_from_genome(rng, genome, 150, 70)
        fq = write_fastq(tmp_path / "r.fq", [(f"r{i}", r)
                                             for i, r in enumerate(reads)])
        out_m = str(tmp_path / "m.npz")
        out_p = str(tmp_path / "p.npz")
        assert main(["sketch", str(fq), "-o", out_m, "-k", "21", "-s", "64",
                     "-m", "2"]) == 0
        assert main(["sketch", str(fq), "-o", out_p, "-k", "21", "-s",
                     "64"]) == 0
        sk_m = SketchIndex.load(out_m).sketch_u64(0)
        sk_p = SketchIndex.load(out_p).sketch_u64(0)
        api = engine.build_index([fq], SketchParams(k=21, s=64), min_copies=2)
        np.testing.assert_array_equal(sk_m, api.sketch_u64(0))
        # with 2x+ coverage reads, the filtered sketch differs from plain
        # (singleton boundary k-mers dropped) unless every k-mer repeats
        assert sk_m.shape[0] <= sk_p.shape[0] or not np.array_equal(sk_m, sk_p)


def _wta_oracle(index: SketchIndex, hit_values: np.ndarray) -> np.ndarray:
    """Independent winner-takes-all attribution: plain containment ranking,
    each distinct hit value credited to its best-containment genome."""
    n = len(index)
    sketches = [index.sketch_u64(g) for g in range(n)]
    sizes = np.maximum(index.sizes(), 1)
    plain = np.array([np.isin(sk, hit_values).sum() for sk in sketches])
    score = plain / sizes
    hits = np.zeros(n, np.int64)
    for v in np.unique(hit_values):
        containing = [g for g in range(n) if v in sketches[g]]
        if not containing:
            continue
        best = max(containing, key=lambda g: (score[g], -g))
        hits[best] += 1
    return hits


@pytest.fixture(scope="module")
def screen_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wta")
    rng = np.random.default_rng(42)
    genomes = make_genome_family(rng, 5, 5000, sub_rate=0.03)
    paths = [write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)])
             for i, g in enumerate(genomes)]
    dbp = str(tmp / "db.npz")
    main(["sketch", *map(str, paths), "-o", dbp, "-k", "17", "-s", "128"])
    # reads drawn from genomes 0 and 2 only
    reads = (reads_from_genome(rng, genomes[0], 120, 90)
             + reads_from_genome(rng, genomes[2], 120, 90))
    fq = write_fastq(tmp / "reads.fq",
                     [(f"r{i}", r) for i, r in enumerate(reads)])
    return SketchIndex.load(dbp), dbp, fq, reads


class TestWinnerTakesAll:
    def _hit_values(self, index, reads):
        k = index.params.k
        read_hashes = set()
        for r in reads:
            codes = np.frombuffer(r, np.uint8)
            lut = np.full(256, 4, np.uint8)
            for b, c in zip(b"ACGT", range(4)):
                lut[b] = c
            h = nthash.canonical_hashes(lut[codes], k)
            read_hashes.update(h[h != nthash.UINT64_MAX].tolist())
        flat, _ = engine._flatten_db(index)
        return np.array(sorted(set(flat.tolist()) & read_hashes), np.uint64)

    def test_vs_oracle(self, screen_setup):
        index, dbp, fq, reads = screen_setup
        rows = engine.screen(index, fq, winner=True)
        got = np.array([r["hits"] for r in rows])
        want = _wta_oracle(index, self._hit_values(index, reads))
        np.testing.assert_array_equal(got, want)

    def test_conservation(self, screen_setup):
        """WTA credits each distinct hit value exactly once; plain mode may
        credit it to several genomes."""
        index, dbp, fq, reads = screen_setup
        plain = engine.screen(index, fq)
        wta = engine.screen(index, fq, winner=True)
        hv = self._hit_values(index, reads)
        assert sum(r["hits"] for r in wta) == len(hv)
        for p, w in zip(plain, wta):
            assert w["hits"] <= p["hits"]
        assert sum(r["hits"] for r in plain) >= sum(r["hits"] for r in wta)

    def test_sharded_parity(self, screen_setup):
        from miekki_tpu.parallel import local_mesh, screen_sharded
        from miekki_tpu.parallel.mesh import DATA_AXIS

        index, dbp, fq, reads = screen_setup
        single = engine.screen(index, fq, winner=True)
        stats = {}
        sharded = screen_sharded(index, fq,
                                 local_mesh(axis_names=(DATA_AXIS,)),
                                 winner=True, stats=stats)
        assert single == sharded
        assert stats["n_windows"] > 0

    def test_sharded_2d_parity(self, screen_setup):
        from miekki_tpu.parallel import screen_sharded
        from miekki_tpu.parallel.mesh import DATA_AXIS, local_mesh

        index, dbp, fq, reads = screen_setup
        single = engine.screen(index, fq, winner=True)
        mesh = local_mesh(shape=(4, 2), axis_names=(DATA_AXIS, "db"))
        sharded = screen_sharded(index, fq, mesh, db_axis="db", winner=True)
        assert single == sharded


class TestScreenStats:
    def test_stats_populated(self, screen_setup):
        index, dbp, fq, reads = screen_setup
        stats = {}
        engine.screen(index, fq, stats=stats)
        assert stats["n_windows"] > 0
        assert 0 < stats["n_survivors"] <= stats["n_windows"]
        assert stats["survivor_rate"] == pytest.approx(
            stats["n_survivors"] / stats["n_windows"])
        assert stats["n_batches"] >= 1

    def test_sharded_stats_match_single(self, screen_setup):
        from miekki_tpu.parallel import local_mesh, screen_sharded
        from miekki_tpu.parallel.mesh import DATA_AXIS

        index, dbp, fq, reads = screen_setup
        s1, s2 = {}, {}
        engine.screen(index, fq, stats=s1)
        screen_sharded(index, fq, local_mesh(axis_names=(DATA_AXIS,)),
                       stats=s2)
        # same windows and survivors regardless of sharding (padding rows
        # hash to INF and never count as valid windows)
        assert s1["n_windows"] == s2["n_windows"]
        assert s1["n_survivors"] == s2["n_survivors"]

    def test_cli_metrics_survivor_rate(self, screen_setup, tmp_path_factory):
        index, dbp, fq, reads = screen_setup
        tmp = tmp_path_factory.mktemp("met")
        mfile = tmp / "metrics.jsonl"
        out = tmp / "out.tsv"
        assert main(["screen", dbp, str(fq), "-o", str(out),
                     "--metrics", str(mfile)]) == 0
        rows = [json.loads(ln) for ln in mfile.read_text().splitlines()]
        screen_rows = [r for r in rows if r.get("phase") == "screen"]
        assert screen_rows and "survivor_rate" in screen_rows[-1]
        assert screen_rows[-1]["n_windows"] > 0

    def test_cli_winner_flag(self, screen_setup, tmp_path_factory):
        index, dbp, fq, reads = screen_setup
        tmp = tmp_path_factory.mktemp("wflag")
        out = tmp / "out.tsv"
        assert main(["screen", dbp, str(fq), "-w", "-o", str(out)]) == 0
        api = engine.screen(index, fq, winner=True)
        lines = out.read_text().splitlines()
        hits_col = lines[0].split("\t").index("hits")
        got = sorted(int(ln.split("\t")[hits_col]) for ln in lines[1:])
        assert got == sorted(r["hits"] for r in api)


class TestScreenPValues:
    """Optional p_value column (the `mash screen` p-value analog; scope
    decision in README — multiplicity is explicitly out).  Null model and
    KMV cardinality pinned by an independent numpy oracle."""

    def _read_hash_set(self, index, reads):
        k = index.params.k
        lut = np.full(256, 4, np.uint8)
        for b, c in zip(b"ACGT", range(4)):
            lut[b] = c
        hs = set()
        for r in reads:
            h = nthash.canonical_hashes(lut[np.frombuffer(r, np.uint8)], k)
            hs.update(h[h != nthash.UINT64_MAX].tolist())
        return np.array(sorted(hs), np.uint64)

    def test_vs_oracle(self, screen_setup):
        from miekki_tpu.oracle import compare as oc

        index, dbp, fq, reads = screen_setup
        rows = engine.screen(index, fq, p_values=True)
        # independent read-set cardinality: exact distinct hash set,
        # truncated to the engine's bottom-s0 KMV state
        hashes = self._read_hash_set(index, reads)
        s0 = engine._KMV_S0
        card = oc.kmv_cardinality(hashes[:s0], s0) if len(hashes) >= s0 \
            else float(len(hashes))
        want = oc.screen_p_value_vec(
            np.array([r["hits"] for r in rows]),
            np.array([r["sketch_size"] for r in rows]),
            card, index.params.k)
        got = np.array([r["p_value"] for r in rows])
        np.testing.assert_array_equal(got, want)
        # sanity: genomes the reads came from are significant, and a
        # zero-hit genome would be p=1
        assert rows[0]["p_value"] < 1e-6
        for r in rows:
            if r["hits"] == 0:
                assert r["p_value"] == 1.0

    def test_binomial_tail_identity(self):
        """I_q(h, n-h+1) == exact binomial survival P(X >= h) (small n)."""
        from math import comb

        from miekki_tpu.oracle import compare as oc

        n, q = 40, 3e-3
        for h in (1, 2, 5, 40):
            want = sum(comb(n, i) * q**i * (1 - q) ** (n - i)
                       for i in range(h, n + 1))
            got = float(oc.screen_p_value_vec(
                np.array([h]), np.array([n]), q * 4.0**17, 17)[0])
            assert got == pytest.approx(want, rel=1e-9)

    def test_sharded_parity(self, screen_setup):
        from miekki_tpu.parallel import local_mesh, screen_sharded
        from miekki_tpu.parallel.mesh import DATA_AXIS

        index, dbp, fq, reads = screen_setup
        single = engine.screen(index, fq, p_values=True)
        sharded = screen_sharded(index, fq,
                                 local_mesh(axis_names=(DATA_AXIS,)),
                                 p_values=True)
        assert single == sharded
        mesh2 = local_mesh(shape=(4, 2), axis_names=(DATA_AXIS, "db"))
        sharded2d = screen_sharded(index, fq, mesh2, db_axis="db",
                                   p_values=True)
        assert single == sharded2d

    def test_slabbed_parity(self, screen_setup, monkeypatch):
        index, dbp, fq, reads = screen_setup
        ref = engine.screen(index, fq, p_values=True)
        monkeypatch.setenv("MIEKKI_SCREEN_DB_VALS", "200")
        got = engine.screen(index, fq, p_values=True)
        assert got == ref

    def test_cli_flag(self, screen_setup, tmp_path_factory):
        index, dbp, fq, reads = screen_setup
        tmp = tmp_path_factory.mktemp("pflag")
        out = tmp / "out.tsv"
        assert main(["screen", dbp, str(fq), "-p", "-o", str(out)]) == 0
        lines = out.read_text().splitlines()
        assert "p_value" in lines[0].split("\t")
        api = engine.screen(index, fq, p_values=True)
        pcol = lines[0].lstrip("#").split("\t").index("p_value")
        got = sorted(float(ln.split("\t")[pcol]) for ln in lines[1:])
        assert got == sorted(r["p_value"] for r in api)


def test_screen_slabbed_bitwise_parity(tmp_path, monkeypatch):
    """Genome-slab streaming (DB beyond the device budget) must produce
    rows bit-identical to the one-pass screen, in BOTH plain and
    winner-takes-all modes, including hash values shared across slabs."""
    import numpy as np

    from miekki_tpu import engine
    from miekki_tpu.params import SketchParams

    from fixtures import make_genome_family, write_fasta, write_fastq

    rng = np.random.default_rng(31)
    genomes = make_genome_family(rng, 7, 5000, sub_rate=0.03)  # shared hashes
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(genomes)]
    idx = engine.build_index(paths, SketchParams(k=21, s=200))
    reads = [(f"r{i}", genomes[i % 3][j:j + 120])
             for i, j in enumerate(rng.integers(0, 4000, 60))]
    fq = str(write_fastq(tmp_path / "reads.fq", reads))

    for winner in (False, True):
        stats_ref: dict = {}
        ref = engine.screen(idx, fq, winner=winner, stats=stats_ref)
        monkeypatch.setenv("MIEKKI_SCREEN_DB_VALS", "500")  # forces ~3 slabs
        stats_slab: dict = {}
        got = engine.screen(idx, fq, winner=winner, stats=stats_slab)
        monkeypatch.delenv("MIEKKI_SCREEN_DB_VALS")
        assert got == ref, winner
        assert stats_slab.get("n_slabs", 0) >= 2


def test_screen_hotpath_helper_parity():
    """The r5 screen host-cost fixes must be drop-in order/value identical:
    _stable_argsort_u64 == np stable argsort (incl. ties and >=2^63
    values), _first_occ_idx == the self-searchsorted it replaced, and the
    packed-bit bitmap pull round-trips exactly (measured costs they
    replace at config-5 scale: 463 s / 71 s / 34.6 s — docs/DESIGN.md r5)."""
    import jax.numpy as jnp
    import numpy as np

    from miekki_tpu import engine

    r = np.random.default_rng(5)
    v = r.integers(0, 1 << 64, size=200_000, dtype=np.uint64)
    v[::7] = v[0]  # equal-value runs spanning the sign bit
    v[1::11] = np.uint64(1 << 63)
    big = np.concatenate([v] * 6)  # > the 1<<20 torch-path threshold
    assert np.array_equal(engine._stable_argsort_u64(big),
                          np.argsort(big, kind="stable"))
    sv = np.sort(v)
    assert np.array_equal(engine._first_occ_idx(sv),
                          np.searchsorted(sv, sv, side="left"))
    acc = r.random(12_345) < 0.3
    assert np.array_equal(engine._pull_bitmap(jnp.asarray(acc)), acc)
    assert np.array_equal(engine._first_occ_idx(np.zeros(0, np.uint64)),
                          np.zeros(0, np.int64))
