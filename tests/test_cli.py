"""CLI tests (component C10) — golden TSV vs oracle."""

import json

import numpy as np
import pytest

from miekki_tpu import cli, engine
from miekki_tpu.io import encode
from miekki_tpu.oracle import compare as oracle_compare
from miekki_tpu.oracle import sketch as oracle_sketch

from fixtures import make_genome_family, reads_from_genome, write_fasta, write_fastq


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(55)
    genomes = make_genome_family(rng, 4, 15_000, sub_rate=0.04)
    paths = [str(write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)])) for i, g in enumerate(genomes)]
    reads = reads_from_genome(rng, genomes[1], 100, 100)
    reads_path = str(write_fastq(tmp / "reads.fq.gz", [(f"r{i}", r) for i, r in enumerate(reads)], gz=True))
    return tmp, genomes, paths, reads_path


def test_sketch_dist_screen_info(setup, capsys):
    tmp, genomes, paths, reads_path = setup
    db = str(tmp / "db.npz")
    k, s = 21, 400

    assert cli.main(["sketch", *paths, "-o", db, "-k", str(k), "-s", str(s)]) == 0

    out_tsv = str(tmp / "dist.tsv")
    metrics = str(tmp / "metrics.jsonl")
    assert cli.main(["dist", db, "-o", out_tsv, "--tile", "3", "--metrics", metrics]) == 0
    lines = open(out_tsv).read().splitlines()
    assert lines[0].startswith("#query\treference")
    assert len(lines) == 1 + 6  # 4 choose 2

    # golden parity: TSV values equal oracle-computed values
    oracle_sks = [oracle_sketch.sketch_codes(encode.encode(g), k, s) for g in genomes]
    want_rows = oracle_compare.all_vs_all(oracle_sks, k, s)
    want_tsv = engine.rows_to_tsv(
        [
            {
                "query": f"{paths[r['i']]}",
                "reference": f"{paths[r['j']]}",
                "shared": r["shared"],
                "union": r["union"],
                "jaccard": r["jaccard"],
                "mash_distance": r["distance"],
                "ani": r["ani"],
                "p_value": r["p_value"],
            }
            for r in want_rows
        ]
    )
    assert open(out_tsv).read() == want_tsv

    # metrics were emitted
    rows = [json.loads(l) for l in open(metrics)]
    assert rows[0]["phase"] == "dist" and rows[0]["pairs"] == 6

    screen_tsv = str(tmp / "screen.tsv")
    assert cli.main(["screen", db, reads_path, "-o", screen_tsv, "--flat", "4096"]) == 0
    slines = open(screen_tsv).read().splitlines()
    assert len(slines) == 1 + 4
    # genome 1 sourced the reads → top containment
    best = max(slines[1:], key=lambda l: float(l.split("\t")[3]))
    assert best.split("\t")[0].endswith("g1.fa")

    assert cli.main(["info", db]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["genomes"] == 4 and info["params"]["k"] == k


def test_dist_from_fasta_directly(setup):
    tmp, genomes, paths, _ = setup
    out_tsv = str(tmp / "direct.tsv")
    assert cli.main(["dist", *paths[:2], "-o", out_tsv, "-k", "21", "-s", "300"]) == 0
    lines = open(out_tsv).read().splitlines()
    assert len(lines) == 2


def test_sketch_output_path_honored_exactly(setup, capsys):
    """Regression (r3): `sketch -o db.msk` must write db.msk itself (not a
    silently-appended db.msk.npz) and dist/triangle/screen/info must load
    it by content sniffing, not extension."""
    tmp, genomes, paths, _ = setup
    db = str(tmp / "db.msk")
    assert cli.main(["sketch", *paths[:2], "-o", db, "-k", "21", "-s", "300"]) == 0
    import os

    assert os.path.exists(db) and not os.path.exists(db + ".npz")
    assert cli.main(["dist", db]) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 1 + 1  # header + (2 choose 2) upper pair
    assert cli.main(["info", db]) == 0
    assert json.loads(capsys.readouterr().out)["genomes"] == 2


def test_dist_rejects_mixed_index_and_fasta(setup):
    tmp, genomes, paths, _ = setup
    db = str(tmp / "mix.msk")
    assert cli.main(["sketch", *paths[:2], "-o", db, "-k", "21", "-s", "300"]) == 0
    with pytest.raises(SystemExit, match="mix"):
        cli.main(["dist", db, paths[0]])


def test_cli_dist_distributed_matches_plain(tmp_path):
    """--distributed (8 fake devices) must give the identical TSV."""
    import numpy as np
    from fixtures import make_genome_family, write_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(23)
    genomes = make_genome_family(rng, 5, 3000, sub_rate=0.04)
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(genomes)]
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "200"])
    plain, dist_out = tmp_path / "a.tsv", tmp_path / "b.tsv"
    main(["dist", db, "-o", str(plain)])
    main(["dist", db, "-o", str(dist_out), "--distributed"])
    assert plain.read_text() == dist_out.read_text()


def test_cli_screen_distributed_matches_plain(tmp_path):
    import numpy as np
    from fixtures import make_genome_family, reads_from_genome, write_fasta, write_fastq
    from miekki_tpu.cli import main

    rng = np.random.default_rng(29)
    genomes = make_genome_family(rng, 3, 3000, sub_rate=0.04)
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(genomes)]
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "200"])
    reads = reads_from_genome(rng, genomes[0], 100, 80)
    rp = str(write_fastq(tmp_path / "r.fq", [(f"r{i}", s) for i, s in enumerate(reads)]))
    a, b = tmp_path / "a.tsv", tmp_path / "b.tsv"
    main(["screen", db, rp, "-o", str(a)])
    main(["screen", db, rp, "-o", str(b), "--distributed"])
    assert a.read_text() == b.read_text()


def test_cli_sharded_sketch_and_dist(tmp_path):
    import glob
    import numpy as np
    from fixtures import make_genome_family, write_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(31)
    genomes = make_genome_family(rng, 6, 2000, sub_rate=0.03)
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(genomes)]
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "100", "--shards", "3"])
    shards = sorted(glob.glob(str(tmp_path / "db.shard*.npz")))
    assert len(shards) == 3
    a, b = tmp_path / "a.tsv", tmp_path / "b.tsv"
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "100"])
    main(["dist", db, "-o", str(a)])
    main(["dist", *shards, "-o", str(b)])
    assert a.read_text() == b.read_text()


def test_cli_merge_and_cardinality(tmp_path, capsys):
    import json
    import numpy as np
    from fixtures import random_genome_fasta
    from miekki_tpu.cli import main
    from miekki_tpu.index.store import SketchIndex

    rng = np.random.default_rng(43)
    p1 = str(random_genome_fasta(tmp_path / "a.fa", rng, length=5000))
    p2 = str(random_genome_fasta(tmp_path / "b.fa", rng, length=4000))
    d1, d2 = str(tmp_path / "1.npz"), str(tmp_path / "2.npz")
    main(["sketch", p1, "-o", d1, "-k", "21", "-s", "300"])
    main(["sketch", p2, "-o", d2, "-k", "21", "-s", "300"])
    out = str(tmp_path / "m.npz")
    main(["merge", d1, d2, "-o", out])
    idx = SketchIndex.load(out)
    assert len(idx) == 2

    # KMV cardinality: ~5000/4000 distinct 21-mers within ~25% at s=300
    card = idx.cardinalities()
    assert abs(card[0] - 4980) / 4980 < 0.25
    assert abs(card[1] - 3980) / 3980 < 0.25

    main(["info", out])
    info = json.loads(capsys.readouterr().out)
    assert info["genomes"] == 2
    assert info["est_distinct_kmers"]["max"] > 3000


def test_cli_screen_multiple_read_files_and_ref_dist(tmp_path):
    import numpy as np
    from fixtures import make_genome_family, reads_from_genome, write_fasta, write_fastq
    from miekki_tpu.cli import main
    from miekki_tpu import engine
    from miekki_tpu.index.store import SketchIndex

    rng = np.random.default_rng(53)
    genomes = make_genome_family(rng, 4, 3000, sub_rate=0.04)
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(genomes)]
    db_a = str(tmp_path / "a.npz")
    db_b = str(tmp_path / "b.npz")
    main(["sketch", paths[0], paths[1], "-o", db_a, "-k", "21", "-s", "200"])
    main(["sketch", paths[2], paths[3], "-o", db_b, "-k", "21", "-s", "200"])

    # dist --ref (rectangular)
    out = tmp_path / "rect.tsv"
    main(["dist", db_a, "--ref", db_b, "-o", str(out)])
    lines = out.read_text().splitlines()
    assert len(lines) == 1 + 2 * 2  # 2x2 pairs

    # screen over two read files == screen over their union
    r1 = reads_from_genome(rng, genomes[0], 60, 80)
    r2 = reads_from_genome(rng, genomes[1], 60, 80)
    p1 = str(write_fastq(tmp_path / "r1.fq", [(f"a{i}", s) for i, s in enumerate(r1)]))
    p2 = str(write_fastq(tmp_path / "r2.fq", [(f"b{i}", s) for i, s in enumerate(r2)]))
    both = str(write_fastq(tmp_path / "r12.fq",
                           [(f"c{i}", s) for i, s in enumerate(r1 + r2)]))
    o1, o2 = tmp_path / "s1.tsv", tmp_path / "s2.tsv"
    main(["screen", db_a, p1, p2, "-o", str(o1)])
    main(["screen", db_a, both, "-o", str(o2)])
    assert o1.read_text() == o2.read_text()


def test_cli_per_record_and_matrix(tmp_path):
    import numpy as np
    from fixtures import random_seq, write_fasta
    from miekki_tpu.cli import main
    from miekki_tpu.index.store import SketchIndex

    rng = np.random.default_rng(71)
    recs = [(f"contig{i}", random_seq(rng, 2500)) for i in range(4)]
    p = str(write_fasta(tmp_path / "multi.fa", recs))
    db = str(tmp_path / "per.npz")
    main(["sketch", p, "-o", db, "-k", "21", "-s", "120", "--per-record"])
    idx = SketchIndex.load(db)
    assert len(idx) == 4
    assert idx.names == [f"contig{i}" for i in range(4)]

    out = tmp_path / "m.tsv"
    main(["dist", db, "-o", str(out), "--matrix"])
    lines = out.read_text().splitlines()
    assert lines[0].strip() == "4"
    assert len(lines) == 5
    # diagonal zeros; symmetric text
    row1 = lines[1].split("\t")
    assert row1[0] == "contig0" and float(row1[1]) == 0.0


def test_cli_triangle_matches_square_matrix(tmp_path):
    import numpy as np
    from fixtures import random_seq, write_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(77)
    recs = [(f"c{i}", random_seq(rng, 2500)) for i in range(5)]
    p = str(write_fasta(tmp_path / "multi.fa", recs))
    db = str(tmp_path / "tri.npz")
    main(["sketch", p, "-o", db, "-k", "21", "-s", "120", "--per-record"])

    sq, tri = tmp_path / "sq.tsv", tmp_path / "tri.phylip"
    assert main(["dist", db, "-o", str(sq), "--matrix"]) == 0
    assert main(["triangle", db, "-o", str(tri)]) == 0

    sq_lines = sq.read_text().splitlines()
    tri_lines = tri.read_text().splitlines()
    assert tri_lines[0].strip() == "5"
    assert len(tri_lines) == 6
    # row i: name + i distances, textually identical to the square matrix's
    # lower triangle (same unique-value formatting path)
    for i in range(5):
        t_cells = tri_lines[1 + i].split("\t")
        s_cells = sq_lines[1 + i].split("\t")
        assert t_cells[0] == f"c{i}"
        assert len(t_cells) == 1 + i
        assert t_cells[1:] == s_cells[1 : 1 + i]


def test_per_record_matches_separate_files(tmp_path):
    import numpy as np
    from fixtures import random_seq, write_fasta
    from miekki_tpu import engine
    from miekki_tpu.params import SketchParams

    rng = np.random.default_rng(73)
    seqs = [random_seq(rng, 1800) for _ in range(3)]
    multi = write_fasta(tmp_path / "m.fa", [(f"c{i}", s) for i, s in enumerate(seqs)])
    singles = [write_fasta(tmp_path / f"s{i}.fa", [(f"c{i}", s)])
               for i, s in enumerate(seqs)]
    params = SketchParams(k=21, s=100)
    a = engine.build_index_per_record([multi], params)
    b = engine.build_index(singles, params, names=[f"c{i}" for i in range(3)])
    assert a.names == b.names
    assert np.array_equal(a.hi, b.hi) and np.array_equal(a.lo, b.lo)


def test_cli_distributed_counts_output(tmp_path):
    import numpy as np
    from fixtures import make_genome_family, write_fasta
    from miekki_tpu.cli import main
    from miekki_tpu import engine
    from miekki_tpu.index.store import SketchIndex

    rng = np.random.default_rng(83)
    genomes = make_genome_family(rng, 4, 2500, sub_rate=0.04)
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(genomes)]
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "150"])
    cf = str(tmp_path / "counts.npz")
    main(["dist", db, "--distributed", "--counts", cf])
    with np.load(cf) as z:
        idx = SketchIndex.load(db)
        rows = engine.dist(idx)
        for r in rows:
            assert int(z["shared"][r["i"], r["j"]]) == r["shared"]
            assert int(z["union"][r["i"], r["j"]]) == r["union"]
        assert list(z["query_names"]) == idx.names


def test_cli_dist_filters(tmp_path):
    import numpy as np
    from fixtures import make_genome_family, random_genome_fasta, write_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(91)
    fam = make_genome_family(rng, 3, 3000, sub_rate=0.02)  # related
    paths = [str(write_fasta(tmp_path / f"f{i}.fa", [(f"f{i}", g)]))
             for i, g in enumerate(fam)]
    paths.append(str(random_genome_fasta(tmp_path / "unrel.fa", rng, length=3000)))
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "300"])
    full, filt = tmp_path / "a.tsv", tmp_path / "b.tsv"
    main(["dist", db, "-o", str(full)])
    main(["dist", db, "-o", str(filt), "--max-dist", "0.1"])
    n_full = len(full.read_text().splitlines()) - 1
    n_filt = len(filt.read_text().splitlines()) - 1
    assert n_full == 6
    assert 0 < n_filt < n_full  # unrelated genome's pairs filtered out
    pfilt = tmp_path / "c.tsv"
    main(["dist", db, "-o", str(pfilt), "--max-p", "1e-10"])
    assert 0 < len(pfilt.read_text().splitlines()) - 1 <= n_full


def test_cli_dist_bounds(tmp_path):
    import numpy as np
    from fixtures import make_genome_family, write_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(97)
    fam = make_genome_family(rng, 3, 2500, sub_rate=0.03)
    paths = [str(write_fasta(tmp_path / f"f{i}.fa", [(f"f{i}", g)]))
             for i, g in enumerate(fam)]
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "300"])
    out = tmp_path / "b.tsv"
    main(["dist", db, "-o", str(out), "--bounds"])
    header = out.read_text().splitlines()[0]
    assert header.endswith("jaccard_lo\tjaccard_hi\tdist_lo\tdist_hi")
    row = out.read_text().splitlines()[1].split("\t")
    cols = header.lstrip("#").split("\t")
    rec = dict(zip(cols, row))
    assert float(rec["jaccard_lo"]) <= float(rec["jaccard"]) <= float(rec["jaccard_hi"])
    assert float(rec["dist_lo"]) <= float(rec["mash_distance"]) <= float(rec["dist_hi"])


def test_cli_info_dump_roundtrip(tmp_path, capsys):
    import json
    import numpy as np
    from fixtures import random_genome_fasta
    from miekki_tpu.cli import main
    from miekki_tpu.io import encode
    from miekki_tpu.oracle import sketch as OS

    rng = np.random.default_rng(101)
    p = tmp_path / "g.fa"
    random_genome_fasta(p, rng, length=3000)
    db = str(tmp_path / "db.npz")
    main(["sketch", str(p), "-o", db, "-k", "21", "-s", "100"])
    capsys.readouterr()
    main(["info", db, "--dump"])
    d = json.loads(capsys.readouterr().out)
    assert d["params"]["k"] == 21
    hashes = d["sketches"][0]["hashes"]
    assert hashes == sorted(hashes) and len(hashes) == 100
    # dump values are the oracle bottom-s exactly
    from miekki_tpu.io.reader import read_genome_codes
    from miekki_tpu.io.encode import pack_records
    codes = pack_records(read_genome_codes(p), 21)
    want = OS.sketch_codes(codes, 21, 100)
    assert hashes == [int(x) for x in want]


def test_cli_version(capsys):
    import pytest
    from miekki_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert "miekki-tpu" in capsys.readouterr().out


@pytest.mark.parametrize("seed", [1, 2])
def test_cli_random_params_end_to_end(tmp_path, seed):
    """Randomized k/s through the full CLI flow with oracle parity."""
    import numpy as np
    from fixtures import make_genome_family, write_fasta
    from miekki_tpu.cli import main
    from miekki_tpu.io import encode
    from miekki_tpu.oracle import compare as OC, sketch as OS

    rng = np.random.default_rng(1000 + seed)
    k = int(rng.integers(11, 40))
    s = int(rng.integers(50, 400))
    fam = make_genome_family(rng, 3, int(rng.integers(2000, 6000)),
                             sub_rate=0.04)
    paths = [str(write_fasta(tmp_path / f"g{i}.fa", [(f"g{i}", g)]))
             for i, g in enumerate(fam)]
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", str(k), "-s", str(s)])
    out = tmp_path / "d.tsv"
    main(["dist", db, "-o", str(out)])
    lines = out.read_text().splitlines()
    header = lines[0].lstrip("#").split("\t")
    sks = [OS.sketch_codes(encode.encode(g), k, s) for g in fam]
    for line in lines[1:]:
        rec = dict(zip(header, line.split("\t")))
        qi = int(rec["query"].split("g")[-1].split(".")[0])
        ri = int(rec["reference"].split("g")[-1].split(".")[0])
        want = OC.compare_sketches(sks[qi], sks[ri], k, s)
        assert int(rec["shared"]) == want["shared"], (k, s)
        assert float(rec["jaccard"]) == round(want["jaccard"], 10) or \
               abs(float(rec["jaccard"]) - want["jaccard"]) < 1e-9


def test_list_file_inputs(tmp_path):
    """mash -l analog: --list reads genome paths from text files (argv
    limits make direct listing impossible at 100k-genome scale)."""
    import numpy as np

    from fixtures import random_genome_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(3)
    paths = [str(random_genome_fasta(tmp_path / f"g{i}.fa", rng,
                                     n_records=1, length=3000))
             for i in range(4)]
    lst = tmp_path / "genomes.txt"
    lst.write_text("# comment\n" + "\n".join(paths[:3]) + "\n\n" + paths[3] + "\n")
    db_l = str(tmp_path / "dbl.npz")
    db_d = str(tmp_path / "dbd.npz")
    assert main(["sketch", "-l", str(lst), "-o", db_l, "-k", "21", "-s", "64"]) == 0
    assert main(["sketch", *paths, "-o", db_d, "-k", "21", "-s", "64"]) == 0
    from miekki_tpu.index.store import SketchIndex
    a, b = SketchIndex.load(db_l), SketchIndex.load(db_d)
    assert np.array_equal(a.hi, b.hi) and np.array_equal(a.lo, b.lo)
    # dist --list over the same list file
    out = str(tmp_path / "o.tsv")
    assert main(["dist", "-l", str(lst), "-o", out, "-k", "21", "-s", "64"]) == 0
    assert len(open(out).read().splitlines()) == 7  # header + C(4,2)


def test_dist_counts_single_device(setup, tmp_path):
    """dist --counts without --distributed (r4): raw count matrices via
    the pipelined bulk path, values matching the TSV rows."""
    tmp, genomes, paths, _ = setup
    db = str(tmp / "db_counts.npz")
    assert cli.main(["sketch", "-k", "21", "-s", "128", "-o", db] + paths) == 0
    out_npz = str(tmp_path / "counts.npz")
    assert cli.main(["dist", "--counts", out_npz, db]) == 0
    z = np.load(out_npz)
    assert z["shared"].shape == (4, 4)
    tsv = str(tmp_path / "d.tsv")
    assert cli.main(["dist", "-o", tsv, db]) == 0
    names = [str(x) for x in z["query_names"]]
    for line in open(tsv).read().splitlines()[1:]:
        q, r, shared, union = line.split("\t")[:4]
        i, j = names.index(q), names.index(r)
        assert int(z["shared"][i, j]) == int(shared)
        assert int(z["union"][i, j]) == int(union)
