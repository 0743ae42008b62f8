"""Checkpoint/resume of the comparison phase (SURVEY.md §5 "Failure
detection": manifest-based tile resume must reproduce the bitwise-identical
distance table after an interruption)."""

import json

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.params import SketchParams

from fixtures import random_genome_fasta


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("resume")
    rng = np.random.default_rng(5)
    paths = [
        random_genome_fasta(tmp / f"g{i}.fa", rng, length=600) for i in range(9)
    ]
    return engine.build_index(paths, SketchParams(k=21, s=64))


def test_resumable_full_run_matches_dist(idx, tmp_path):
    out, mani = tmp_path / "d.tsv", tmp_path / "d.manifest"
    n = engine.dist_resumable(idx, out, mani, tile=4)
    rows = engine.dist(idx, tile=4)
    assert n == len(rows)
    got = out.read_text()
    want = engine.rows_to_tsv(
        sorted(rows, key=lambda r: (r["i"] // 4, r["j"] // 4, r["i"], r["j"]))
    )
    # same row multiset (tile order vs (i,j) order)
    assert sorted(got.splitlines()[1:]) == sorted(want.splitlines()[1:])


def test_resume_after_interruption(idx, tmp_path):
    out, mani = tmp_path / "d.tsv", tmp_path / "d.manifest"

    class Stop(Exception):
        pass

    # interrupt after 2 completed tiles (simulates a host dying mid-job)
    tiles_done = []
    try:
        with open(out, "w") as f, open(mani, "w") as mf:
            f.write("#" + "\t".join(engine.TSV_COLUMNS) + "\n")
            pending = []

            def cb(t):
                for r in pending:
                    cells = [f"{r[c]:.10g}" if isinstance(r[c], float)
                             else str(r[c]) for c in engine.TSV_COLUMNS]
                    f.write("\t".join(cells) + "\n")
                pending.clear()
                mf.write(json.dumps({"bi": t[0], "bj": t[1]}) + "\n")
                mf.flush(); f.flush()
                tiles_done.append(t)
                if len(tiles_done) == 2:
                    raise Stop()

            for row in engine.dist_iter(idx, tile=4, on_tile_done=cb):
                pending.append(row)
    except Stop:
        pass
    assert len(tiles_done) == 2

    # resume: must complete the remaining tiles only
    engine.dist_resumable(idx, out, mani, tile=4)
    manifest = [tuple(json.loads(l).values()) for l in mani.read_text().splitlines()]
    assert len(manifest) == len(set(manifest))  # no tile recomputed

    rows = engine.dist(idx, tile=4)
    got_lines = sorted(out.read_text().splitlines()[1:])
    want_lines = sorted(engine.rows_to_tsv(rows).splitlines()[1:])
    assert got_lines == want_lines  # bitwise-identical final table


def test_resume_noop_when_complete(idx, tmp_path):
    out, mani = tmp_path / "d.tsv", tmp_path / "d.manifest"
    engine.dist_resumable(idx, out, mani, tile=4)
    before = out.read_text()
    n = engine.dist_resumable(idx, out, mani, tile=4)  # all tiles recorded
    assert n == 0
    assert out.read_text() == before


def test_cli_manifest_resume(tmp_path):
    """dist --manifest via the CLI: full run then a no-op resume."""
    import numpy as np
    from fixtures import random_genome_fasta
    from miekki_tpu.cli import main

    rng = np.random.default_rng(61)
    paths = [str(random_genome_fasta(tmp_path / f"g{i}.fa", rng, length=900))
             for i in range(5)]
    db = str(tmp_path / "db.npz")
    main(["sketch", *paths, "-o", db, "-k", "21", "-s", "100"])
    out, mani = str(tmp_path / "d.tsv"), str(tmp_path / "d.manifest")
    main(["dist", db, "-o", out, "--manifest", mani, "--tile", "2"])
    first = open(out).read()
    assert len(first.splitlines()) == 1 + 10  # 5 choose 2
    main(["dist", db, "-o", out, "--manifest", mani, "--tile", "2"])  # no-op
    assert open(out).read() == first
    # plain run row multiset identical
    plain = str(tmp_path / "p.tsv")
    main(["dist", db, "-o", plain])
    assert sorted(open(plain).read().splitlines()[1:]) == sorted(first.splitlines()[1:])


def test_resumable_rectangular(idx, tmp_path):
    """dist_resumable with a reference index (rectangular comparison)."""
    from miekki_tpu.index.store import SketchIndex

    a = SketchIndex(idx.params, idx.names[:4], idx.hi[:4], idx.lo[:4])
    b = SketchIndex(idx.params, idx.names[4:], idx.hi[4:], idx.lo[4:])
    out, mani = tmp_path / "r.tsv", tmp_path / "r.manifest"
    n = engine.dist_resumable(a, out, mani, index_b=b, tile=3)
    rows = engine.dist(a, b)
    assert n == len(rows) == 4 * 5
    got = sorted(out.read_text().splitlines()[1:])
    want = sorted(engine.rows_to_tsv(rows).splitlines()[1:])
    assert got == want
