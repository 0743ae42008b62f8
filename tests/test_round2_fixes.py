"""Round-2 regression tests for the ADVICE r1 findings: CLI flags honored on
every dist code path, O(1) p-value parity with the exact binomial tail, and
call-time (not trace-time) env strategy resolution."""

import math

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.cli import main
from miekki_tpu.oracle import compare as oracle_compare
from miekki_tpu.params import SketchParams

from fixtures import make_genome_family, write_fasta


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("r2db")
    rng = np.random.default_rng(123)
    genomes = make_genome_family(rng, 6, 6000, sub_rate=0.05)
    paths = [
        write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)])
        for i, g in enumerate(genomes)
    ]
    dbp = str(tmp / "db.npz")
    main(["sketch", *map(str, paths), "-o", dbp, "-k", "21", "-s", "256"])
    return dbp


def _read_tsv(path):
    lines = open(path).read().strip().split("\n")
    cols = lines[0].lstrip("#").split("\t")
    return cols, [dict(zip(cols, ln.split("\t"))) for ln in lines[1:]]


def test_distributed_honors_containment_and_filters(db, tmp_path):
    """--distributed must honor --containment/--max-dist/--max-p exactly as
    the plain path does (ADVICE r1: flags were silently dropped)."""
    plain, dist = str(tmp_path / "p.tsv"), str(tmp_path / "d.tsv")
    flags = ["--containment", "--max-dist", "0.5", "--max-p", "0.9"]
    main(["dist", db, "-o", plain, *flags])
    main(["dist", db, "-o", dist, "--distributed", *flags])
    cp, rp = _read_tsv(plain)
    cd, rd = _read_tsv(dist)
    assert cp == cd and "containment_q" in cp
    assert rp == rd


def test_manifest_honors_bounds_and_filters(db, tmp_path):
    """--manifest path must honor --bounds/--containment/--max-dist."""
    plain, man = str(tmp_path / "p.tsv"), str(tmp_path / "m.tsv")
    flags = ["--bounds", "--containment", "--max-dist", "0.6"]
    main(["dist", db, "-o", plain, *flags])
    main(["dist", db, "-o", man, "--manifest", str(tmp_path / "m.jsonl"),
          *flags])
    assert _read_tsv(plain) == _read_tsv(man)


def test_matrix_rejects_row_flags(db, tmp_path, capsys):
    assert main(["dist", db, "--matrix", "--bounds",
                 "-o", str(tmp_path / "x.tsv")]) == 2


def test_distributed_counts_include_inter(db, tmp_path):
    cf = str(tmp_path / "c.npz")
    main(["dist", db, "--distributed", "--counts", cf])
    with np.load(cf) as z:
        assert "inter" in z
        assert np.array_equal(np.diag(z["inter"]), np.diag(z["shared"]))


def test_p_value_matches_exact_binomial_tail():
    """The betainc p-value must match the exact log-space binomial summation
    to ~1e-10 relative (the formulation ADVICE r1 asked to replace)."""
    rng = np.random.default_rng(7)
    for _ in range(50):
        union = int(rng.integers(1, 5000))
        shared = int(rng.integers(1, union + 1))
        n1 = 10.0 ** rng.uniform(2, 8)
        n2 = 10.0 ** rng.uniform(2, 8)
        k = int(rng.choice([5, 9, 12, 21, 31]))
        space = 4.0 ** min(k, 200)
        m = (n1 * n2) / space
        q = min(max(m / (n1 + n2 - m), 0.0), 1.0)
        if q <= 0.0 or q >= 1.0:
            continue
        # exact UPPER-tail summation (no 1-CDF cancellation, unlike the
        # r1 implementation, which returned ~1e-12 noise in deep tails)
        log_q, log_1q = math.log(q), math.log1p(-q)
        total = 0.0
        log_c = math.lgamma(union + 1) - math.lgamma(shared + 1) \
            - math.lgamma(union - shared + 1)
        for i in range(shared, union + 1):
            total += math.exp(log_c + i * log_q + (union - i) * log_1q)
            if i < union:
                log_c += math.log(union - i) - math.log(i + 1)
        want = min(max(total, 0.0), 1.0)
        got = oracle_compare.chance_p_value(shared, union, n1, n2, k)
        assert got == pytest.approx(want, rel=1e-9, abs=1e-300)


def test_merge_strategy_env_switch_takes_effect(monkeypatch):
    """MIEKKI_MERGE changes after a first call must take effect (the jit
    cache is keyed on the resolved strategy now — ADVICE r1)."""
    import jax.numpy as jnp

    from miekki_tpu.ops import sketch as S

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=40_000).astype(np.uint8)
    k, s = 21, 64
    monkeypatch.setenv("MIEKKI_MERGE", "sort")
    a = S.sketch_codes_device(codes, k, s)
    monkeypatch.setenv("MIEKKI_MERGE", "tree")
    b = S.sketch_codes_device(codes, k, s)
    monkeypatch.setenv("MIEKKI_MERGE", "threshold")
    c = S.sketch_codes_device(codes, k, s)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
    # distinct strategies produce distinct compiled entries (cache keyed)
    assert S._sketch_chunked._cache_size() >= 2


def test_rows_from_count_matrices_containment_parity(db):
    """Distributed rows with inter= must equal dist_iter's containment."""
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.parallel import dist_sharded, local_mesh

    idx = SketchIndex.load(db)
    counts = dist_sharded(idx, local_mesh())
    rows_d = engine.rows_from_count_matrices(
        idx, counts["shared"], counts["union"], inter=counts["inter"])
    rows_p = engine.dist(idx)
    assert len(rows_d) == len(rows_p)
    for rd, rp in zip(rows_d, rows_p):
        for key in ("shared", "union", "containment_q", "containment_r",
                    "ani_containment", "p_value"):
            assert rd[key] == rp[key], key


# ---- round-2 self-review regression tests (session 2) --------------------


def test_ring_with_mxu_env_is_traceable(db, monkeypatch):
    """MIEKKI_INTERSECT=mxu must not crash the traced ring: the host-
    synchronizing mxu impl is mapped to the backend default inside
    jit/scan/shard_map (it used to raise TracerBoolConversionError), and
    results stay identical to the default impl."""
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.parallel import dist_sharded, local_mesh
    from miekki_tpu.parallel.mesh import DB_AXIS

    idx = SketchIndex.load(db)
    mesh = local_mesh(axis_names=(DB_AXIS,))
    monkeypatch.delenv("MIEKKI_INTERSECT", raising=False)
    ref = dist_sharded(idx, mesh)
    monkeypatch.setenv("MIEKKI_INTERSECT", "mxu")
    got = dist_sharded(idx, mesh)
    for key in ("shared", "union", "inter"):
        assert np.array_equal(ref[key], got[key])


def test_jitted_tile_path_rejects_mxu_impl():
    """_tile_counts must reject the host-orchestrated mxu impl explicitly
    instead of silently falling through to the searchsorted path."""
    from miekki_tpu.ops import intersect, u64

    rows = u64.inf_like((4, 16))
    with pytest.raises(ValueError, match="mxu"):
        intersect._tile_counts(rows, rows, 8, "mxu")


def test_prefetch_releases_thread_on_abandoned_iteration():
    """Abandoning a _prefetch iterator mid-stream must not leak a producer
    thread blocked on the bounded queue (nor keep the source generator
    open)."""
    import threading
    import time

    closed = {"flag": False}

    def source():
        try:
            i = 0
            while True:
                yield np.zeros(4, np.uint8) + i
                i += 1
        finally:
            closed["flag"] = True

    before = threading.active_count()
    it = engine._prefetch(source(), depth=2)
    assert next(it) is not None
    it.close()  # consumer abandons
    deadline = time.time() + 10.0
    while time.time() < deadline:
        if threading.active_count() <= before and closed["flag"]:
            break
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert closed["flag"], "source generator not closed"


def test_prefetch_propagates_exception():
    def source():
        yield np.ones(2)
        raise RuntimeError("boom")

    it = engine._prefetch(source(), depth=2)
    assert next(it) is not None
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_format_write_chunking_byte_identical(db):
    """_format_write in tiny chunks must emit byte-identical TSV text to a
    single format call (the chunking bounds peak RSS at pod-scale stripes)."""
    import io

    from miekki_tpu.index.store import SketchIndex

    idx = SketchIndex.load(db)
    tiles = list(engine.dist_tiles(idx, tile=4))
    gi, gj, sh, un, it = (
        np.concatenate(x) for x in zip(*[t[2:] for t in tiles])
    )
    order = np.lexsort((gj, gi))
    gi, gj, sh, un, it = (x[order] for x in (gi, gj, sh, un, it))
    fmt = engine._BlockFormatter(idx, None)
    one, n_one = fmt.format(gi, gj, sh, un, it)
    buf = io.StringIO()
    n_chunked = engine._format_write(fmt, buf, gi, gj, sh, un, it, chunk=3)
    assert n_chunked == n_one
    assert buf.getvalue() == one
