"""Distributed path tests (SURVEY.md §4 "Distributed" row): the sharded
ring all-vs-all and data-parallel screening must produce results bit-identical
to the single-device engine, exercised on the 8 faked CPU devices set up in
conftest.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miekki_tpu import engine
from miekki_tpu.index.store import SketchIndex
from miekki_tpu.params import SketchParams
from miekki_tpu.parallel import (
    dist_sharded,
    local_mesh,
    ring_all_vs_all_counts,
    screen_sharded,
)
from miekki_tpu.parallel.mesh import DATA_AXIS, DB_AXIS

from fixtures import random_genome_fasta, random_reads_fastq


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("par")
    rng = np.random.default_rng(7)
    paths = [
        random_genome_fasta(tmp / f"g{i}.fa", rng, n_records=2, length=800)
        for i in range(10)
    ]
    params = SketchParams(k=21, s=128)
    return engine.build_index(paths, params)


def test_ring_allvsall_matches_engine(small_index):
    mesh = local_mesh(axis_names=(DB_AXIS,))
    counts = dist_sharded(small_index, mesh)
    rows = engine.dist(small_index)
    n = len(small_index)
    assert counts["shared"].shape == (n, n)
    # engine.dist yields the upper triangle; check every pair against it.
    for r in rows:
        i, j = r["i"], r["j"]
        assert int(counts["shared"][i, j]) == r["shared"]
        assert int(counts["union"][i, j]) == r["union"]
    # symmetry + diagonal invariants of the full sharded matrix
    assert np.array_equal(counts["shared"], counts["shared"].T)
    assert np.array_equal(counts["union"], counts["union"].T)
    sizes = small_index.sizes()
    s = small_index.params.s
    for i in range(n):
        expect = min(int(sizes[i]), s)
        assert counts["shared"][i, i] == expect
        assert counts["union"][i, i] == expect


def test_ring_allvsall_rectangular(small_index):
    mesh = local_mesh(axis_names=(DB_AXIS,))
    a = SketchIndex(small_index.params, small_index.names[:4],
                    small_index.hi[:4], small_index.lo[:4])
    b = SketchIndex(small_index.params, small_index.names[4:],
                    small_index.hi[4:], small_index.lo[4:])
    counts = dist_sharded(a, mesh, index_b=b)
    rows = engine.dist(a, b)
    assert counts["shared"].shape == (4, len(small_index) - 4)
    for r in rows:
        assert int(counts["shared"][r["i"], r["j"]]) == r["shared"]
        assert int(counts["union"][r["i"], r["j"]]) == r["union"]


def test_ring_allvsall_2d_mesh(small_index):
    """The ring must also work on the db axis of a 2-D (data, db) mesh."""
    mesh = local_mesh(shape=(2, 4), axis_names=(DATA_AXIS, DB_AXIS))
    counts = dist_sharded(small_index, mesh)
    ref = dist_sharded(small_index, local_mesh(axis_names=(DB_AXIS,)))
    assert np.array_equal(counts["shared"], ref["shared"])
    assert np.array_equal(counts["union"], ref["union"])


def test_screen_sharded_matches_engine(small_index, tmp_path):
    rng = np.random.default_rng(11)
    reads = random_reads_fastq(tmp_path / "reads.fq", rng, n_reads=200, length=120)
    got = screen_sharded(small_index, reads,
                         local_mesh(axis_names=(DATA_AXIS,)), flat=4096)
    want = engine.screen(small_index, reads, flat=4096)
    assert got == want


def test_screen_sharded_2d_mesh(small_index, tmp_path):
    rng = np.random.default_rng(13)
    reads = random_reads_fastq(tmp_path / "r2.fq", rng, n_reads=64, length=90)
    mesh = local_mesh(shape=(4, 2), axis_names=(DATA_AXIS, DB_AXIS))
    got = screen_sharded(small_index, reads, mesh, flat=2048)
    want = engine.screen(small_index, reads, flat=2048)
    assert got == want


def test_ring_counts_padding_rows():
    """INF-padded rows must contribute zero counts (pad path in dist_sharded)."""
    params = SketchParams(k=21, s=16)
    sketches = [np.sort(np.random.default_rng(i).integers(
        0, 2**63, size=16, dtype=np.uint64)) for i in range(3)]
    idx = SketchIndex.from_sketches(sketches, ["a", "b", "c"], params)
    mesh = local_mesh(axis_names=(DB_AXIS,))
    counts = dist_sharded(idx, mesh)  # pads 3 → 8 internally
    assert counts["shared"].shape == (3, 3)
    assert (np.diag(counts["union"]) == 16).all()


def test_screen_db_sharded_2d(small_index, tmp_path):
    """DB sharded over `db` + reads over `data` must equal engine.screen."""
    rng = np.random.default_rng(41)
    reads = random_reads_fastq(tmp_path / "r3.fq", rng, n_reads=120, length=100)
    mesh = local_mesh(shape=(2, 4), axis_names=(DATA_AXIS, DB_AXIS))
    got = screen_sharded(small_index, reads, mesh, flat=2048, db_axis=DB_AXIS)
    want = engine.screen(small_index, reads, flat=2048)
    assert got == want


@pytest.mark.parametrize("n_genomes,mesh_shape", [
    (5, (8,)), (17, (8,)), (23, (2, 4)), (9, (4, 2)),
])
def test_ring_random_sizes_and_meshes(n_genomes, mesh_shape, tmp_path):
    """Ring parity across awkward genome counts and mesh factorizations."""
    rng = np.random.default_rng(n_genomes * 31)
    params = SketchParams(k=21, s=64)
    table = np.sort(rng.integers(0, 2**62, size=(n_genomes, 64),
                                 dtype=np.uint64), axis=-1)
    idx = SketchIndex.from_sketches(list(table),
                                    [f"g{i}" for i in range(n_genomes)], params)
    if len(mesh_shape) == 1:
        mesh = local_mesh(axis_names=(DB_AXIS,))
    else:
        mesh = local_mesh(shape=mesh_shape, axis_names=(DATA_AXIS, DB_AXIS))
    counts = dist_sharded(idx, mesh)
    rows = engine.dist(idx)
    for r in rows:
        assert int(counts["shared"][r["i"], r["j"]]) == r["shared"]
        assert int(counts["union"][r["i"], r["j"]]) == r["union"]


def test_rect_ring_does_na_x_nb_tile_work(small_index, monkeypatch):
    """VERDICT r1 item 7: dist_sharded(a, b) must do n_a x n_b tile work —
    the local tile is [n_a/D, n_b/D] (no (A+B)² square embedding).  Assert
    via the tile shapes recorded at trace time."""
    from miekki_tpu.ops import intersect as _intersect

    shapes = []
    orig = _intersect.tile_counts

    def spy(rows, cols, s, impl=None):
        shapes.append((int(rows[0].shape[0]), int(cols[0].shape[0])))
        return orig(rows, cols, s, impl=impl)

    monkeypatch.setattr(_intersect, "tile_counts", spy)
    # pin the TRACED rectangular ring (auto now routes single-process
    # multi-device meshes through the host-orchestrated ring, r5)
    monkeypatch.setenv("MIEKKI_INTERSECT", "bitonic")
    mesh = local_mesh(axis_names=(DB_AXIS,))
    a = SketchIndex(small_index.params, small_index.names[:6],
                    small_index.hi[:6], small_index.lo[:6])
    counts = dist_sharded(a, mesh, index_b=small_index)  # 6 x 10 → pad 8 x 16
    assert shapes == [(1, 2)]  # one traced tile: [n_a_pad/D, n_b_pad/D]
    rows = engine.dist(a, small_index)
    for r in rows:
        assert int(counts["shared"][r["i"], r["j"]]) == r["shared"]
        assert int(counts["union"][r["i"], r["j"]]) == r["union"]
        assert int(counts["inter"][r["i"], r["j"]]) >= r["shared"]


@pytest.fixture(scope="module")
def family_index():
    """Heavy-sharing synthetic sketches: guarantees lb != ub pairs so the
    MXU ring's host-side ambiguity resolution is actually exercised."""
    rng = np.random.default_rng(0)
    s, n = 64, 16
    pool = np.unique(rng.integers(1, 2**63, size=8 * s, dtype=np.uint64))[: 4 * s]
    sketches = []
    for _ in range(n):
        sel = rng.choice(4 * s, size=s + 20, replace=False)
        sketches.append(np.unique(pool[sel])[:s])
    params = SketchParams(k=21, s=s)
    return SketchIndex.from_sketches(sketches, [f"g{i}" for i in range(n)],
                                     params)


def test_mxu_ring_matches_default(family_index, monkeypatch):
    """dist_sharded through the traced MXU stream-pass ring (VERDICT r3 #2)
    must be bit-identical to the default traceable kernel on the 8-device
    mesh, including pairs whose lb/ub brackets disagree (resolved host-side
    after un-rotation)."""
    from miekki_tpu.parallel.allvsall import ring_rect_counts_mxu

    idx = family_index
    mesh = local_mesh(axis_names=(DB_AXIS,))
    ref = dist_sharded(idx, mesh)
    monkeypatch.setenv("MIEKKI_INTERSECT", "mxu")
    got = dist_sharded(idx, mesh, mxu_tile=4)
    for k in ("shared", "union", "inter"):
        assert np.array_equal(ref[k], got[k]), k
    # the fixture must actually produce ambiguous pairs, else this test
    # proves nothing about the host epilogue
    lb, ub, _ = ring_rect_counts_mxu(
        jnp.asarray(idx.hi), jnp.asarray(idx.lo),
        jnp.asarray(idx.hi), jnp.asarray(idx.lo),
        s=idx.params.s, mesh=mesh, tile=4)
    assert int((np.asarray(lb) != np.asarray(ub)).sum()) > 0


def test_mxu_ring_rect_and_compact(family_index, monkeypatch):
    idx = family_index
    mesh = local_mesh(axis_names=(DB_AXIS,))
    a = SketchIndex(idx.params, idx.names[:8], idx.hi[:8], idx.lo[:8])
    b = SketchIndex(idx.params, idx.names[8:], idx.hi[8:], idx.lo[8:])
    ref_rect = dist_sharded(a, mesh, index_b=b)
    cidx = idx.to_compact()
    ref_cmp = dist_sharded(cidx, mesh)
    monkeypatch.setenv("MIEKKI_INTERSECT", "mxu")
    got_rect = dist_sharded(a, mesh, index_b=b, mxu_tile=4)
    got_cmp = dist_sharded(cidx, mesh, mxu_tile=4)
    for k in ("shared", "union", "inter"):
        assert np.array_equal(ref_rect[k], got_rect[k]), k
        assert np.array_equal(ref_cmp[k], got_cmp[k]), k


def test_mxu_ring_uneven_tile_padding(family_index, monkeypatch):
    """Block sizes that are NOT multiples of the mxu sub-tile must pad
    internally and still match (16 genomes / 8 devices = 2 rows per device
    with tile=3)."""
    idx = family_index
    mesh = local_mesh(axis_names=(DB_AXIS,))
    ref = dist_sharded(idx, mesh)
    monkeypatch.setenv("MIEKKI_INTERSECT", "mxu")
    got = dist_sharded(idx, mesh, mxu_tile=3)
    for k in ("shared", "union", "inter"):
        assert np.array_equal(ref[k], got[k]), k


def test_hostring_matches_default_ring(family_index):
    """The r4 host-orchestrated device ring (explicit device_put rotation
    of per-device sub-block streams + device-parallel mxu dispatches +
    one deferred resolve) must be bit-identical to the traced default
    ring, including padding (n not a multiple of D*tile) and short
    sketches."""
    from miekki_tpu.parallel.allvsall import dist_sharded_hostring

    idx = family_index
    # truncate one sketch so INF padding flows through every stage
    hi = idx.hi.copy()
    lo = idx.lo.copy()
    hi[3, 10:] = 0xFFFFFFFF
    lo[3, 10:] = 0xFFFFFFFF
    idx2 = SketchIndex(idx.params, idx.names, hi, lo)
    mesh = local_mesh(axis_names=(DB_AXIS,))
    ref = dist_sharded(idx2, mesh)
    got = dist_sharded_hostring(idx2, mxu_tile=3)
    for k in ("shared", "union", "inter"):
        assert np.array_equal(ref[k], got[k]), k


def test_hostring_rect_and_compact(family_index, monkeypatch):
    """r5 hostring promotion (VERDICT r4 #5): rectangular A-vs-B and
    compact single-plane forms must match the traced rings bitwise."""
    from miekki_tpu.parallel.allvsall import dist_sharded_hostring

    idx = family_index
    mesh = local_mesh(axis_names=(DB_AXIS,))
    monkeypatch.setenv("MIEKKI_INTERSECT", "bitonic")  # traced reference
    a = SketchIndex(idx.params, idx.names[:10], idx.hi[:10], idx.lo[:10])
    b = SketchIndex(idx.params, idx.names[10:], idx.hi[10:], idx.lo[10:])
    ref_rect = dist_sharded(a, mesh, index_b=b)
    cidx = idx.to_compact()
    ref_cmp = dist_sharded(cidx, mesh)
    monkeypatch.delenv("MIEKKI_INTERSECT")
    got_rect = dist_sharded_hostring(a, mxu_tile=3, index_b=b)
    got_cmp = dist_sharded_hostring(cidx, mxu_tile=3)
    for k in ("shared", "union", "inter"):
        assert np.array_equal(ref_rect[k], got_rect[k]), ("rect", k)
        assert np.array_equal(ref_cmp[k], got_cmp[k]), ("compact", k)


def test_dist_sharded_routes_hostring(family_index, monkeypatch):
    """Production routing: on a single-process multi-device 1-axis mesh,
    dist_sharded auto goes through the host-orchestrated ring and matches
    the traced pallas ring bitwise (the VERDICT r4 #5 done-criterion; the
    CLI --distributed path calls dist_sharded, so this covers it)."""
    from miekki_tpu.parallel import allvsall

    idx = family_index
    mesh = local_mesh(axis_names=(DB_AXIS,))
    calls = []
    orig = allvsall.dist_sharded_hostring

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(allvsall, "dist_sharded_hostring", spy)
    got = dist_sharded(idx, mesh)
    assert calls, "auto routing must use the host-orchestrated ring"
    monkeypatch.setenv("MIEKKI_INTERSECT", "bitonic")
    ref = dist_sharded(idx, mesh)
    for k in ("shared", "union", "inter"):
        assert np.array_equal(ref[k], got[k]), k


def test_hostring_checkpoint_resume(family_index, tmp_path):
    """Per-step checkpoints (r5): a run killed after step k and resumed
    from the checkpoint dir must be bitwise-identical to the uncheckpointed
    run (the resume replays only the column rotations)."""
    import os

    from miekki_tpu.parallel.allvsall import dist_sharded_hostring

    idx = family_index
    ref = dist_sharded_hostring(idx, mxu_tile=3)
    d = str(tmp_path / "ckpt")
    full = dist_sharded_hostring(idx, mxu_tile=3, checkpoint=d)
    n_dev = len(jax.devices())
    # simulate a crash: drop the last half of the step checkpoints
    for t in range(n_dev // 2, n_dev):
        p = os.path.join(d, f"hostring_step{t}.npz")
        if os.path.exists(p):
            os.remove(p)
    resumed = dist_sharded_hostring(idx, mxu_tile=3, checkpoint=d)
    for k in ("shared", "union", "inter"):
        assert np.array_equal(ref[k], full[k]), ("full", k)
        assert np.array_equal(ref[k], resumed[k]), ("resumed", k)
