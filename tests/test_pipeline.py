"""Pipelined dist_tiles (MIEKKI_PIPELINE) — bitwise equivalence vs the
synchronous order at every depth, across self/rectangular/skip shapes.

The pipeline only reorders WHEN results are pulled (dispatch t+1 before
finishing t); tile identity, masking, and count math are untouched, so
every depth must yield byte-identical streams in the same order.
"""

import numpy as np
import pytest

from miekki_tpu import engine
from miekki_tpu.params import SketchParams

from fixtures import make_genome_family, write_fasta


@pytest.fixture(scope="module")
def idx_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline")
    rng = np.random.default_rng(23)
    genomes = make_genome_family(rng, 9, 6000, sub_rate=0.05)
    paths = [
        str(write_fasta(tmp / f"g{i}.fa", [(f"g{i}", g)]))
        for i, g in enumerate(genomes)
    ]
    a = engine.build_index(paths[:6], SketchParams(k=21, s=150))
    b = engine.build_index(paths[6:], SketchParams(k=21, s=150))
    return a, b


def _collect(index_a, index_b=None, tile=2, skip=None):
    out = []
    for bi, bj, gi, gj, sh, un, it in engine.dist_tiles(
        index_a, index_b, tile=tile, skip_tiles=skip
    ):
        out.append((bi, bj, gi.copy(), gj.copy(), sh.copy(), un.copy(),
                    it.copy()))
    return out


def _assert_same(a, b):
    assert len(a) == len(b)
    for ta, tb in zip(a, b):
        assert ta[0] == tb[0] and ta[1] == tb[1]
        for xa, xb in zip(ta[2:], tb[2:]):
            np.testing.assert_array_equal(xa, xb)


@pytest.mark.parametrize("depth", ["0", "2", "3"])
def test_pipeline_depths_bitwise_equal_self(idx_pair, monkeypatch, depth):
    a, _ = idx_pair
    monkeypatch.setenv("MIEKKI_PIPELINE", "0")
    ref = _collect(a, tile=2)
    monkeypatch.setenv("MIEKKI_PIPELINE", depth)
    _assert_same(ref, _collect(a, tile=2))


def test_pipeline_rectangular_and_skip(idx_pair, monkeypatch):
    a, b = idx_pair
    monkeypatch.setenv("MIEKKI_PIPELINE", "0")
    ref = _collect(a, b, tile=2)
    ref_skip = _collect(a, tile=2, skip={(0, 1)})
    monkeypatch.setenv("MIEKKI_PIPELINE", "3")
    _assert_same(ref, _collect(a, b, tile=2))
    _assert_same(ref_skip, _collect(a, tile=2, skip={(0, 1)}))


def test_mxu_start_finish_matches_fused(idx_pair):
    """tile_counts_mxu_start+finish == tile_counts_mxu_exact, including
    with a second tile dispatched in between (the pipelined order)."""
    from miekki_tpu.ops import mxu_intersect as mxu
    from miekki_tpu.ops import u64

    a, b = idx_pair
    s = a.params.s
    rows = (np.asarray(a.hi), np.asarray(a.lo))
    cols = (np.asarray(b.hi), np.asarray(b.lo))
    import jax.numpy as jnp

    rows = (jnp.asarray(rows[0]), jnp.asarray(rows[1]))
    cols = (jnp.asarray(cols[0]), jnp.asarray(cols[1]))
    fused = mxu.tile_counts_mxu_exact(rows, cols, s)
    h1 = mxu.tile_counts_mxu_start(rows, cols, s)
    h2 = mxu.tile_counts_mxu_start(cols, rows, s)  # in-flight second tile
    out1 = mxu.tile_counts_mxu_finish(h1)
    out2 = mxu.tile_counts_mxu_finish(h2)
    for key in fused:
        np.testing.assert_array_equal(fused[key], out1[key])
    np.testing.assert_array_equal(out2["shared_in_x"],
                                  out1["shared_in_x"].T)


def test_device_planes_bitwise_and_match_host(monkeypatch):
    """Builder-attached device planes (MIEKKI_KEEP_DEV=1) must equal the
    host table exactly, and dist_counts_matrix through device-sliced
    blocks must be bitwise-identical to the host-upload path (r4: block
    re-upload through the ~20 MB/s tunnel was ~40% of the 10k wall)."""
    import os

    from miekki_tpu.index.store import SketchIndex

    rng = np.random.default_rng(1)
    codes = [rng.integers(0, 4, 9000).astype(np.uint8) for _ in range(13)]
    codes.append(rng.integers(0, 4, 5).astype(np.uint8))  # shorter than k
    params = SketchParams(k=21, s=300)
    monkeypatch.setenv("MIEKKI_KEEP_DEV", "1")
    idx = engine._build_index_from_codes(
        codes, [f"g{i}" for i in range(len(codes))], params,
        chunk=2048, batch=4)
    assert idx.device_planes is not None
    np.testing.assert_array_equal(np.asarray(idx.device_planes[0]), idx.hi)
    np.testing.assert_array_equal(np.asarray(idx.device_planes[1]), idx.lo)
    monkeypatch.setenv("MIEKKI_INTERSECT", "mxu")
    m1 = engine.dist_counts_matrix(idx, tile=4)
    idx2 = SketchIndex(params, idx.names, idx.hi, idx.lo)  # host-only
    m2 = engine.dist_counts_matrix(idx2, tile=4)
    for key in ("shared", "union", "inter"):
        assert np.array_equal(m1[key], m2[key]), key
