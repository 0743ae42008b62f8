"""MXU stream-pass tile counts vs the sort-merge reference (exactness of
inter/union, validity of the shared_in_x lb/ub bounds, band-overflow
detection, and end-to-end parity of tile_counts_mxu_exact)."""

import numpy as np
import pytest

import jax.numpy as jnp

from miekki_tpu.ops import intersect, mxu_intersect, u64
from miekki_tpu.oracle import sketch as oracle_sketch


def stack_pair(sketches, s):
    arr = np.stack([oracle_sketch.pad_sketch(x, s) for x in sketches])
    hi, lo = u64.split(arr)
    return jnp.asarray(hi), jnp.asarray(lo)


def random_sketch(rng, n_values, value_range, s):
    vals = np.unique(rng.integers(0, value_range, size=n_values, dtype=np.uint64))
    return vals[:s]


def reference_tile(rows, cols, s):
    """Per-pair pair_counts_merge over the tile (the proven oracle)."""
    ti = rows[0].shape[0]
    tj = cols[0].shape[0]
    out = {k: np.zeros((ti, tj), np.int32)
           for k in ("shared_in_x", "union_size", "inter_full", "n_a", "n_b")}
    for i in range(ti):
        for j in range(tj):
            got = intersect.pair_counts_merge(
                (rows[0][i], rows[1][i]), (cols[0][j], cols[1][j]), s)
            for k in out:
                out[k][i, j] = int(got[k])
    return out


def check_tile(rows, cols, s, **kw):
    ref = reference_tile(rows, cols, s)
    raw = mxu_intersect.tile_counts_mxu(rows, cols, s, **kw)
    assert not bool(raw["overflow"]), "unexpected band overflow"
    np.testing.assert_array_equal(np.asarray(raw["inter_full"]), ref["inter_full"])
    np.testing.assert_array_equal(np.asarray(raw["union_size"]), ref["union_size"])
    lb = np.asarray(raw["shared_lb"])
    ub = np.asarray(raw["shared_ub"])
    assert (lb <= ref["shared_in_x"]).all(), "lb not a lower bound"
    assert (ub >= ref["shared_in_x"]).all(), "ub not an upper bound"
    exact = mxu_intersect.tile_counts_mxu_exact(rows, cols, s, **kw)
    for k in ("shared_in_x", "union_size", "inter_full", "n_a", "n_b"):
        np.testing.assert_array_equal(exact[k], ref[k], err_msg=k)
    return lb, ub


@pytest.mark.parametrize("seed", range(4))
def test_random_overlapping_tiles(seed):
    rng = np.random.default_rng(seed)
    s = 32
    # small value range → heavy overlaps, many shared values, short runs
    rows = stack_pair([random_sketch(rng, 60, 500, s) for _ in range(5)], s)
    cols = stack_pair([random_sketch(rng, 60, 500, s) for _ in range(7)], s)
    check_tile(rows, cols, s, chunk=64, band=8)


def test_crossing_chunk_ambiguity_resolved():
    """Dense overlaps + tiny chunks force matches into crossing chunks, so
    lb != ub for some pairs — the exact wrapper must resolve them all."""
    rng = np.random.default_rng(99)
    s = 64
    base = np.unique(rng.integers(0, 300, size=200, dtype=np.uint64))
    sketches = []
    for _ in range(6):
        mask = rng.random(base.size) < 0.7
        sketches.append(np.sort(base[mask])[:s])
    rows = stack_pair(sketches[:3], s)
    cols = stack_pair(sketches[3:], s)
    lb, ub = check_tile(rows, cols, s, chunk=16, band=8)
    assert (lb != ub).any(), "test intended to exercise the ambiguous path"


def test_identical_and_disjoint():
    s = 16
    a = np.arange(1, 17, dtype=np.uint64) * 7
    b = a + 1000
    rows = stack_pair([a, b], s)
    cols = stack_pair([a, b], s)
    exact = mxu_intersect.tile_counts_mxu_exact(rows, cols, s, chunk=8, band=4)
    np.testing.assert_array_equal(exact["inter_full"], [[16, 0], [0, 16]])
    np.testing.assert_array_equal(exact["shared_in_x"], [[16, 0], [0, 16]])
    np.testing.assert_array_equal(exact["union_size"], [[16, 16], [16, 16]])


def test_short_sketches_inf_padding():
    rng = np.random.default_rng(5)
    s = 32
    rows = stack_pair([random_sketch(rng, 10, 100, s) for _ in range(3)], s)
    cols = stack_pair([random_sketch(rng, 8, 100, s) for _ in range(3)], s)
    check_tile(rows, cols, s, chunk=32, band=8)


def test_value_zero_ties():
    """Hash value 0 shared by all sketches (the INF/zero sentinel edge)."""
    s = 8
    sk = [np.array([0, 5, 9], dtype=np.uint64),
          np.array([0, 5, 11], dtype=np.uint64),
          np.array([0, 9, 11], dtype=np.uint64)]
    rows = stack_pair(sk, s)
    cols = stack_pair(sk, s)
    check_tile(rows, cols, s, chunk=8, band=8)


def test_band_overflow_detected_and_fallback():
    """Legacy band mode: a value present in more sketches than the band
    spans must flag overflow, and the exact wrapper must still return
    oracle counts.  Full mode (the default) handles the same input with no
    overflow and exact counts."""
    s = 8
    shared = np.uint64(42)
    sk = [np.sort(np.array([shared, 100 + 13 * i, 200 + 7 * i], dtype=np.uint64))
          for i in range(6)]
    rows = stack_pair(sk[:3], s)
    cols = stack_pair(sk, s)  # value 42 occupies a 9-slot run > band+1
    raw = mxu_intersect.tile_counts_mxu(rows, cols, s, chunk=16, band=2,
                                        mode="band")
    assert bool(raw["overflow"])
    ref = reference_tile(rows, cols, s)
    exact = mxu_intersect.tile_counts_mxu_exact(rows, cols, s, chunk=16, band=2)
    for k in ref:
        np.testing.assert_array_equal(exact[k], ref[k], err_msg=k)
    full = mxu_intersect.tile_counts_mxu(rows, cols, s, chunk=16)
    assert not bool(full["overflow"])
    np.testing.assert_array_equal(np.asarray(full["inter_full"]),
                                  ref["inter_full"])


def test_full_mode_long_runs_exact():
    """Family-like data: values shared across MANY sketches (runs far past
    any band) — the full-mode pass must bracket exactly with no overflow.
    This is the production all-vs-all workload that overflowed every tile
    of the r3 10k-genome run in band mode (runs up to 109 vs band 8)."""
    rng = np.random.default_rng(7)
    s = 24
    core = rng.choice(1000, size=10, replace=False).astype(np.uint64)

    def member():
        mine = rng.choice(5000, size=30, replace=False).astype(np.uint64) + 2000
        return np.unique(np.concatenate([core, mine]))[:s]

    rows = stack_pair([member() for _ in range(9)], s)
    cols = stack_pair([member() for _ in range(11)], s)  # core run length 20
    for chunk in (20, 32, 64, 256):
        lb, ub = check_tile(rows, cols, s, chunk=chunk)


def test_full_mode_run_straddles_chunk_edge():
    """Force the single-crossing-value correction: chunk == ti + tj and a
    value placed so its run straddles the chunk boundary, with the s-cut
    landing on and around the crossing value's rank."""
    for s, extra in [(4, 0), (5, 1), (6, 2), (8, 4)]:
        vals = np.arange(1, 40, dtype=np.uint64)
        # every sketch holds values 1..3 plus distinct tails: runs of len 7
        sk = [np.unique(np.concatenate([
            vals[:3], np.uint64(10 + 5 * i) + vals[:3]]))[: s]
            for i in range(7)]
        rows = stack_pair(sk[:3], s)
        cols = stack_pair(sk[3:], s)
        check_tile(rows, cols, s, chunk=10)  # ti+tj = 10 == chunk


def test_matches_tile_counts_production():
    """End-to-end: tile_counts_mxu_exact == intersect.tile_counts on a
    production-shaped (if small) tile."""
    rng = np.random.default_rng(21)
    s = 128
    rows = stack_pair([random_sketch(rng, 300, 5000, s) for _ in range(9)], s)
    cols = stack_pair([random_sketch(rng, 300, 5000, s) for _ in range(11)], s)
    want = {k: np.asarray(v)
            for k, v in intersect.tile_counts(rows, cols, s).items()}
    got = mxu_intersect.tile_counts_mxu_exact(rows, cols, s, chunk=256, band=8)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_stream_reuse_matches_fresh():
    """Precomputed block streams (the amortized path) give identical counts."""
    rng = np.random.default_rng(3)
    s = 32
    rows = stack_pair([random_sketch(rng, 60, 400, s) for _ in range(4)], s)
    cols = stack_pair([random_sketch(rng, 60, 400, s) for _ in range(4)], s)
    rs = mxu_intersect.sketch_stream(rows, False)
    cs = mxu_intersect.sketch_stream(cols, True)
    fresh = mxu_intersect.tile_counts_mxu(rows, cols, s, chunk=64)
    reused = mxu_intersect.tile_counts_mxu(rows, cols, s, chunk=64,
                                           row_stream=rs, col_stream=cs)
    for k in ("inter_full", "shared_lb", "shared_ub"):
        np.testing.assert_array_equal(np.asarray(fresh[k]), np.asarray(reused[k]))


def test_env_dispatch_and_engine_dist_parity(monkeypatch, tmp_path):
    """MIEKKI_INTERSECT=mxu routes tile_counts to the stream pass and the
    engine's dist TSV is byte-identical to the default impl."""
    import sys
    sys.path.insert(0, "tests")
    from fixtures import write_fasta, random_seq, mutate

    import miekki_tpu as mk

    rng = np.random.default_rng(77)
    base = random_seq(rng, 5000)
    paths = []
    for i in range(7):
        f = tmp_path / f"g{i}.fa"
        write_fasta(f, [(f"genome{i}", mutate(rng, base, 0.02 * i))])
        paths.append(str(f))
    idx = mk.build_index(paths, mk.SketchParams(k=21, s=128))

    def rows(impl):
        monkeypatch.setenv("MIEKKI_INTERSECT", impl)
        return list(mk.dist_iter(idx))

    default = rows("searchsorted")
    got = rows("mxu")
    assert len(default) == len(got) > 0
    for d, g in zip(default, got):
        assert d == g


def test_stream_with_col_tag_matches_col_sort():
    """The derived column stream (payload OR) must be bitwise-identical to
    an independent sketch_stream(is_col=True) sort, including with heavy
    value ties across sketches (ties exercise the key-only-permutation
    argument: the payload is not a sort key, so both roles sort the block
    identically)."""
    rng = np.random.default_rng(11)
    s = 64
    # many duplicated values across the 9 sketches -> lots of key ties
    pool = np.unique(rng.integers(0, 200, size=400, dtype=np.uint64))
    sketches = [np.sort(rng.choice(pool, size=s, replace=False))
                for _ in range(9)]
    rows = stack_pair(sketches, s)
    base = mxu_intersect.sketch_stream(rows, False)
    derived = mxu_intersect.stream_with_col_tag(base)
    direct = mxu_intersect.sketch_stream(rows, True)
    for d, x in zip(derived, direct):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(x))


def test_prefix_resolution_and_clone_fallback():
    """Ambiguity resolution at prefix width w < s must stay exact, and
    near-clone pairs (certificate fails: the s-th union distinct lies past
    the prefix caps) must fall through to the full-width re-resolve."""
    rng = np.random.default_rng(99)
    s = 8192
    w = mxu_intersect._resolve_prefix_width(s)
    assert w < s  # the prefix path is actually exercised at this s
    root = np.unique(rng.integers(0, 2**62, size=3 * s, dtype=np.uint64))
    sketches = []
    for share in (0.95, 0.9, 0.2, 0.15, 0.0):
        keep = rng.random(root.size) < share
        vals = np.concatenate([
            root[keep],
            rng.integers(0, 2**62, size=2 * s, dtype=np.uint64)])
        sketches.append(np.unique(vals)[:s])
    rows = stack_pair(sketches[:3], s)
    cols = stack_pair(sketches[2:], s)
    ref = reference_tile(rows, cols, s)
    exact = mxu_intersect.tile_counts_mxu_exact(rows, cols, s)
    for k in ("shared_in_x", "union_size", "inter_full"):
        np.testing.assert_array_equal(exact[k], ref[k], err_msg=k)


def test_prefix_certificate_rejects_clones():
    """Direct check of _resolve_pairs_prefix: clone pairs report ok=0 and
    low-sharing pairs report ok=1 with the exact count."""
    rng = np.random.default_rng(7)
    s = 8192
    w = mxu_intersect._resolve_prefix_width(s)
    base = np.unique(rng.integers(0, 2**62, size=2 * s, dtype=np.uint64))[:s]
    other = np.unique(rng.integers(0, 2**62, size=2 * s, dtype=np.uint64))[:s]
    rows = stack_pair([base, base], s)
    cols = stack_pair([base, other], s)
    a = (rows[0][:, :w], rows[1][:, :w])
    b = (cols[0][:, :w], cols[1][:, :w])
    packed = np.asarray(mxu_intersect._resolve_pairs_prefix(a, b, s))
    assert packed[1][0] == 0  # clone pair: certificate must refuse
    assert packed[1][1] == 1  # unrelated pair: certificate holds
    ref = intersect.pair_counts_merge(
        (rows[0][1], rows[1][1]), (cols[0][1], cols[1][1]), s)
    assert packed[0][1] == int(ref["shared_in_x"])


def test_single_plane_full_pass_matches_pair_path():
    """The r4 single-plane (compact code) stream pass must be bit-identical
    to running the u64 pass on (code, lo_plane) pairs — same run-id core,
    one fewer sort plane — including short (sentinel-padded) sketches and
    family-structured long runs, plus the stream_with_col_tag32 shortcut."""
    import jax.numpy as jnp

    from miekki_tpu.ops import mxu_intersect as M

    rng = np.random.default_rng(9)
    s, ti, tj = 200, 24, 16
    root = np.sort(rng.choice(np.arange(1, 2**31, dtype=np.uint32),
                              size=s, replace=False))
    def mk(n):
        tbl = np.full((n, s), np.uint32(0xFFFFFFFF))
        for i in range(n):
            m = int(rng.integers(5, s + 1))
            keep = rng.random(s) < 0.3
            vals = np.where(keep, root, rng.integers(
                1, 2**31, size=s, dtype=np.uint32).astype(np.uint32))
            tbl[i, :m] = np.sort(np.unique(vals))[:m]
            tbl[i, m:] = np.uint32(0xFFFFFFFF)
        return tbl

    rows = mk(ti)
    cols = mk(tj)
    got = M.tile_counts_mxu_exact32(jnp.asarray(rows), jnp.asarray(cols), s)
    lo_r = np.where(rows == 0xFFFFFFFF, np.uint32(0xFFFFFFFF),
                    np.uint32(0))
    lo_c = np.where(cols == 0xFFFFFFFF, np.uint32(0xFFFFFFFF),
                    np.uint32(0))
    want = M.tile_counts_mxu_exact(
        (jnp.asarray(rows), jnp.asarray(lo_r)),
        (jnp.asarray(cols), jnp.asarray(lo_c)), s)
    for key in ("shared_in_x", "union_size", "inter_full", "n_a", "n_b"):
        np.testing.assert_array_equal(got[key], want[key])
    # col-tag shortcut == genuine col-role sort
    st = M.sketch_stream32(jnp.asarray(cols), False)
    tagged = M.stream_with_col_tag32(st)
    direct = M.sketch_stream32(jnp.asarray(cols), True)
    np.testing.assert_array_equal(np.asarray(tagged[0]),
                                  np.asarray(direct[0]))
    np.testing.assert_array_equal(np.asarray(tagged[1]),
                                  np.asarray(direct[1]))
