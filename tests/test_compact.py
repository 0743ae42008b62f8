"""Compact (32-bit fingerprint) sketch tests — ops/compact.py, the
HyperMinHash-style index compression (PAPERS.md; SURVEY.md §7 "Open items"
flags compressed fingerprints as a possible reference behavior).

Key properties: the code transform is monotone (sorted machinery works
unchanged), host/device encoders are bit-identical, and the collision-induced
jaccard bias is far below the bottom-s estimator's own sampling noise."""

import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from miekki_tpu import engine
from miekki_tpu.index.store import SketchIndex
from miekki_tpu.ops import compact as C
from miekki_tpu.params import SketchParams

from fixtures import random_genome_fasta, random_reads_fastq


def _rand_u64(rng, n):
    return rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * 2 + rng.integers(
        0, 2, size=n, dtype=np.uint64)


def test_encode_monotone_and_edges():
    rng = np.random.default_rng(1)
    v = np.sort(np.concatenate([
        _rand_u64(rng, 5000),
        np.array([0, 1, 2, 3, (1 << 26) - 1, 1 << 26, (1 << 32) - 1, 1 << 32,
                  1 << 62, (1 << 63) + 12345,
                  0xFFFFFFFFFFFFFFFF - 2, 0xFFFFFFFFFFFFFFFF - 1,
                  0xFFFFFFFFFFFFFFFF], dtype=np.uint64),
    ]))
    c = C.encode_u64(v)
    assert (np.diff(c.astype(np.int64)) >= 0).all(), "codes must be monotone"
    # sentinel only for UINT64_MAX
    assert c[-1] == np.uint32(0xFFFFFFFF)
    assert (c[:-1] != np.uint32(0xFFFFFFFF)).all()
    assert C.encode_u64(np.array([0], np.uint64))[0] == 0


def test_encode_pair_matches_host():
    rng = np.random.default_rng(2)
    v = np.concatenate([
        _rand_u64(rng, 4096),
        # exhaustive per-exponent coverage: a value at every msb position
        np.array([(np.uint64(1) << np.uint64(e)) | np.uint64(e * 2654435761 % (1 << e) if e else 0)
                  for e in range(64)], dtype=np.uint64),
        np.array([0, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64),
    ])
    want = C.encode_u64(v)
    hi = (v >> np.uint64(32)).astype(np.uint32)
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    got = np.asarray(C.encode_pair(jnp.asarray(hi), jnp.asarray(lo)))
    bad = np.nonzero(got != want)[0]
    assert bad.size == 0, (v[bad[:5]], want[bad[:5]], got[bad[:5]])


def test_decode_relative_error():
    rng = np.random.default_rng(3)
    v = _rand_u64(rng, 20000)
    v = v[v > 0]
    d = C.decode_approx(C.encode_u64(v))
    # decode returns the cell lower bound: d <= v, relative error <= 2^-26
    assert (d <= v).all()
    rel = (v - d).astype(np.float64) / v.astype(np.float64)
    assert rel.max() <= 2.0 ** -24, rel.max()  # loose bound incl. rounding
    assert int(C.decode_approx(np.array([0xFFFFFFFF], np.uint32))[0]) \
        == 0xFFFFFFFFFFFFFFFF


def test_collision_bias_on_synthetic_bottom_s():
    """jaccard estimated from compact codes must track the raw-value
    estimate within a few 1e-3 — the documented collision bias bound."""
    rng = np.random.default_rng(4)
    s = 2048
    n = 200_000
    shared = _rand_u64(rng, n // 2)
    a = np.unique(np.concatenate([shared, _rand_u64(rng, n // 2)]))
    b = np.unique(np.concatenate([shared, _rand_u64(rng, n // 2)]))
    sa = np.sort(a)[:s]
    sb = np.sort(b)[:s]

    def mash_j(xa, xb):
        union = np.unique(np.concatenate([xa, xb]))[:s]
        inter = np.intersect1d(xa, xb)
        return np.isin(union, inter).sum() / len(union)

    j_raw = mash_j(sa, sb)
    j_cmp = mash_j(C.encode_u64(sa).astype(np.uint64),
                   C.encode_u64(sb).astype(np.uint64))
    assert abs(j_raw - j_cmp) <= 5e-3, (j_raw, j_cmp)


@pytest.fixture(scope="module")
def raw_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cmp")
    rng = np.random.default_rng(7)
    paths = [
        random_genome_fasta(tmp / f"g{i}.fa", rng, n_records=1, length=20000)
        for i in range(6)
    ]
    return engine.build_index(paths, SketchParams(k=21, s=512)), tmp


def test_index_roundtrip_and_file_size(raw_index, tmp_path):
    idx, _ = raw_index
    cmp_idx = idx.to_compact()
    assert cmp_idx.params.compact
    p_raw = tmp_path / "raw.npz"
    p_cmp = tmp_path / "cmp.npz"
    idx.save(p_raw)
    cmp_idx.save(p_cmp)
    assert p_cmp.stat().st_size < 0.75 * p_raw.stat().st_size
    back = SketchIndex.load(p_cmp)
    assert back.params == cmp_idx.params
    assert np.array_equal(back.hi, cmp_idx.hi)
    assert np.array_equal(back.lo, cmp_idx.lo)
    # idempotent
    assert cmp_idx.to_compact() is cmp_idx


def test_dist_parity_raw_vs_compact(raw_index):
    idx, _ = raw_index
    cmp_idx = idx.to_compact()
    raw_rows = list(engine.dist_iter(idx))
    cmp_rows = list(engine.dist_iter(cmp_idx))
    assert len(raw_rows) == len(cmp_rows) == 15
    for r, c in zip(raw_rows, cmp_rows):
        assert abs(r["jaccard"] - c["jaccard"]) <= 5e-3, (r, c)
        assert abs(r["mash_distance"] - c["mash_distance"]) <= 5e-3
        assert abs(c["shared"] - r["shared"]) <= 4


def test_mixed_raw_compact_refused(raw_index):
    idx, _ = raw_index
    with pytest.raises(ValueError, match="incompatible"):
        list(engine.dist_iter(idx, idx.to_compact()))


def test_cardinality_scale_preserved(raw_index):
    idx, _ = raw_index
    raw_card = idx.cardinalities()
    cmp_card = idx.to_compact().cardinalities()
    assert np.allclose(raw_card, cmp_card, rtol=1e-4)


def test_screen_compact_matches_raw(raw_index):
    idx, tmp = raw_index
    rng = np.random.default_rng(11)
    reads = tmp / "reads.fq"
    random_reads_fastq(reads, rng, n_reads=150, length=120)
    raw_rows = engine.screen(idx, str(reads))
    cmp_rows = engine.screen(idx.to_compact(), str(reads))
    for r, c in zip(raw_rows, cmp_rows):
        assert r["reference"] == c["reference"]
        assert abs(r["containment"] - c["containment"]) <= 5e-3, (r, c)


def test_cli_compress_end_to_end(raw_index, tmp_path, capsys):
    from miekki_tpu.cli import main

    idx, _ = raw_index
    raw_p = str(tmp_path / "db.npz")
    cmp_p = str(tmp_path / "db32.npz")
    idx.save(raw_p)
    assert main(["compress", raw_p, "-o", cmp_p]) == 0
    assert main(["info", cmp_p]) == 0
    out = capsys.readouterr().out
    assert '"compact": true' in out
    out_tsv = str(tmp_path / "out.tsv")
    assert main(["dist", cmp_p, "-o", out_tsv]) == 0
    assert len(open(out_tsv).read().splitlines()) == 16  # header + 15 pairs
    # re-compressing a compact index errors
    assert main(["compress", cmp_p, "-o", str(tmp_path / "x.npz")]) == 1


def test_parallel_screen_compact(raw_index):
    from miekki_tpu.parallel import local_mesh, screen_sharded
    from miekki_tpu.parallel.mesh import DATA_AXIS

    idx, tmp = raw_index
    reads = tmp / "reads2.fq"
    rng = np.random.default_rng(13)
    random_reads_fastq(reads, rng, n_reads=100, length=100)
    cmp_idx = idx.to_compact()
    mesh = local_mesh(axis_names=(DATA_AXIS,))
    got = screen_sharded(cmp_idx, str(reads), mesh, flat=4096)
    want = engine.screen(cmp_idx, str(reads), flat=4096)
    assert got == want


def test_compact_impl_matrix(raw_index, monkeypatch):
    """Every compact intersect impl (single-plane searchsorted / bitonic /
    Pallas-interpret, plus mxu via (code, 0) pairs) must produce identical
    rows on a compact index."""
    idx, _ = raw_index
    cmp_idx = idx.to_compact()
    base = None
    for impl in ("searchsorted", "bitonic", "pallas", "mxu"):
        monkeypatch.setenv("MIEKKI_INTERSECT", impl)
        rows = list(engine.dist_iter(cmp_idx, tile=4))
        assert len(rows) == 15
        if base is None:
            base = rows
        else:
            assert rows == base, impl


def test_pair_counts32_matches_pair_path():
    """Single-plane kernels vs the u64 pair path on (code, 0) planes —
    bitwise-identical counts across widths incl. non-pow2."""
    from miekki_tpu.ops import intersect as I

    rng = np.random.default_rng(21)
    for sp in (128, 200, 256):
        a = np.sort(rng.choice(1 << 31, size=sp, replace=False)).astype(np.uint32)
        b = np.sort(np.concatenate([
            a[rng.random(sp) < 0.3],
            rng.choice(1 << 31, size=sp, replace=False).astype(np.uint32),
        ]))[:sp].astype(np.uint32)
        # INF-pad tails
        a[-5:] = 0xFFFFFFFF
        b[-3:] = 0xFFFFFFFF
        s = sp - 16
        ref = I.pair_counts_merge(
            (jnp.asarray(a), jnp.zeros(sp, jnp.uint32)
             .at[a == 0xFFFFFFFF].set(0xFFFFFFFF)),
            (jnp.asarray(b), jnp.zeros(sp, jnp.uint32)
             .at[b == 0xFFFFFFFF].set(0xFFFFFFFF)),
            s)
        got = I.pair_counts32(jnp.asarray(a), jnp.asarray(b), s)
        for key in ("shared_in_x", "union_size", "inter_full", "n_a", "n_b"):
            assert int(got[key]) == int(ref[key]), (sp, key)
        p2 = 1 << (sp - 1).bit_length()
        ab = np.full(p2, 0xFFFFFFFF, np.uint32); ab[:sp] = a
        bb = np.full(p2, 0xFFFFFFFF, np.uint32); bb[:sp] = b
        got_b = I.pair_counts_bitonic32(jnp.asarray(ab), jnp.asarray(bb), s)
        for key in ("shared_in_x", "union_size", "inter_full"):
            assert int(got_b[key]) == int(ref[key]), (sp, key, "bitonic")


def test_ring_dist_sharded_compact(raw_index):
    """The distributed ring on a compact index must match the single-device
    engine rows exactly (codes flow through the pair path in the ring)."""
    from miekki_tpu.parallel import dist_sharded, local_mesh
    from miekki_tpu.parallel.mesh import DB_AXIS

    idx, _ = raw_index
    cmp_idx = idx.to_compact()
    counts = dist_sharded(cmp_idx, local_mesh(axis_names=(DB_AXIS,)))
    for r in engine.dist_iter(cmp_idx):
        i, j = r["i"], r["j"]
        assert int(counts["shared"][i, j]) == r["shared"]
        assert int(counts["union"][i, j]) == r["union"]


def test_cli_sketch_compress_flag(raw_index, tmp_path):
    from miekki_tpu.cli import main

    _, tmp = raw_index
    out = str(tmp_path / "direct32.npz")
    genomes = sorted(str(p) for p in tmp.glob("g*.fa"))
    assert main(["sketch", *genomes, "-o", out, "-k", "21", "-s", "256",
                 "--compress"]) == 0
    idx = SketchIndex.load(out)
    assert idx.params.compact
    assert (idx.lo[idx.hi != 0xFFFFFFFF] == 0).all()


def test_to_compact_dedups_colliding_codes():
    """Two distinct raw values that collide into one code must not appear
    twice in the compact sketch (a within-sketch duplicate would count as
    a cross-side match in the merge logic)."""
    # adjacent values sharing the top 27 bits -> same code
    v1 = np.uint64(1) << np.uint64(40)
    v2 = v1 + np.uint64(1)  # differs below the mantissa window
    assert C.encode_u64(np.array([v1]))[0] == C.encode_u64(np.array([v2]))[0]
    idx = SketchIndex.from_sketches(
        [np.array([v1, v2, v1 + (np.uint64(1) << np.uint64(20))],
                  np.uint64)],
        ["g"], SketchParams(k=21, s=8))
    cmp_idx = idx.to_compact()
    row = cmp_idx.hi[0]
    valid = row[row != 0xFFFFFFFF]
    assert len(valid) == len(np.unique(valid))
    assert cmp_idx.sizes()[0] == 2  # three values, two distinct codes


def test_ring_rectangular_compact(raw_index):
    """Rectangular single-plane ring (A-vs-B on compact indexes) matches
    the single-device engine exactly."""
    from miekki_tpu.parallel import dist_sharded, local_mesh
    from miekki_tpu.parallel.mesh import DB_AXIS

    idx, _ = raw_index
    cmp_idx = idx.to_compact()
    a = SketchIndex(cmp_idx.params, cmp_idx.names[:3],
                    cmp_idx.hi[:3], cmp_idx.lo[:3])
    b = SketchIndex(cmp_idx.params, cmp_idx.names[3:],
                    cmp_idx.hi[3:], cmp_idx.lo[3:])
    mesh = local_mesh(axis_names=(DB_AXIS,))
    counts = dist_sharded(a, mesh, index_b=b)
    tiles = list(engine.dist_tiles(a, b, tile=4))
    for _, _, gi, gj, sh, un, it in tiles:
        for x, i, j, svals in ((counts["shared"], gi, gj, sh),):
            assert np.array_equal(x[i, j], svals)
        assert np.array_equal(counts["union"][gi, gj], un)
        assert np.array_equal(counts["inter"][gi, gj], it)


def test_compact_format_version_and_raw_unchanged(raw_index, tmp_path):
    """Compact files are stamped format_version 2 (pre-compact readers get
    the clean 'unsupported index format' error, not a KeyError on the
    missing lo array); raw files keep version 1."""
    import json

    idx, _ = raw_index
    p_raw = tmp_path / "r.npz"
    p_cmp = tmp_path / "c.npz"
    idx.save(p_raw)
    idx.to_compact().save(p_cmp)
    for p, want in ((p_raw, 1), (p_cmp, 2)):
        with np.load(p) as z:
            assert json.loads(bytes(z["header"]).decode())[
                "format_version"] == want


def test_compact_cardinality_with_code_collision():
    """A full sketch whose compact dedup dropped a collided code must keep
    an extrapolated cardinality (not collapse to ~len(sketch)); the
    default p_value column depends on it."""
    rng = np.random.default_rng(31)
    s = 1024
    n = 2_000_000
    vals = np.sort(rng.integers(1, 2 ** 63, size=n, dtype=np.uint64))[:s]
    # force one code collision inside the sketch
    vals[1] = vals[0] + np.uint64(1)
    vals = np.unique(vals)[:s]
    idx = SketchIndex.from_sketches([vals], ["g"], SketchParams(k=21, s=s))
    cmp_idx = idx.to_compact()
    assert cmp_idx.sizes()[0] < s  # the collision was deduped
    raw_card = idx.cardinalities()[0]
    cmp_card = cmp_idx.cardinalities()[0]
    assert abs(cmp_card - raw_card) / raw_card < 0.05, (raw_card, cmp_card)


def test_ring_rect_counts32_default_impl(raw_index):
    """ring_rect_counts32 with impl omitted must resolve the default, like
    its u64 analogs."""
    import jax.numpy as jnp

    from miekki_tpu.parallel import local_mesh
    from miekki_tpu.parallel.allvsall import ring_rect_counts32
    from miekki_tpu.parallel.mesh import DB_AXIS

    idx, _ = raw_index
    cmp_idx = idx.to_compact()
    pad = np.full((2, cmp_idx.hi.shape[1]), 0xFFFFFFFF, np.uint32)
    a = jnp.asarray(np.concatenate([cmp_idx.hi, pad]))
    mesh = local_mesh(axis_names=(DB_AXIS,))
    shared, union, inter = ring_rect_counts32(a, a, s=cmp_idx.params.s,
                                              mesh=mesh)
    assert int(shared[0, 0]) == int(cmp_idx.sizes()[0])


def test_cli_compress_output_without_suffix(raw_index, tmp_path):
    from miekki_tpu.cli import main

    idx, _ = raw_index
    raw_p = str(tmp_path / "db.npz")
    idx.save(raw_p)
    out = str(tmp_path / "noext")
    assert main(["compress", raw_p, "-o", out]) == 0
    # save() honors the EXACT path (no silent .npz append — r3 fix), and
    # loaders detect index files by content, so any extension round-trips.
    assert SketchIndex.load(out).params.compact


def test_collision_bias_at_production_s():
    """The documented bias bound at the contract scale s=10_000: compact
    jaccard within 2e-3 of the raw estimate (expected spurious matches ~3
    of 10k).  Host-numpy only; ~1e7 values."""
    rng = np.random.default_rng(44)
    s = 10_000
    n = 2_000_000
    shared = _rand_u64(rng, n // 2)
    a = np.unique(np.concatenate([shared, _rand_u64(rng, n // 2)]))
    b = np.unique(np.concatenate([shared, _rand_u64(rng, n // 2)]))
    sa, sb = np.sort(a)[:s], np.sort(b)[:s]

    def mash(xa, xb):
        union = np.unique(np.concatenate([xa, xb]))[:s]
        inter = np.intersect1d(xa, xb)
        sh = int(np.isin(union, inter).sum())
        return sh, sh / len(union)

    # dedup codes per sketch, mirroring to_compact
    ca = np.unique(C.encode_u64(sa)).astype(np.uint64)
    cb = np.unique(C.encode_u64(sb)).astype(np.uint64)
    sh_raw, j_raw = mash(sa, sb)
    sh_cmp, j_cmp = mash(ca, cb)
    assert abs(j_raw - j_cmp) <= 2e-3, (j_raw, j_cmp)
    assert abs(sh_raw - sh_cmp) <= 20, (sh_raw, sh_cmp)


def test_cardinalities_vectorized_matches_scalar(raw_index):
    """The r4 vectorized cardinalities() must be bit-identical to the
    per-genome scalar estimators it replaced (kmv_cardinality for u64
    indexes; the decode-then-CDF loop for compact), across <s / ==s /
    empty rows."""
    from miekki_tpu.oracle.compare import kmv_cardinality

    idx, _ = raw_index
    s = idx.params.s
    # add edge rows: empty, single-element, tiny
    extra = [np.array([], np.uint64),
             np.array([123456789], np.uint64),
             np.sort(_rand_u64(np.random.default_rng(3), 5))]
    sketches = [idx.sketch_u64(i) for i in range(len(idx))] + extra
    names = idx.names + ["e0", "e1", "e2"]
    big = SketchIndex.from_sketches(sketches, names, idx.params)

    got = big.cardinalities()
    want = np.array([kmv_cardinality(big.sketch_u64(i), s)
                     for i in range(len(big))])
    np.testing.assert_array_equal(got, want)

    cmp_idx = big.to_compact()
    got_c = cmp_idx.cardinalities()
    want_c = np.empty(len(cmp_idx), np.float64)
    for i in range(len(cmp_idx)):
        codes = cmp_idx.hi[i][~((cmp_idx.hi[i] == 0xFFFFFFFF)
                                & (cmp_idx.lo[i] == 0xFFFFFFFF))]
        v = C.decode_approx(codes)
        j = len(v)
        if j < 2:
            want_c[i] = float(j)
        else:
            q = float(v[-1]) / 2.0 ** 64
            want_c[i] = j / max(2.0 * q - q * q, 1e-300) - 1.0
    np.testing.assert_array_equal(got_c, want_c)


def test_compact_device_planes_dist(monkeypatch):
    """r5: a compact index whose code plane is device-resident
    (device_planes = single [N, s] array) must produce bit-identical
    dist_counts_matrix output to the host-plane path."""
    import jax.numpy as jnp
    import numpy as np

    from miekki_tpu import engine
    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.params import SketchParams

    rng = np.random.default_rng(21)
    n, s = 12, 96
    pool = np.unique(rng.integers(0, 2**60, size=4 * s, dtype=np.uint64))
    sk = np.stack([np.sort(rng.choice(pool, size=s, replace=False))
                   for _ in range(n)])
    hi = (sk >> np.uint64(32)).astype(np.uint32)
    lo = (sk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    idx = SketchIndex(SketchParams(k=31, s=s),
                      [f"g{i}" for i in range(n)], hi, lo).to_compact()
    ref = engine.dist_counts_matrix(idx, tile=5)
    idx.device_planes = jnp.asarray(idx.hi)
    got = engine.dist_counts_matrix(idx, tile=5)
    for key in ("shared", "union", "inter"):
        assert np.array_equal(ref[key], got[key]), key


def test_compact_rows_matches_to_compact():
    """Device compact_rows == host to_compact bitwise (encode + within-row
    dedup + re-sort), including sentinel-padded short rows."""
    import jax.numpy as jnp
    import numpy as np

    from miekki_tpu.index.store import SketchIndex
    from miekki_tpu.ops import compact as C
    from miekki_tpu.params import SketchParams

    rng = np.random.default_rng(33)
    n, s = 16, 128
    # near-adjacent values force code collisions (the dedup path)
    base = rng.integers(0, 2**40, size=(n, s // 2), dtype=np.uint64)
    vals = np.concatenate([base, base + rng.integers(1, 3, base.shape,
                                                     dtype=np.uint64)],
                          axis=1)
    vals = np.sort(vals, axis=1)
    vals[3, 100:] = np.uint64(0xFFFFFFFFFFFFFFFF)  # short sketch
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    want = SketchIndex(SketchParams(k=31, s=s),
                       [f"g{i}" for i in range(n)], hi, lo).to_compact()
    got = np.asarray(C.compact_rows(jnp.asarray(hi), jnp.asarray(lo)))
    np.testing.assert_array_equal(got, want.hi)
