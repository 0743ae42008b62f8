"""utils coverage: compile cache setup + metrics emission."""

import json
import os


def test_compile_cache_enable_and_disable(tmp_path, monkeypatch):
    from miekki_tpu.utils import compile_cache

    target = tmp_path / "cc"
    monkeypatch.setenv("MIEKKI_COMPILE_CACHE", str(target))
    compile_cache.enable()
    assert target.exists()
    compile_cache.enable()  # idempotent
    monkeypatch.setenv("MIEKKI_COMPILE_CACHE", "0")
    compile_cache.enable()  # disabled: must not raise


def test_metrics_emit_and_read(tmp_path):
    from miekki_tpu.utils import metrics

    f = str(tmp_path / "m.jsonl")
    row = metrics.emit(f, phase="x", value=1.5)
    assert row["phase"] == "x"
    metrics.emit(f, phase="y", value=2)
    rows = metrics.read(f)
    assert [r["phase"] for r in rows] == ["x", "y"]
    assert metrics.emit(None, phase="nofile")["phase"] == "nofile"


class TestHbmBudgets:
    """Unified HBM budget helper (VERDICT r4 #8): one probed limit, and the
    dist-time combination (resident planes + block cache + in-flight
    pipeline) bounded by construction at ANY device size."""

    def test_limit_env_override(self, monkeypatch):
        from miekki_tpu.utils import hbm

        monkeypatch.setenv("MIEKKI_HBM_LIMIT", str(8 << 30))
        assert hbm.bytes_limit() == 8 << 30

    def test_keep_planes_threshold(self, monkeypatch):
        from miekki_tpu.utils import hbm

        monkeypatch.setenv("MIEKKI_HBM_LIMIT", str(8 << 30))
        assert hbm.keep_planes_ok(int((8 << 30) * 0.25))
        assert not hbm.keep_planes_ok(int((8 << 30) * 0.25) + 1)

    def test_dist_combination_bounded(self, monkeypatch):
        """planes + cache + depth*per-tile stays under the dist ceiling for
        a grid of device sizes, plane residencies, tiles, and depths."""
        from miekki_tpu.utils import hbm

        for limit_gb in (4, 8, 16, 32):
            limit = limit_gb << 30
            monkeypatch.setenv("MIEKKI_HBM_LIMIT", str(limit))
            for tile, s in ((128, 1000), (512, 10_000), (1024, 10_000)):
                per_block = tile * s * 32  # u64 mxu: planes + two streams
                for depth in (1, 8):
                    for planes_frac in (0.0, 0.25):
                        planes = int(limit * planes_frac)
                        if planes and not hbm.keep_planes_ok(planes):
                            continue
                        cache = hbm.dist_cache_bytes(planes, depth,
                                                     per_block)
                        total = planes + cache + depth * per_block
                        # bounded unless the floor dominates a tiny part
                        assert (total <= limit * hbm.DIST_TOTAL_FRAC
                                or cache == hbm.CACHE_MIN_BYTES), (
                            limit_gb, tile, s, depth, planes_frac)

    def test_screen_budgets_scale_with_limit(self, monkeypatch):
        from miekki_tpu.utils import hbm

        monkeypatch.setenv("MIEKKI_HBM_LIMIT", str(16 << 30))
        merge = hbm.screen_merge_value_budget()
        resident = hbm.screen_resident_value_budget()
        # merge-join program ~38 B/value must fit; resident 9 B/value
        assert merge * 38 < (16 << 30)
        assert resident * 9 <= (16 << 30) * 0.6
        # the config-5 DB (1.024e9 values) fits ONE resident group
        assert resident >= 1_024_000_000
