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
