"""True multi-process distributed validation: two JAX processes over a gRPC
coordinator run the cross-process ring all-vs-all (tools/
multiprocess_ring_test.py) — the same bootstrap + collective path a real
multi-host pod uses."""

import os
import subprocess
import sys

def test_two_process_ring_all_vs_all():
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "multiprocess_ring_test.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "MIEKKI_MPTEST_PORT": "9937"}
    env.pop("XLA_FLAGS", None)  # the tool sets its own device count
    out = subprocess.run(
        [sys.executable, os.path.abspath(tool)], env=env,
        capture_output=True, text=True, timeout=220,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "ALL PROCESSES OK" in out.stdout


def test_fault_injection_resume():
    """Kill process 1 mid-run; restart; manifest resume must reproduce the
    bitwise-identical matrix (SURVEY.md §5; VERDICT r1 next-round #8)."""
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "multiprocess_fault_test.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "MIEKKI_FAULT_PORT": "9941"}
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(tool)], env=env,
        capture_output=True, text=True, timeout=380,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "bitwise identical — PASS" in out.stdout


def test_two_process_hostring():
    """r5 hostring promotion (VERDICT r4 #5): per-process orchestration of
    local devices + ONE traced ppermute collective for the cross-process
    column rotation — each process bitwise-verifies its owned rows,
    including deferred-ambiguity pairs."""
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "multiprocess_hostring_test.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "MIEKKI_HOSTRING_PORT": "9957"}
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(tool)], env=env,
        capture_output=True, text=True, timeout=220,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "HOSTRING-MP OK" in out.stdout
