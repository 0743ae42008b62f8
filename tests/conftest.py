"""Test configuration.

Tests run on the CPU backend with 8 faked devices so the multi-host sharding
logic is exercised without a pod (SURVEY.md §4 "fake-multi-device trick").
Must run before the first `import jax` anywhere in the test session.
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU)

# Isolate the persistent compile cache: CLI tests call entry points that
# enable() it, and sharing ~/.cache/miekki_jax_cache with a concurrently
# running TPU tool has produced a segfault inside jax's cache writer
# (zstd write race, observed 2026-08-21).  A per-session temp dir keeps
# tests hermetic and the production cache unpolluted.
os.environ.setdefault(
    "MIEKKI_COMPILE_CACHE", tempfile.mkdtemp(prefix="miekki_test_cache_")
)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon PJRT plugin ignores JAX_PLATFORMS on this image; the config API
# is honored, so force CPU through it as well (must run before any jax use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 faked CPU devices for mesh tests"
