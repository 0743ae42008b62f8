"""Test configuration.

Tests run on the CPU backend with 8 faked devices so the multi-host sharding
logic is exercised without a pod (SURVEY.md §4 "fake-multi-device trick").
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU)

# Disable the persistent compile cache under pytest: CLI tests call entry
# points that enable() it process-globally, and this jaxlib's cache WRITER
# segfaults on one of the later large CPU executables
# (put_executable_and_time, reproduced twice at the same test on
# 2026-08-21 — with the shared dir AND with an isolated temp dir; the
# same test is green when the cache never gets enabled).  CPU test
# compiles are fast; the cache buys tests nothing.
os.environ.setdefault("MIEKKI_COMPILE_CACHE", "0")
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
