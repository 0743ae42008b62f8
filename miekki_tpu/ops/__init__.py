"""Device compute path: u64 emulation, hashing, sketching, intersection."""

from . import hash, sketch, u64  # noqa: F401
