"""Sketch database: serialization, sharding, and the compare-phase manifest."""

from .store import SketchIndex  # noqa: F401
