"""Utilities: metrics, logging, profiling helpers."""

from . import metrics  # noqa: F401
