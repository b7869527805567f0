"""Utilities: timing, debug plane dumps."""

from .tick import get_tick_count  # noqa: F401
