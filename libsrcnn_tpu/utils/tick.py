"""Millisecond tick counter, relative to process start.

Equivalent of `tick::getTickCount` (`tick.cpp:28-37`): the reference
measures wall-clock ms from a static epoch via gettimeofday.
"""

from __future__ import annotations

import time

_EPOCH = time.monotonic()


def get_tick_count() -> int:
    """Milliseconds since process (module import) start."""
    return int((time.monotonic() - _EPOCH) * 1000.0)
