"""Logging gated by debug level (canonical: frame/module_wrf_error.F
wrf_message/wrf_debug; SURVEY.md §5.5). Level 0 = errors only, 1 = info,
2 = per-step timing chatter."""

from __future__ import annotations

import os
import sys

_LEVEL = int(os.environ.get("ARC_TPU_DEBUG_LEVEL", "1"))


def set_level(level: int) -> None:
    global _LEVEL
    _LEVEL = level


def log(msg: str, level: int = 1) -> None:
    if level <= _LEVEL:
        print(msg, file=sys.stderr, flush=True)
