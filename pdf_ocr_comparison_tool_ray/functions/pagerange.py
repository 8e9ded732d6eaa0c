"""Span/page range parse & format (reference F5: content_matcher.py:461-501).

Internally the engine keeps ``(start_offset, end_offset)`` int columns;
the "P1-P3" strings are rendered only at the report sink.
"""

from __future__ import annotations

import re
from typing import Tuple

_P_RE = re.compile(r"P(\d+)")


def format_range(start: int, end: int) -> str:
    """0-based ints -> reference-style 1-based "P{a}-P{b}" / "P{a}"."""
    a, b = start + 1, end + 1
    return f"P{a}-P{b}" if a != b else f"P{a}"


def parse_first(pages: str) -> int | None:
    """First page number in a range string, 1-based (content_matcher.py:461-467)."""
    m = _P_RE.search(pages)
    return int(m.group(1)) if m else None


def parse_range(pages: str) -> Tuple[int, int] | None:
    nums = [int(m) for m in _P_RE.findall(pages)]
    if not nums:
        return None
    return nums[0], nums[-1]
