"""Text normalization and content hashing.

Reference semantics: ``content_matcher.py:30-35`` — the exact-match /
exact-dedup key is ``md5(lowercase(text) with ALL whitespace removed)``;
``content_matcher.py:186-189`` — amounts are normalized by stripping
``[,，\\s]`` before index lookup.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable, List

_WS_RE = re.compile(r"\s+")
_AMOUNT_NORM_RE = re.compile(r"[,，\s]")


def normalize_text(text: str) -> str:
    """Lowercase and remove all whitespace (content_matcher.py:34)."""
    return _WS_RE.sub("", text.lower())


def text_hash(text: str) -> str:
    """md5 hexdigest of the normalized text (content_matcher.py:35)."""
    return hashlib.md5(normalize_text(text).encode()).hexdigest()


def text_hash_many(texts: Iterable[str]) -> List[str]:
    """Vectorized-ish batch form for map_batches bodies (md5 is C-speed)."""
    sub = _WS_RE.sub
    md5 = hashlib.md5
    return [md5(sub("", t.lower()).encode()).hexdigest() for t in texts]


def normalize_amount(amount: str) -> str:
    """Strip commas (ASCII + fullwidth) and whitespace (content_matcher.py:188)."""
    return _AMOUNT_NORM_RE.sub("", amount)
