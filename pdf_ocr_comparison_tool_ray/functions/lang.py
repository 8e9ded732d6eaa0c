"""Heuristic language identification (text-analysis suite).

Stopword-hit scoring over tiny per-language stopword sets plus a CJK
character-ratio shortcut.  Deterministic, vectorizable, SQL-expressible
(the DuckDB oracle mirrors the same counts via regexp_extract_all).
"""

from __future__ import annotations

import re
from typing import Tuple

from ..config import LANG_STOPWORDS

_CJK_RE = re.compile(r"[一-鿿]")
_WORD_RE = re.compile(r"[a-z]+")

# per-language compiled word-boundary alternations, declaration order
_LANG_PATTERNS = [
    (lang, re.compile(r"\b(?:" + "|".join(words) + r")\b"))
    for lang, words in LANG_STOPWORDS.items()
]


def detect_language(text: str) -> Tuple[str, float]:
    """-> (lang, score).  score = stopword hits / word count (0 when unknown)."""
    lowered = text.lower()
    n_cjk = len(_CJK_RE.findall(lowered))
    if n_cjk >= 5 and n_cjk >= 0.2 * max(len(lowered), 1):
        return "zh", 1.0
    n_words = len(_WORD_RE.findall(lowered))
    if n_words == 0:
        return "unknown", 0.0
    best_lang, best_hits = "unknown", 0
    for lang, pat in _LANG_PATTERNS:
        hits = len(pat.findall(lowered))
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0:
        return "unknown", 0.0
    return best_lang, best_hits / n_words
