"""Deterministic tokenizer — the engine's stand-in for jieba.

The reference tokenizes with jieba (``content_matcher.py:71-72``,
``ocr_engine.py:404``).  jieba is not available in this environment and a
dictionary segmenter is not reproducible across versions, so the engine
defines its own deterministic tokenization:

* ASCII alphanumeric runs -> one token each (lowercased by callers that
  need case-insensitivity);
* CJK runs -> overlapping character bigrams (the standard dictionary-free
  approximation for Chinese segmentation), plus the single char when a
  run has length 1.

All downstream semantics that the reference defines *over* tokens
(term-frequency cosine, set Jaccard, top-N keyword frequency) are kept
identical; only the segmentation differs, and the golden fixtures are
computed with this tokenizer.
"""

from __future__ import annotations

import re
from typing import List

# ASCII alnum runs or single CJK chars; CJK bigrams derived below.
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[一-鿿]+")

# SQL-equivalent pattern for ASCII-only corpora (used by oracle_sql):
ASCII_TOKEN_SQL_REGEX = "[A-Za-z0-9]+"


def tokenize(text: str) -> List[str]:
    """Split text into ASCII word tokens and CJK character bigrams."""
    out: List[str] = []
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if tok.isascii():
            out.append(tok)
        else:
            if len(tok) == 1:
                out.append(tok)
            else:
                out.extend(tok[i : i + 2] for i in range(len(tok) - 1))
    return out


def keyword_candidates(text: str) -> List[str]:
    """Tokens eligible as keywords: len >= 2 and not pure digits.

    Reference filter: ``ocr_engine.py:405-407``.
    """
    return [t for t in tokenize(text) if len(t) >= 2 and not t.isdigit()]


def top_keywords(text: str, top_n: int = 10) -> List[str]:
    """Top-N keyword candidates by frequency.

    Reference: ``ocr_engine.py:392-412`` uses ``Counter.most_common`` whose
    tie order is insertion order; we make the tie-break deterministic and
    SQL-expressible: (count desc, token asc).
    """
    counts: dict[str, int] = {}
    for t in keyword_candidates(text):
        counts[t] = counts.get(t, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [t for t, _ in ranked[:top_n]]
