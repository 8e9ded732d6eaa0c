"""Document quality scoring (text-analysis suite).

Length / punctuation / stopword / digit ratios — the standard cheap
quality signals a training-data pipeline filters on (C4/Gopher-style
rules, kept simple and fully SQL-expressible for the DuckDB oracle).
"""

from __future__ import annotations

import re
from typing import Dict

_EN_STOP = {"the", "and", "of", "to", "a", "in", "is", "for", "with", "on"}
_WORD_RE = re.compile(r"[A-Za-z0-9]+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_DIGIT_RE = re.compile(r"[0-9]")


def quality_signals(text: str) -> Dict[str, float]:
    n_chars = len(text)
    words = _WORD_RE.findall(text)
    n_words = len(words)
    n_stop = sum(1 for w in words if w.lower() in _EN_STOP)
    n_punct = len(_PUNCT_RE.findall(text))
    n_digit = len(_DIGIT_RE.findall(text))
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": mean_word_len,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "digit_ratio": (n_digit / n_chars) if n_chars else 0.0,
    }


def quality_ok(sig: Dict[str, float], min_words: int = 10,
               max_punct_ratio: float = 0.3, min_mean_word_len: float = 2.0,
               max_mean_word_len: float = 12.0) -> bool:
    """Gopher-style keep/drop verdict over the signals."""
    return (
        sig["n_words"] >= min_words
        and sig["punct_ratio"] <= max_punct_ratio
        and min_mean_word_len <= sig["mean_word_len"] <= max_mean_word_len
    )
