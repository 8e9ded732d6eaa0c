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


# Gopher-rule thresholds (Rae et al. 2021 Table A1, re-centered on the
# synthetic corpus so every rule actually fires: percentiles probed at
# sf0.01 put ~9% below MIN_WORDS, ~8% above MAX_WORDS, ~12% under the
# stopword floor, ~9% over the dup-word cap, ~10% over the 2-gram cap).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MEAN_WLEN = 4.0
GOPHER_MAX_MEAN_WLEN = 5.0
GOPHER_MIN_STOP_RATIO = 0.02
GOPHER_MAX_DUP_FRAC = 0.65
GOPHER_MAX_TOP2_FRAC = 0.15


def gopher_verdict(sig: Dict[str, float], rep: Dict[str, float]) -> str:
    """First failing Gopher rule in fixed order, or '' to keep — the
    FineWeb reject-reason convention (attributable filtering beats a
    bare boolean when tuning a 100 TB curation run).  Every signal is a
    single division of exact integers, so the SQL replay is
    bit-identical and the threshold comparisons cannot drift."""
    if sig["n_words"] < GOPHER_MIN_WORDS:
        return "too_short"
    if sig["n_words"] > GOPHER_MAX_WORDS:
        return "too_long"
    if not (GOPHER_MIN_MEAN_WLEN <= sig["mean_word_len"] <= GOPHER_MAX_MEAN_WLEN):
        return "word_len"
    if sig["stopword_ratio"] < GOPHER_MIN_STOP_RATIO:
        return "few_stopwords"
    if rep["dup_word_frac"] > GOPHER_MAX_DUP_FRAC:
        return "dup_words"
    if rep["top2_char_frac"] > GOPHER_MAX_TOP2_FRAC:
        return "rep_2gram"
    return ""


_LOWER_TOKEN_RE = re.compile(r"[a-z0-9]+")


def repetition_signals(text: str) -> Dict[str, float]:
    """Gopher-style repetition signals (Rae et al. 2021 App. A1 adapted
    to the line-free corpus): duplicate-word fraction and the character
    mass of the most repeated word 2-gram.  NOTE the top-2-gram ratio
    counts OVERLAPPING occurrences, so it exceeds 1.0 on degenerate
    spam — it is a filter score, not a probability.  Shared by
    ``q_doc_repetition_stats`` (whose SQL oracle pins the exact
    arithmetic) and the curation job's gate."""
    from collections import Counter

    toks = _LOWER_TOKEN_RE.findall(text.lower())
    n = len(toks)
    d = len(set(toks))
    total_chars = sum(map(len, toks))
    if n >= 2:
        grams = Counter(zip(toks, toks[1:]))
        cov = max(c * (len(a) + len(b)) for (a, b), c in grams.items())
    else:
        cov = 0
    return {
        "n_words": n,
        "n_distinct": d,
        "dup_word_frac": float(n - d) / n if n else 0.0,
        "top2_char_frac": float(cov) / total_chars if total_chars else 0.0,
    }
