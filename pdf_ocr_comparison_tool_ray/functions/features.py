"""Regex feature extraction: dates, amounts, numbers/IDs.

Reference semantics: ``ocr_engine.py:325-345`` (pattern lists) and
``ocr_engine.py:351-373`` (per-pattern findall, set-dedup).  The reference
returns ``list(set(...))`` whose order is nondeterministic; we sort the
deduped matches so results are deterministic and SQL-comparable.
"""

from __future__ import annotations

import re
from typing import Dict, List

# Date patterns — ocr_engine.py:325-329
DATE_PATTERNS = [
    r"\d{4}[-/年]\d{1,2}[-/月]\d{1,2}[日]?",
    r"\d{4}\.\d{1,2}\.\d{1,2}",
    r"\d{4}年\d{1,2}月\d{1,2}日",
]

# Amount patterns — ocr_engine.py:332-337
AMOUNT_PATTERNS = [
    r"[¥￥]\s*[\d,]+\.?\d*",
    r"[\d,]+\.?\d*\s*[元万]",
    r"金额[：:]\s*[\d,]+\.?\d*",
    r"合计[：:]\s*[\d,]+\.?\d*",
]

# Number/ID patterns — ocr_engine.py:340-345
NUMBER_PATTERNS = [
    r"[A-Za-z]*\d{4,}",
    r"编号[：:]\s*\S+",
    r"合同号[：:]\s*\S+",
    r"发票号[：:]\s*\S+",
]

_DATE_RES = [re.compile(p) for p in DATE_PATTERNS]
_AMOUNT_RES = [re.compile(p) for p in AMOUNT_PATTERNS]
_NUMBER_RES = [re.compile(p) for p in NUMBER_PATTERNS]


def _extract(res: List[re.Pattern], text: str) -> List[str]:
    out: List[str] = []
    for r in res:
        out.extend(r.findall(text))
    return sorted(set(out))


def extract_dates(text: str) -> List[str]:
    return _extract(_DATE_RES, text)


def extract_amounts(text: str) -> List[str]:
    return _extract(_AMOUNT_RES, text)


def extract_numbers(text: str) -> List[str]:
    return _extract(_NUMBER_RES, text)


def extract_features(text: str) -> Dict[str, List[str]]:
    """Bundle of dates/amounts/numbers/keywords (ocr_engine.py:375-390)."""
    from .tokenize import top_keywords

    return {
        "dates": extract_dates(text),
        "amounts": extract_amounts(text),
        "numbers": extract_numbers(text),
        "keywords": top_keywords(text, 10),
    }
