"""PII detection / redaction — a standard curation stage for
training-data pipelines (not present in the reference, which processes
scanned business documents; this generalizes its noise-scrub regex layer,
``ocr_engine.py`` debug-scrub, into content-safety scrubbing).

Patterns are written in the RE2-compatible subset (no lookarounds, no
backreferences) so the SAME pattern string runs under Python ``re`` and
DuckDB ``regexp_replace`` / ``regexp_extract_all`` — the oracle replays
the exact redaction.  Python compiles with ``re.ASCII`` (exported as
``PII_RE_FLAGS`` for callers that hand the raw patterns to pandas):
RE2's ``\\b`` is an ASCII word boundary, so without the flag a
non-ASCII letter adjacent to a digit run ('é555-123-4567') is a
boundary for RE2 but not for Unicode-default Python ``re``.

Semantics:
* ``redact(text)`` applies replacements in a FIXED order (email, phone,
  ssn, card); later patterns run over the already-redacted text, so an
  email that also looks like a phone is counted/redacted once as email.
* ``pii_counts(text)`` counts matches per kind on the ORIGINAL text
  (each kind independently) — counts are detection stats, not a replay
  of the sequential redaction.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

# (kind, RE2+re-compatible pattern, replacement token), applied in order.
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("card", r"\b[0-9]{16}\b", "<CARD>"),
]

PII_RE_FLAGS = re.ASCII

_COMPILED = [
    (kind, re.compile(pat, PII_RE_FLAGS), tok) for kind, pat, tok in PII_PATTERNS
]


def redact(text: str) -> str:
    """Sequentially replace every PII match with its kind token."""
    for _kind, pat, tok in _COMPILED:
        text = pat.sub(tok, text)
    return text


def pii_counts(text: str) -> Dict[str, int]:
    """Independent per-kind match counts on the original text."""
    return {kind: len(pat.findall(text)) for kind, pat, _tok in _COMPILED}
