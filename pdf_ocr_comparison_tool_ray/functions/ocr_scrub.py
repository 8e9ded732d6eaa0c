"""Second-engine output parsing and debug-noise scrubbing (M5/M6/F7).

Reference semantics, ``deepseek_ocr2_engine.py``:

* ``_parse_result`` (:269-291) — the grounding format: the model emits
  ``<|ref|>text<|/ref|><|det|>[[x1, y1, x2, y2]]<|/det|>\\n<fragment>``
  pairs — the literal word ``text`` sits between the ref markers and the
  recognized fragment FOLLOWS the closing det tag, running up to the
  next ``<|ref|>`` (or end of output).  Each pair is one positioned
  fragment, parsed into (text, bbox).  When no grounding pairs are
  present the output is treated as plain text.
* ``_extract_plain_text`` (:293-345) — plain-text fallback scrubbing:
  strip ``<|…|>`` markers and bbox literals, sweep debug noise
  (logger/telemetry lines, separator rules), drop lines containing any
  of the reference's case-insensitive filter keywords, drop lines
  shorter than 2 chars.

The mock second engine produces clean text, so both functions are exact
no-ops on the synthetic corpus (golden fixtures unchanged); a real
DeepSeek-style deployment flows its raw model output through this exact
path.
"""

from __future__ import annotations

import re
from typing import List, Tuple

# <|ref|>text<|/ref|><|det|>[[x1, y1, x2, y2]]<|/det|>\n<fragment>
# grounding pairs (deepseek_ocr2_engine.py:269-291).  The reference
# matches the literal word ``text`` between the ref markers; we accept
# any ref payload (``.*?``) — a strict superset, same captures.
_GROUNDING_RE = re.compile(
    r"<\|ref\|>.*?<\|/ref\|><\|det\|>\s*"
    r"\[\[\s*(?P<x1>\d+)\s*,\s*(?P<y1>\d+)\s*,\s*(?P<x2>\d+)\s*,\s*(?P<y2>\d+)\s*\]\]"
    r"\s*<\|/det\|>\s*\n?(?P<text>.+?)(?=<\|ref\|>|$)",
    re.DOTALL,
)

# plain-text scrub patterns (:293-345)
_MARKER_RE = re.compile(r"<\|[^|>]*\|>")
_BBOX_LITERAL_RE = re.compile(r"\[\[\s*\d+(?:\s*,\s*\d+){3}\s*\]\]")
_DEBUG_LINE_RES = [
    re.compile(r"^\s*(?:INFO|WARNING|DEBUG|ERROR|TRACE)\b"),
    re.compile(r"^\s*[=\-]{3,}\s*$"),
    re.compile(r"(?i)^\s*(?:image size|base size|crop mode|valid patches|tokens?)\s*[:=]"),
]
# The reference's case-insensitive filter_keywords (:318-322) plus the
# keyword content of its multi-line debug_patterns (:303-313) — each of
# those sweeps (``BASE:...PATCHES:``, ``torch.Size(...)``, ``The
# attention ...``, ``Setting ...``, ``... is deprecated``, ``Creating
# model:``, ``Model files``, ``Checking connectivity``) carries one of
# these substrings, so per-line keyword filtering subsumes the sweeps.
# Deliberate deviation: removal is line-granular (the whole noisy line
# drops instead of a mid-line slice), which removes strictly more noise
# and keeps the scrub idempotent (property-pinned).
_FILTER_KEYWORDS = (
    "attention",
    "token",  # also covers eos_token / pad_token
    "cache",
    "warning",
    "setting",
    "deprecated",
    "torch.",  # covers torch.size
    "creating model",
    "model files",
    "connectivity",
    "position_ids",
    "base:",
    "patches:",
    "no valid",
    "cuda",
)
_MIN_LINE_CHARS = 2
# span bbox columns are list<int32>; clamp raw model coordinates so one
# garbage pair (e.g. [[9999999999, ...]]) cannot fail the whole arrow
# batch downstream (the per-row quarantine wraps decode/parse, not the
# final pa.array construction)
_COORD_MAX = 2**31 - 1


def parse_grounded_fragments(output: str) -> List[Tuple[str, List[int]]]:
    """Model output -> ordered [(fragment_text, [x1, y1, x2, y2])].

    Fragment text is what follows ``<|/det|>`` up to the next ``<|ref|>``
    (reference :271-272) — NOT the ref-marker payload, which is the
    literal word ``text``.  Empty list when the output carries no
    grounding pairs — the caller then falls back to
    ``scrub_engine_output`` (the reference does the same: parse first,
    plain-text fallback)."""
    out: List[Tuple[str, List[int]]] = []
    for m in _GROUNDING_RE.finditer(output):
        text = m.group("text").strip()
        if not text:
            continue
        out.append(
            (
                text,
                [min(int(m.group(k)), _COORD_MAX) for k in ("x1", "y1", "x2", "y2")],
            )
        )
    return out


def scrub_engine_output(text: str) -> str:
    """Plain-text fallback: strip markers/bbox literals, drop debug,
    keyword-bearing and too-short lines; surviving lines re-join with
    newlines.

    The strip runs to a per-line FIXPOINT (the reference's single pass
    can leave behind a marker/bbox literal assembled from the halves of
    a nested one, e.g. ``<|a<|x|>b|>`` -> ``<|ab|>``); iterating removes
    strictly more noise and makes the scrub idempotent
    (property-pinned in test_properties.py)."""
    kept: List[str] = []
    for line in text.split("\n"):
        s = line
        while True:
            s2 = _BBOX_LITERAL_RE.sub("", _MARKER_RE.sub("", s))
            if s2 == s:
                break
            s = s2
        s = s.strip()
        if len(s) < _MIN_LINE_CHARS:
            continue
        if any(r.search(s) for r in _DEBUG_LINE_RES):
            continue
        low = s.lower()
        if any(k in low for k in _FILTER_KEYWORDS):
            continue
        kept.append(s)
    return "\n".join(kept)


def union_bbox(boxes: List[List[int]]) -> List[int]:
    """Bounding box of fragment boxes (page-level span geometry)."""
    if not boxes:
        return [0, 0, 0, 0]
    return [
        min(b[0] for b in boxes),
        min(b[1] for b in boxes),
        max(b[2] for b in boxes),
        max(b[3] for b in boxes),
    ]


def parse_engine_output(output: str) -> Tuple[str, List[int] | None]:
    """Full second-engine output path: grounding parse first, scrubbed
    plain text as fallback.  -> (page_text, bbox-or-None); bbox is the
    union of fragment boxes when grounding was present."""
    frags = parse_grounded_fragments(output)
    if frags:
        return "\n".join(t for t, _ in frags), union_bbox([b for _, b in frags])
    return scrub_engine_output(output), None
