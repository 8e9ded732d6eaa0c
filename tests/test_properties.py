"""Hypothesis property tests for the pure function layer.

No Ray session needed — these pin algebraic invariants of the
normalization, page-range and second-engine-output functions that the
distributed stages build on (the same strategy as
test_reassembly_property.py for the reassembly kernel).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_ocr_comparison_tool_ray.functions.ocr_scrub import (
    parse_engine_output,
    parse_grounded_fragments,
    scrub_engine_output,
    union_bbox,
)
from pdf_ocr_comparison_tool_ray.functions.pagerange import (
    format_range,
    parse_first,
    parse_range,
)
from pdf_ocr_comparison_tool_ray.functions.textnorm import (
    normalize_amount,
    normalize_text,
    text_hash,
    text_hash_many,
)

# ---------------------------------------------------------------------------
# textnorm
# ---------------------------------------------------------------------------


@given(st.text(max_size=200))
def test_normalize_text_idempotent_and_ws_free(t):
    n = normalize_text(t)
    assert normalize_text(n) == n
    assert not re.search(r"\s", n)
    assert n == n.lower()


@given(st.text(max_size=100), st.sampled_from([" ", "\t", "\n", "  "]))
def test_text_hash_whitespace_invariant(t, ws):
    """The dedup key must not see whitespace: injecting/padding whitespace
    anywhere never changes the hash (content_matcher.py:30-35 semantics)."""
    padded = ws + t.replace(" ", ws) + ws
    assert text_hash(padded) == text_hash(t)


@given(st.lists(st.text(max_size=50), max_size=20))
def test_text_hash_many_matches_scalar(ts):
    assert text_hash_many(ts) == [text_hash(t) for t in ts]


@given(st.text(alphabet="0123456789,，. \t", max_size=40))
def test_normalize_amount_strips_separators(a):
    n = normalize_amount(a)
    assert "," not in n and "，" not in n and not re.search(r"\s", n)
    # digits and dots survive in order
    assert [c for c in n] == [c for c in a if c not in ",， \t"]


# ---------------------------------------------------------------------------
# pagerange
# ---------------------------------------------------------------------------


@given(st.integers(0, 10**6), st.integers(0, 10**6))
def test_pagerange_roundtrip(start, delta):
    end = start + (delta % 1000)
    s = format_range(start, end)
    assert parse_range(s) == (start + 1, end + 1)
    assert parse_first(s) == start + 1


@given(st.text(max_size=50))
def test_parse_range_total(pages):
    """parse_range never raises and agrees with parse_first on any input."""
    r = parse_range(pages)
    f = parse_first(pages)
    assert (r is None) == (f is None)
    if r is not None:
        assert r[0] == f


# ---------------------------------------------------------------------------
# ocr_scrub (second-engine output path)
# ---------------------------------------------------------------------------

_frag_text = st.text(
    alphabet=st.characters(blacklist_characters="<>[]|\n", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip())

# includes > 2^31 coordinates: the parser clamps to int32 range so one
# garbage pair can't fail the arrow bbox column downstream
_box = st.tuples(*[st.integers(0, 10**12)] * 4)
_I32MAX = 2**31 - 1


@given(st.lists(st.tuples(_frag_text, _box), min_size=1, max_size=8))
def test_grounding_parse_roundtrip(frags):
    """Rendering fragments into the <|ref|>...<|det|> grounding format and
    parsing back recovers every fragment text (stripped) and box in order."""
    # reference grounding shape (deepseek_ocr2_engine.py:271-272):
    # literal 'text' in the ref markers, fragment after the det tag
    rendered = "\n".join(
        f"<|ref|>text<|/ref|><|det|>[[{x1}, {y1}, {x2}, {y2}]]<|/det|>\n{t}"
        for t, (x1, y1, x2, y2) in frags
    )
    clamped = [tuple(min(c, _I32MAX) for c in b) for _, b in frags]
    got = parse_grounded_fragments(rendered)
    assert [g[0] for g in got] == [t.strip() for t, _ in frags]
    assert [tuple(g[1]) for g in got] == clamped
    assert all(all(0 <= c <= _I32MAX for c in g[1]) for g in got)

    text, bbox = parse_engine_output(rendered)
    assert text == "\n".join(t.strip() for t, _ in frags)
    assert bbox == union_bbox([list(b) for b in clamped])


@given(st.lists(_box, min_size=1, max_size=10))
def test_union_bbox_contains_all(boxes):
    bl = [list(b) for b in boxes]
    u = union_bbox(bl)
    for b in bl:
        assert u[0] <= b[0] and u[1] <= b[1] and u[2] >= b[2] and u[3] >= b[3]
    # idempotent: union of the union is itself
    assert union_bbox([u]) == u


@given(st.text(max_size=300))
@settings(max_examples=200)
def test_scrub_output_clean(t):
    """Scrubbed text never retains markers, bbox literals, debug lines or
    sub-minimum lines, and scrubbing is idempotent."""
    s = scrub_engine_output(t)
    for line in s.split("\n") if s else []:
        assert len(line) >= 2
        assert not re.match(r"^\s*(INFO|WARNING|DEBUG|ERROR|TRACE)\b", line)
        assert not re.fullmatch(r"\s*[=\-]{3,}\s*", line)
        assert not re.search(r"\[\[\s*\d+(?:\s*,\s*\d+){3}\s*\]\]", line)
        assert not re.search(r"<\|[^|>]*\|>", line)
    assert scrub_engine_output(s) == s


@given(st.text(max_size=200))
def test_parse_engine_output_total(t):
    """Total on arbitrary input: returns (str, list-of-4-or-None)."""
    text, bbox = parse_engine_output(t)
    assert isinstance(text, str)
    assert bbox is None or (isinstance(bbox, list) and len(bbox) == 4)
