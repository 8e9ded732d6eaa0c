"""Native text-layer parse for ``kind="pdf"`` spans.

The fast extraction route, analogous to the reference's PyMuPDF
``page.get_text()`` path (``pdf_processor.py:176-256``): reconstruct
reading order from positioned blocks/lines rather than trusting the
serialization order.

Serialization format (produced by the synthetic generator; stands in for
a real PDF text layer):

    %PDFTEXT 1.0
    B <block_id> <x> <y>
    L <y> <text...>
    L <y> <text...>
    B ...

Reading order (PyMuPDF-style): blocks sorted by (y asc, x asc), lines
within a block by y asc; lines joined with a space, blocks joined with a
space (the synthetic layer carries single-space-joined token text, so
a faithful parse reproduces the original text exactly).
"""

from __future__ import annotations

from typing import List, Tuple

MAGIC = "%PDFTEXT 1.0"


def serialize_text_layer(text: str, block_order: List[int] | None = None,
                         words_per_line: int = 8, lines_per_block: int = 3) -> str:
    """Turn space-joined text into the positioned serialization.

    ``block_order`` optionally permutes the *physical* emission order of
    blocks (coordinates still encode logical order) so tests prove the
    parser reorders by position, not by appearance.
    """
    words = text.split(" ") if text else []
    lines = [" ".join(words[i : i + words_per_line]) for i in range(0, len(words), words_per_line)]
    blocks: List[List[Tuple[int, str]]] = []
    for bstart in range(0, len(lines), lines_per_block):
        blines = lines[bstart : bstart + lines_per_block]
        blocks.append([(bstart + j, ln) for j, ln in enumerate(blines)])
    order = block_order if block_order is not None else list(range(len(blocks)))
    out = [MAGIC]
    for phys_idx in order:
        if phys_idx >= len(blocks):
            continue
        blines = blocks[phys_idx]
        block_y = blines[0][0] * 20
        out.append(f"B {phys_idx} 72 {block_y}")
        for line_no, ln in blines:
            out.append(f"L {line_no * 20} {ln}")
    return "\n".join(out)


def text_layer_bbox(payload: str) -> List[int]:
    """Geometry of the parsed layer: the union box of its positioned
    blocks/lines as the unified ``[x1, y1, x2, y2]`` 4-tuple (SURVEY
    §7.6).  Width is 6pt/char of the widest line; a non-layer payload
    has no geometry -> [0, 0, 0, 0]."""
    if not payload.startswith(MAGIC):
        return [0, 0, 0, 0]
    min_x, min_y, max_y, max_w = None, None, None, 0
    for raw in payload.split("\n")[1:]:
        if raw.startswith("B "):
            parts = raw.split(" ")
            x = int(parts[2])
            min_x = x if min_x is None else min(min_x, x)
        elif raw.startswith("L "):
            _, y_str, *rest = raw.split(" ")
            y = int(y_str)
            min_y = y if min_y is None else min(min_y, y)
            max_y = y if max_y is None else max(max_y, y)
            max_w = max(max_w, len(" ".join(rest)))
    if min_x is None or min_y is None:
        return [0, 0, 0, 0]
    return [min_x, min_y, min_x + 6 * max_w, max_y + 20]


def parse_text_layer(payload: str) -> str:
    """Reconstruct reading-order text from the serialization."""
    if not payload.startswith(MAGIC):
        # not a recognized text layer -> treat entire payload as raw text
        return payload
    blocks: List[Tuple[int, int, List[Tuple[int, str]]]] = []  # (y, x, lines)
    cur: List[Tuple[int, str]] | None = None
    for raw in payload.split("\n")[1:]:
        if raw.startswith("B "):
            parts = raw.split(" ")
            x, y = int(parts[2]), int(parts[3])
            cur = []
            blocks.append((y, x, cur))
        elif raw.startswith("L ") and cur is not None:
            _, y_str, *rest = raw.split(" ")
            cur.append((int(y_str), " ".join(rest)))
    blocks.sort(key=lambda b: (b[0], b[1]))
    parts: List[str] = []
    for _, _, lines in blocks:
        lines.sort(key=lambda l: l[0])
        parts.extend(t for _, t in lines)
    return " ".join(parts)
