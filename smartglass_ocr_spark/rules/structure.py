"""Document-structure detection (A4 + decision tree in SURVEY.md §2.4).

Faithful re-expression of ``detect_document_structure``
(ref lib/text_processing.py:1212-1259): seven regex feature counts +
short-staggered-line multi-column test, then a fixed decision ladder.
Output domain mirrors ``DocumentStructure`` (ref lib/model.py:66-77):
multi_column, table, bullet_points, form, headers_and_content,
paragraphs, scientific, plain_text, mixed.
"""

from __future__ import annotations

import re
from bisect import bisect_left

_BULLET_RX = re.compile(r"(?:^|\n)[•\-*+]")
_NUMBERED_RX = re.compile(r"(?:^|\n)\d+[\.\)]")
_TABLE_ROW_RX = re.compile(r"(?:^|\n)[\w\s]+\|[\w\s]+\|")
_FORM_FIELD_RX = re.compile(r"(?:^|\n)[\w\s]+:")
_HEADER_RX = re.compile(r"(?:^|\n)[A-Z][A-Z\s]+(?:\n|$)")
_PARAGRAPH_RX = re.compile(r"\n\s*\n")
_FORMULA_RX = re.compile(r"[=+\-*/^]|sqrt|sin|cos|tan|log")
_NON_WS_WORD_RX = re.compile(r"[^\w\s]")  # the exact [\w\s] complement


def _table_and_form_counts(text: str) -> tuple[int, int]:
    """Linear-time exact equivalents of
    ``len(_TABLE_ROW_RX.findall(text))`` and
    ``len(_FORM_FIELD_RX.findall(text))`` (fuzz-pinned in tests).

    The backtracking regexes are quadratic on long ``[\\w\\s]`` runs
    (the reference's own patterns at :1225-1226 — a 0.5 MB doc with
    one stray colon took ~26 s). But since a ``[\\w\\s]+`` run can
    never contain the terminator it is looking for, each anchor's
    attempt is fully determined by the FIRST non-[\\w\\s] character
    at-or-after it: match iff that stop is the required literal and
    the run before it is non-empty. One regex pass collects the stop
    positions; anchors (string start + each newline) are then checked
    in O(log stops) each, honoring findall's non-overlapping scan by
    jumping past each match."""
    stops = [m.start() for m in _NON_WS_WORD_RX.finditer(text)]
    n = len(text)

    def next_stop(i: int) -> int:
        j = bisect_left(stops, i)
        return stops[j] if j < len(stops) else n

    def count(check) -> int:
        c = 0
        scan = 0
        # anchor at position 0 (the ^ branch), then at every '\n'
        anchor_run_start = 0
        while True:
            if anchor_run_start is None:
                nl = text.find("\n", scan)
                if nl == -1:
                    break
                anchor_run_start = nl + 1
                scan = nl + 1
            end = check(anchor_run_start)
            if end is not None:
                c += 1
                scan = end + 1
            anchor_run_start = None
        return c

    def form_check(r0: int) -> int | None:
        e = next_stop(r0)
        if e > r0 and e < n and text[e] == ":":
            return e
        return None

    def table_check(r0: int) -> int | None:
        e1 = next_stop(r0)
        if not (e1 > r0 and e1 < n and text[e1] == "|"):
            return None
        r1 = e1 + 1
        e2 = next_stop(r1)
        if e2 > r1 and e2 < n and text[e2] == "|":
            return e2
        return None

    return count(table_check), count(form_check)


def detect_structure(text: str) -> str:
    bullets = len(_BULLET_RX.findall(text))
    numbered = len(_NUMBERED_RX.findall(text))
    table_rows, form_fields = _table_and_form_counts(text)
    headers = len(_HEADER_RX.findall(text))
    paragraphs = len(_PARAGRAPH_RX.findall(text))
    formulas = len(_FORMULA_RX.findall(text))

    lines = text.split("\n")
    if len(lines) > 10:
        short = sum(1 for ln in lines if 5 < len(ln.strip()) < 40)
        if short > len(lines) * 0.6:
            return "multi_column"

    if table_rows > 5:
        return "table"
    if bullets + numbered > 5:
        return "bullet_points"
    if form_fields > 5:
        return "form"
    if headers > 2 and paragraphs > 1:
        return "headers_and_content"
    if paragraphs > 1:
        return "paragraphs"
    if formulas > 3:
        return "scientific"
    if len(text.strip()) < 100:
        return "plain_text"
    return "mixed"
