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

_BULLET_RX = re.compile(r"(?:^|\n)[•\-*+]")
_NUMBERED_RX = re.compile(r"(?:^|\n)\d+[\.\)]")
_TABLE_ROW_RX = re.compile(r"(?:^|\n)[\w\s]+\|[\w\s]+\|")
_FORM_FIELD_RX = re.compile(r"(?:^|\n)[\w\s]+:")
_HEADER_RX = re.compile(r"(?:^|\n)[A-Z][A-Z\s]+(?:\n|$)")
_PARAGRAPH_RX = re.compile(r"\n\s*\n")
_FORMULA_RX = re.compile(r"[=+\-*/^]|sqrt|sin|cos|tan|log")


def detect_structure(text: str) -> str:
    bullets = len(_BULLET_RX.findall(text))
    numbered = len(_NUMBERED_RX.findall(text))
    # exact-semantics shortcuts: the table pattern requires two literal
    # '|' and the form pattern a literal ':', so texts without them
    # count 0 by construction. Without the check, `[\w\s]+` backtracks
    # quadratically over long punctuation-free runs (a 0.5 MB
    # pipe-free mega-doc took ~40 s per call; the reference's
    # identical regexes at :1225-1226 share the pathology — same
    # counts, linear time here)
    table_rows = len(_TABLE_ROW_RX.findall(text)) if "|" in text else 0
    form_fields = len(_FORM_FIELD_RX.findall(text)) if ":" in text else 0
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
