"""Extractive summary + key insights (A1-A3, A11 in SURVEY.md §2.4).

Faithful re-expression of the reference's regex (non-NLTK) paths —
the deterministic ones suitable for a distributed engine (no model
downloads at executor import, SURVEY.md §7.4):

- ``generate_summary``    -> ``_generate_extractive_summary_regex``
  (ref lib/text_processing.py:2033-2130) with the <100-char
  short-circuit of ``generate_summary`` (ref :1871-1872).
- ``extract_key_insights`` -> regex branch
  (ref lib/text_processing.py:2316-2347).
"""

from __future__ import annotations

import re

_SENT_SPLIT_RX = re.compile(r"(?<=[.!?])\s+")
_WORD_RX = re.compile(r"\b[a-zA-Z]+\b")

# ref lib/text_processing.py:2052-2055
SIMPLE_STOPWORDS = frozenset(
    {
        "a", "an", "the", "and", "or", "but", "if", "because", "as", "what",
        "when", "where", "how", "which", "who", "whom", "this", "that",
        "these", "those", "then", "just", "so", "than", "such", "both",
        "through", "about", "for", "is", "of", "while", "during", "to",
        "from",
    }
)
_KEY_TERMS = (
    "summary", "conclusion", "result", "important", "significant",
    "key", "main", "primary", "critical", "essential", "crucial",
)
_INSIGHT_PATTERNS = tuple(
    re.compile(p, re.IGNORECASE)
    for p in (
        r"(?:key|main|important|significant|critical).{0,20}(?:point|fact|finding|conclusion)",
        r"(?:in\s+summary|to\s+summarize|in\s+conclusion|concluding|therefore)",
        r"(?:must|should|need to|have to)",
        r"increase|decrease|improve|reduce|enhance|cause",
    )
)


def split_sentences(text: str) -> list[str]:
    return _SENT_SPLIT_RX.split(text)


def generate_summary(text: str, max_length: int = 200, style: str = "concise") -> str:
    if not text:
        return ""
    if len(text) < 100:
        return text[:max_length]

    sentences = split_sentences(text)

    word_counts: dict[str, int] = {}
    for sentence in sentences:
        for w in _WORD_RX.findall(sentence.lower()):
            if w not in SIMPLE_STOPWORDS:
                word_counts[w] = word_counts.get(w, 0) + 1

    scores: dict[int, float] = {}
    for i, sentence in enumerate(sentences):
        if len(sentence.strip()) < 10:
            continue
        score = 0.0
        if i == 0:
            score += 5
        elif i == len(sentences) - 1:
            score += 3
        elif i < len(sentences) * 0.1:
            score += 2
        words = _WORD_RX.findall(sentence.lower())
        if words:
            score += (
                sum(word_counts.get(w, 0) for w in words if w not in SIMPLE_STOPWORDS)
                / len(words)
            )
        lower = sentence.lower()
        if any(term in lower for term in _KEY_TERMS):
            score += 3
        scores[i] = score

    avg_len = sum(len(s) for s in sentences) / len(sentences) if sentences else 20
    target = max(1, int(max_length / avg_len))
    if style == "detailed":
        target = min(int(target * 1.5), len(sentences))
    elif style == "concise":
        target = max(1, int(target * 0.7))

    # top-k by score (stable: Python sort preserves index order on
    # ties exactly like the reference's sorted(..., reverse=True))
    top = sorted(scores.items(), key=lambda kv: kv[1], reverse=True)[:target]
    chosen = sorted(idx for idx, _ in top)
    summary = " ".join(sentences[i] for i in chosen if i < len(sentences))
    if len(summary) > max_length:
        summary = summary[: max_length - 3] + "..."
    return summary


def extract_key_insights(text: str) -> list[str]:
    insights: list[str] = []
    sentences = split_sentences(text)
    for sentence in sentences:
        if any(rx.search(sentence) for rx in _INSIGHT_PATTERNS):
            insights.append(sentence)
        if len(insights) >= 5:
            break
    if len(insights) < 2 and len(sentences) > 2:
        if sentences[0] not in insights:
            insights.append(sentences[0])
        if sentences[-1] not in insights and sentences[-1] != sentences[0]:
            insights.append(sentences[-1])
    return insights[:5]
