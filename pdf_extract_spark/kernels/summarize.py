"""Deterministic extractive summarization.

Hermetic replacement for the reference's LLM summary stages
(/root/reference/modules/agents.py:152-169 per-chunk ≤100-word summary;
:412-436,611-644 hierarchical partial+final combine with a 150k-token group
budget, token ≈ len//3). Sentence scoring by document-level word frequency
(classic Luhn-style extraction), ties broken by sentence position — pure
function of the text.
"""

from __future__ import annotations

import re

WORD_BUDGET = 100          # agents.py:169 "≤100 words"
GROUP_TOKEN_BUDGET = 150_000  # agents.py:413-416
_SENT_RE = re.compile(r"[^.!?]+[.!?]?")
_WORD_RE = re.compile(r"[A-Za-z']+")

# the kernels package's single English stopword list (textstats also keys
# its language profiles off it) — one definition, no drift between kernels
from .textstats import EN_STOPWORDS as _STOPWORDS  # noqa: E402


def token_estimate(text: str) -> int:
    """Reference token heuristic: len(text) // 3 (agents.py:412-414)."""
    return len(text) // 3


def split_sentences(text: str) -> list[str]:
    return [s.strip() for s in _SENT_RE.findall(text) if s.strip()]


def summarize_extractive(text: str, word_budget: int = WORD_BUDGET) -> str:
    """Top-scoring sentences (word-frequency score, normalized by length),
    emitted in original order, until the word budget is reached."""
    sents = split_sentences(text)
    if not sents:
        return ""
    freq: dict[str, int] = {}
    for w in _WORD_RE.findall(text.lower()):
        if w not in _STOPWORDS:
            freq[w] = freq.get(w, 0) + 1
    scored = []
    for pos, s in enumerate(sents):
        words = [w for w in _WORD_RE.findall(s.lower()) if w not in _STOPWORDS]
        score = (sum(freq.get(w, 0) for w in words) / len(words)) if words else 0.0
        scored.append((-score, pos, s))
    scored.sort()
    chosen: list[int] = []
    used = 0
    for _, pos, s in scored:
        n = len(s.split())
        if used + n > word_budget and chosen:
            continue
        chosen.append(pos)
        used += n
        if used >= word_budget:
            break
    return " ".join(sents[p] for p in sorted(chosen))


def pack_groups(summaries: list[str],
                budget: int = GROUP_TOKEN_BUDGET) -> list[list[str]]:
    """Greedy packing of summaries into ≤budget-token groups (agents.py:412-436)."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_tokens = 0
    for s in summaries:
        t = token_estimate(s)
        if cur and cur_tokens + t > budget:
            groups.append(cur)
            cur, cur_tokens = [], 0
        cur.append(s)
        cur_tokens += t
    if cur:
        groups.append(cur)
    return groups


def combine_summaries(summaries: list[str],
                      word_budget: int = WORD_BUDGET) -> str:
    """Hierarchical final combine: summarize the concatenation of per-group
    extractive summaries (agents.py:621-644's deterministic analog)."""
    groups = pack_groups(summaries)
    partials = [summarize_extractive(" ".join(g), word_budget) for g in groups]
    if len(partials) == 1:
        return partials[0]
    return summarize_extractive(" ".join(partials), word_budget)
