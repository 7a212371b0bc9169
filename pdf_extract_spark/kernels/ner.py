"""Deterministic rule-based entity extraction.

Hermetic replacement for the reference's LLM entity stage
(/root/reference/modules/agents.py:171-273): same output contract — a
fixed-key struct of four string lists {names, dates, locations, numbers}
(agents.py:244,477) — produced by regex/heuristic rules instead of an LLM.
Sanitation matches agents.py:354-358 (strings only, len(strip) > 2) and
dedup+canonical sort replaces the reference's order-unstable ``list(set())``
(agents.py:604-608; SURVEY.md A3 mandates the sort for byte-determinism).
"""

from __future__ import annotations

import re

_DATE_RE = re.compile(
    r"\b(?:\d{4}-\d{2}-\d{2}"
    r"|\d{1,2}/\d{1,2}/\d{2,4}"
    r"|(?:January|February|March|April|May|June|July|August|September|"
    r"October|November|December)\s+\d{1,2},?\s+\d{4}"
    r"|\d{4})\b"
)
_NUMBER_RE = re.compile(r"\b\d+(?:[.,]\d+)*%?")
_CAP_SEQ_RE = re.compile(r"\b(?:[A-Z][a-z]+)(?:\s+[A-Z][a-z]+)+\b")
_LOC_CUE_RE = re.compile(r"\b(?:in|at|from|near|to)\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)")

MIN_ENTITY_LEN = 2  # keep len(strip) > 2 (agents.py:357)


def _sanitize(items: list[str]) -> list[str]:
    seen = []
    for it in items:
        s = it.strip()
        if len(s) > MIN_ENTITY_LEN and s not in seen:
            seen.append(s)
    return sorted(seen)


def extract_entities(text: str) -> dict[str, list[str]]:
    """Four-category entity struct from rules; sorted-distinct values."""
    dates = _DATE_RE.findall(text)
    numbers = [n for n in _NUMBER_RE.findall(text)
               if not _DATE_RE.fullmatch(n)]
    locations = _LOC_CUE_RE.findall(text)
    loc_set = set(locations)
    names = [m for m in _CAP_SEQ_RE.findall(text) if m not in loc_set]
    return {
        "names": _sanitize(names),
        "dates": _sanitize(dates),
        "locations": _sanitize(locations),
        "numbers": _sanitize(numbers),
    }


def entity_count(entities: dict[str, list[str]]) -> int:
    """sum(len(v)) — reference agents.py:366,509."""
    return sum(len(v) for v in entities.values())
