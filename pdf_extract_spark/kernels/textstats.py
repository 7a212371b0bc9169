"""Text-analysis kernels for the training-data pipeline extras:
language ID (stopword/char-n-gram heuristic), quality scoring, token
counting, and rolling-hash document fingerprinting (shingle minima).

These extend the reference's capability set per the build brief (dedup /
quality ops a 100 TB training-data pipeline needs); all pure functions.
"""

from __future__ import annotations

import re

from .embed import fnv1a64

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# the package's shared English stopword list (summarize imports it too)
EN_STOPWORDS = frozenset(
    "the and of to in is it you that was for on are with as at be this have "
    "from or had by word but not what all were when your can said there use "
    "each which she how their".split())

# tiny deterministic stopword profiles for the 5 fixture languages
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": EN_STOPWORDS,
    "fr": frozenset("le la les de des du et un une est que qui dans pour sur avec ne pas au aux ce cette il elle nous vous ils sont été être plus mais ou donc car si".split()),
    "es": frozenset("el la los las de del y un una es que en por para con no se su al lo como más pero sus le ya o este sí porque esta entre cuando muy sin sobre".split()),
    "de": frozenset("der die das und von zu den dem ein eine ist nicht mit sich des auf für im als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie".split()),
}


def detect_language(text: str) -> str:
    """Heuristic language ID over {en,fr,es,de,zh}: CJK char ratio → zh,
    else argmax stopword hit-rate (ties resolve to the first language in
    the fixed probe order, i.e. en); zero stopword hits → 'und'."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / max(len(text), 1) > 0.05:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    best_lang, best_hits = "en", -1
    for lang in ("en", "fr", "es", "de"):  # fixed order ⇒ deterministic ties
        hits = sum(1 for w in words if w in _LANG_STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


def quality_score(text: str) -> float:
    """Composite [0,1] quality: length band, alpha ratio, mean word length
    band, stopword ratio. Deterministic arithmetic, documented weights."""
    if not text:
        return 0.0
    n = len(text)
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return 0.0
    length_ok = 1.0 if 200 <= n <= 100_000 else (n / 200.0 if n < 200 else 0.5)
    alpha = sum(ch.isalpha() or ch.isspace() for ch in text) / n
    mwl = sum(len(w) for w in words) / n_words
    mwl_ok = 1.0 if 3.0 <= mwl <= 10.0 else 0.5
    sw = sum(1 for w in words if w.lower() in _LANG_STOPWORDS["en"])
    sw_ratio = sw / n_words
    sw_ok = min(sw_ratio / 0.2, 1.0)
    score = 0.25 * min(length_ok, 1.0) + 0.35 * alpha + 0.2 * mwl_ok + 0.2 * sw_ok
    return round(score, 6)


def token_count(text: str) -> int:
    """Whitespace token count (reference's len-based heuristics analog)."""
    return len(text.split())


def shingles(text: str, k: int = 5) -> list[str]:
    """Word k-shingles of normalized text."""
    toks = text.lower().split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def rolling_fingerprint(text: str, k: int = 5, n_mins: int = 8) -> list[int]:
    """Document fingerprint: the n smallest FNV-1a hashes of word k-shingles
    (a winnowing-style sketch). Stable across runs/partitions."""
    hs = sorted({fnv1a64(s.encode("utf-8")) for s in shingles(text, k)})
    return hs[:n_mins]


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens using FNV-1a; the per-bit
    ±1 accumulation is numpy-vectorized (token count × 64 bit ops)."""
    toks = text.lower().split()
    if not toks:
        return 0
    import numpy as np

    hs = np.array([fnv1a64(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    acc = np.zeros(64, dtype=np.int64)
    # batch the n×64 bit matrix: O(batch·64) transient memory, not O(n·64)
    # (a million-token document would otherwise allocate ~1.5 GB)
    for lo in range(0, len(hs), 8192):
        bits = (hs[lo:lo + 8192, None] >> shifts) & np.uint64(1)
        acc += (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out_bits = np.nonzero(acc > 0)[0]
    return int(sum(1 << int(b) for b in out_bits))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
