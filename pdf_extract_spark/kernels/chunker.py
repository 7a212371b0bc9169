"""Recursive character text splitter (deterministic, from-scratch).

Re-implements the *semantics* the reference gets from LangChain's
``RecursiveCharacterTextSplitter(chunk_size=2000, chunk_overlap=200,
length_function=len, is_separator_regex=False)``
(/root/reference/modules/tools.py:76-82): recursive split on
["\\n\\n", "\\n", " ", ""], greedy repack of pieces to ≤ chunk_size with
chunk_overlap carried between adjacent chunks. Public-knowledge algorithm,
written fresh.
"""

from __future__ import annotations

DEFAULT_CHUNK_SIZE = 2000   # tools.py:53
DEFAULT_OVERLAP = 200
SEPARATORS = ["\n\n", "\n", " ", ""]

# chunk validity bounds — reference check_chunks (tools.py:18-19)
MIN_CHUNK_LEN = 500
MAX_CHUNK_LEN = 3000
MAX_CHUNKS = 1000


def _split_on(text: str, sep: str) -> list[str]:
    """Split keeping the separator attached to the preceding piece."""
    if sep == "":
        return list(text)
    parts = text.split(sep)
    out = []
    for i, p in enumerate(parts):
        out.append(p + sep if i < len(parts) - 1 else p)
    return [p for p in out if p]


def _recursive_pieces(text: str, size: int, seps: list[str]) -> list[str]:
    """Break text into pieces each ≤ size, preferring coarser separators."""
    if len(text) <= size:
        return [text] if text else []
    for i, sep in enumerate(seps):
        parts = _split_on(text, sep)
        if len(parts) > 1 or sep == "":
            pieces: list[str] = []
            for p in parts:
                if len(p) <= size:
                    pieces.append(p)
                else:
                    pieces.extend(_recursive_pieces(p, size, seps[i + 1:] or [""]))
            return pieces
    return [text]


def split_text(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_OVERLAP,
) -> list[str]:
    """Greedy repack of recursive pieces into chunks ≤ chunk_size with
    chunk_overlap chars of tail carried into the next chunk."""
    if not text:
        return []
    pieces = _recursive_pieces(text, chunk_size, SEPARATORS)
    chunks: list[str] = []
    cur: list[str] = []
    start = 0  # logical head of cur (two-pointer: no O(n) pop(0) shifts)
    cur_len = 0
    for piece in pieces:
        if cur_len and cur_len + len(piece) > chunk_size:
            chunk = "".join(cur[start:]).strip()
            if chunk:
                chunks.append(chunk)
            # carry overlap: drop head pieces while the tail exceeds the
            # overlap OR would still not fit with the incoming piece (the
            # second clause keeps every emitted chunk ≤ chunk_size)
            while start < len(cur) and cur_len > 0 and (
                cur_len > chunk_overlap
                or cur_len + len(piece) > chunk_size
            ):
                cur_len -= len(cur[start])
                start += 1
            if start > 4096:  # amortized head compaction
                cur = cur[start:]
                start = 0
        cur.append(piece)
        cur_len += len(piece)
    tail = "".join(cur[start:]).strip()
    if tail:
        chunks.append(tail)
    return chunks


def check_chunks(chunks: list[str],
                 min_len: int = MIN_CHUNK_LEN,
                 max_len: int = MAX_CHUNK_LEN,
                 max_chunks: int = MAX_CHUNKS) -> bool:
    """Reference chunk-validity gate (tools.py:18-19, routers.py:26)."""
    return (
        len(chunks) < max_chunks
        and all(min_len <= len(c) <= max_len and c.strip() for c in chunks)
    )
