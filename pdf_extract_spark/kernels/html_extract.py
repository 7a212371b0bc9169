"""Main-content extraction from HTML via DOM-block heuristics.

Brand-new implementation of the *capability* of the reference's text
extraction stage (reference: /root/reference/modules/tools.py:27-50 extracts
text from PDFs; the north rule generalizes this to Common-Crawl-style HTML
pages with boilerplate stripping).  Strategy is the classical
text-density / link-density block classification (public knowledge:
Kohlschuetter et al., "Boilerplate Detection Using Shallow Text Features",
WSDM 2010), implemented from scratch on top of stdlib ``html.parser``.

Pure function of the input bytes — no wall clock, no randomness, no
environment reads — so the single-node run of this module IS the golden
oracle for the distributed pipeline (byte-identical text per url).
"""

from __future__ import annotations

from html.parser import HTMLParser

# Tags whose entire subtree is boilerplate by construction.
_DROP_SUBTREE = frozenset(
    {"script", "style", "noscript", "nav", "header", "footer", "aside",
     "form", "iframe", "svg", "template", "button", "select", "option"}
)

# Tags that open a new text block (block-level elements).
_BLOCK_TAGS = frozenset(
    {"p", "div", "article", "section", "main", "li", "td", "th", "tr",
     "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "table",
     "ul", "ol", "dl", "dd", "dt", "figure", "figcaption", "body"}
)

# void elements never get close tags
_VOID = frozenset({"br", "hr", "img", "input", "meta", "link", "area", "base",
                   "col", "embed", "source", "track", "wbr"})

# Heuristic thresholds (fixed constants of the kernel's spec).
MAX_LINK_DENSITY = 0.35   # blocks with >35% of chars inside <a> are boilerplate
MIN_BLOCK_CHARS = 25      # shorter blocks are dropped unless headline-like
MIN_WORDS = 4


class _BlockCollector(HTMLParser):
    """Tokenize HTML into text blocks with per-block link-char counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int, str]] = []  # (text, total, linked, tag)
        self._drop_depth = 0
        self._a_depth = 0
        self._parts: list[str] = []
        self._linked = 0
        self._block_tag = "body"
        self._heading = False

    def _flush(self) -> None:
        raw = "".join(self._parts)
        text = " ".join(raw.split())
        if text:
            self.blocks.append((text, len(text), self._linked, self._block_tag))
        self._parts = []
        self._linked = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_SUBTREE:
            self._flush()
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            self._block_tag = tag
        elif tag == "br":
            self._parts.append(" ")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "br" and not self._drop_depth:
            self._parts.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREE:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "a" and self._a_depth:
            self._a_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()
            self._block_tag = "body"

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._parts.append(data)
        if self._a_depth:
            self._linked += len("".join(data.split()))

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


def extract_main_text(html: str) -> str:
    """Strip boilerplate, return main content joined by blank lines.

    Classification per block: drop if link density > MAX_LINK_DENSITY or the
    block is too short to be content (unless it is a heading adjacent to a
    kept content block, which we keep for structure).
    """
    parser = _BlockCollector()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # malformed markup: fall back to whatever blocks were collected
        parser._flush()

    blocks = parser.blocks
    kept_flags = []
    for text, total, linked, tag in blocks:
        stripped_len = len("".join(text.split()))
        density = (linked / stripped_len) if stripped_len else 1.0
        is_content = (
            density <= MAX_LINK_DENSITY
            and total >= MIN_BLOCK_CHARS
            and len(text.split()) >= MIN_WORDS
        )
        kept_flags.append(is_content)

    # second pass: keep short headings that introduce kept content
    out: list[str] = []
    for i, (text, total, linked, tag) in enumerate(blocks):
        if kept_flags[i]:
            out.append(text)
        elif tag in _HEADINGS and linked == 0:
            nxt = next((j for j in range(i + 1, len(blocks)) if blocks[j][1] > 0), None)
            if nxt is not None and kept_flags[nxt]:
                out.append(text)
    return "\n\n".join(out).strip()


def decode_html_bytes(payload: bytes) -> tuple[str | None, str | None]:
    """(text, error) from raw HTML bytes. Strict UTF-8; bad bytes quarantine."""
    if not payload:
        return None, "empty_payload"
    try:
        html = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None, "invalid_utf8"
    text = extract_main_text(html)
    if not text:
        return None, "no_main_content"
    return text, None
