"""PDF text extraction: content-stream parse + pdfminer-style layout analysis.

Re-implements, from scratch and from the public PDF text model, the
*capability* of the reference's ``extract_pdf`` tool
(/root/reference/modules/tools.py:27-50: open, iterate pages, per-page text,
ordered concat, strip). The reference delegates layout to pdfplumber/pdfminer;
this kernel implements the same class of algorithm directly:

  char/word spans (from BT..ET text operators, tracking Td/TD/Tm/T* matrices)
  → word grouping by x-gap → line grouping by y-tolerance → reading-order
  sort (y desc, x asc; two-column pages left column first) → table-region
  detection via aligned x-positions → page concat in page order (tools.py:41-47).

Bounded scope: content streams (raw or FlateDecode-compressed, located by
the /Length entry — never by scanning for `endstream`, which compressed
bytes may contain) with BT/ET, Tf, Td, TD, Tm, T*, TL, Tj, TJ, ' and
literal/hex string arguments — exactly what the fixture writer emits
(FIXTURES.md §1). Pure function of bytes ⇒ usable as the single-node
golden oracle.
"""

from __future__ import annotations

import re
import zlib

_STREAM_HDR_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def _iter_streams(payload: bytes):
    """Yield decoded content-stream bodies, sliced by /Length (robust to
    `endstream` byte sequences inside compressed data).

    Manual scan loop, not finditer: the search position advances PAST each
    sliced body so the lazy `<<...>>stream` pattern can never anchor on
    `<<`/`stream` byte sequences inside a previous stream's compressed
    data and mis-slice the next one."""
    pos = 0
    while True:
        m = _STREAM_HDR_RE.search(payload, pos)
        if m is None:
            return
        d = m.group(1)
        lm = _LENGTH_RE.search(d)
        if not lm:
            pos = m.end()
            continue
        end = m.end() + int(lm.group(1))
        body = payload[m.end():end]
        pos = end
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                yield None  # signals corrupt stream
                continue
        yield body

# layout constants (kernel spec)
Y_TOL = 3.0            # same-line y tolerance (pts)
GAP_FACTOR = 0.25      # x-gap > GAP_FACTOR*font_size ⇒ word boundary
CHAR_W = 0.5           # estimated glyph width as fraction of font size
PAGE_MID = 306.0       # column split candidate (612pt page)
COL_MIN_LINES = 2      # min lines per side to call it two-column
TABLE_MIN_ROWS = 3     # min aligned rows to call it a table region
TABLE_X_TOL = 3.0


class _Span:
    __slots__ = ("x", "y", "size", "text")

    def __init__(self, x: float, y: float, size: float, text: str) -> None:
        self.x, self.y, self.size, self.text = x, y, size, text

    @property
    def x_end(self) -> float:
        return self.x + CHAR_W * self.size * len(self.text)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"         # hex string
    rb"|\[|\]"
    rb"|/[A-Za-z0-9]+"
    rb"|[-+]?\d*\.?\d+"
    rb"|[A-Za-z'\"*]+"
)

_ESC_RE = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")
_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(raw: bytes) -> str:
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        return bytes([int(g, 8) & 0xFF])

    return _ESC_RE.sub(sub, raw).decode("latin-1")


def _parse_spans(stream: bytes) -> list[_Span]:
    """Execute the text operators of one content stream into positioned spans."""
    spans: list[_Span] = []
    size = 12.0
    tm_x = tm_y = 0.0          # current text position (e,f of Tm)
    lm_x = lm_y = 0.0          # line matrix origin
    leading = 0.0
    stack: list = []           # operand stack
    in_array = False
    array_items: list = []

    for m in _TOKEN_RE.finditer(stream):
        tok = m.group(0)
        if tok == b"[":
            in_array, array_items = True, []
        elif tok == b"]":
            in_array = False
            stack.append(array_items)
        elif tok.startswith(b"("):
            s = _unescape(tok[1:-1])
            if in_array:
                array_items.append(s)
            else:
                stack.append(s)
        elif tok.startswith(b"<"):
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"  # PDF spec: odd-length hex pads with 0
            s = bytes.fromhex(hx.decode("ascii")).decode("latin-1")
            if in_array:
                array_items.append(s)
            else:
                stack.append(s)
        elif tok.startswith(b"/"):
            stack.append(tok.decode("latin-1"))
        elif re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            v = float(tok)
            if in_array:
                array_items.append(v)
            else:
                stack.append(v)
        else:
            op = tok.decode("latin-1")
            if op == "BT":
                tm_x = tm_y = lm_x = lm_y = 0.0
                stack = []
            elif op == "Tf" and len(stack) >= 1:
                size = float(stack[-1])
                stack = []
            elif op == "Td" and len(stack) >= 2:
                lm_x += float(stack[-2]); lm_y += float(stack[-1])
                tm_x, tm_y = lm_x, lm_y
                stack = []
            elif op == "TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                lm_x += float(stack[-2]); lm_y += float(stack[-1])
                tm_x, tm_y = lm_x, lm_y
                stack = []
            elif op == "Tm" and len(stack) >= 6:
                lm_x, lm_y = float(stack[-2]), float(stack[-1])
                tm_x, tm_y = lm_x, lm_y
                stack = []
            elif op == "TL" and stack:
                leading = float(stack[-1])
                stack = []
            elif op == "T*":
                lm_y -= leading
                tm_x, tm_y = lm_x, lm_y
                stack = []
            elif op == "'" and stack:  # next line + show
                lm_y -= leading
                tm_x, tm_y = lm_x, lm_y
                s = stack[-1]
                if isinstance(s, str) and s:
                    spans.append(_Span(tm_x, tm_y, size, s))
                    tm_x += CHAR_W * size * len(s)
                stack = []
            elif op == "Tj" and stack:
                s = stack[-1]
                if isinstance(s, str) and s:
                    spans.append(_Span(tm_x, tm_y, size, s))
                    tm_x += CHAR_W * size * len(s)
                stack = []
            elif op == "TJ" and stack:
                arr = stack[-1]
                if isinstance(arr, list):
                    for item in arr:
                        if isinstance(item, str):
                            if item:
                                spans.append(_Span(tm_x, tm_y, size, item))
                                tm_x += CHAR_W * size * len(item)
                        else:
                            tm_x -= float(item) / 1000.0 * size
                stack = []
            elif op == "ET":
                stack = []
            else:
                stack = []
    return spans


def _group_lines(spans: list[_Span]) -> list[list[_Span]]:
    """Sort by (y desc, x asc); group consecutive spans within Y_TOL."""
    spans = sorted(spans, key=lambda s: (-s.y, s.x))
    lines: list[list[_Span]] = []
    for sp in spans:
        if lines and abs(lines[-1][0].y - sp.y) <= Y_TOL:
            lines[-1].append(sp)
        else:
            lines.append([sp])
    for line in lines:
        line.sort(key=lambda s: (s.x, s.text))
    return lines


def _line_text(line: list[_Span]) -> str:
    """Word grouping by x-gap: merge spans, inserting a space when the gap
    between the previous span's estimated end and the next start exceeds
    GAP_FACTOR × font size."""
    parts = [line[0].text]
    for prev, cur in zip(line, line[1:]):
        gap = cur.x - prev.x_end
        parts.append((" " if gap > GAP_FACTOR * cur.size else "") + cur.text)
    return "".join(parts)


def _detect_table_rows(lines: list[list[_Span]]) -> set[int]:
    """Indices of lines inside an aligned-column table region: ≥TABLE_MIN_ROWS
    consecutive lines, ≥2 spans each, same span count, x-positions aligned
    within TABLE_X_TOL."""
    table_idx: set[int] = set()
    i = 0
    while i < len(lines):
        run = [i]
        xs0 = [s.x for s in lines[i]]
        if len(xs0) >= 2:
            j = i + 1
            while j < len(lines):
                xs = [s.x for s in lines[j]]
                if len(xs) == len(xs0) and all(
                    abs(a - b) <= TABLE_X_TOL for a, b in zip(xs, xs0)
                ):
                    run.append(j)
                    j += 1
                else:
                    break
            if len(run) >= TABLE_MIN_ROWS:
                table_idx.update(run)
                i = run[-1] + 1
                continue
        i += 1
    return table_idx


def _page_text(spans: list[_Span]) -> str:
    if not spans:
        return ""
    # two-column detection on raw spans: split at PAGE_MID when both sides
    # have enough lines and no span crosses the midline.
    left = [s for s in spans if s.x < PAGE_MID]
    right = [s for s in spans if s.x >= PAGE_MID]
    crossing = any(s.x < PAGE_MID < s.x_end for s in left)
    if (len({round(s.y) for s in left}) >= COL_MIN_LINES
            and len({round(s.y) for s in right}) >= COL_MIN_LINES
            and not crossing):
        return _column_text(left) + "\n" + _column_text(right)
    return _column_text(spans)


def _column_text(spans: list[_Span]) -> str:
    lines = _group_lines(spans)
    table_rows = _detect_table_rows(lines)
    out = []
    for idx, line in enumerate(lines):
        if idx in table_rows:
            out.append("\t".join(s.text for s in line))
        else:
            out.append(_line_text(line))
    return "\n".join(out)


def extract_pdf_text(payload: bytes) -> tuple[str | None, str | None]:
    """(text, error) from PDF bytes: per-page layout text, pages joined in
    document order by blank lines, stripped (reference tools.py:41-47)."""
    if not payload.startswith(b"%PDF-"):
        return None, "not_pdf"
    if b"%%EOF" not in payload:
        return None, "truncated_pdf"
    pages = []
    for body in _iter_streams(payload):
        if body is None:
            return None, "bad_flate_stream"
        try:
            spans = _parse_spans(body)
        except Exception:
            # malformed operands (e.g. a string where Td expects a number)
            # must quarantine, never crash the task (error-row contract)
            return None, "content_stream_parse_error"
        if spans:
            pages.append(_page_text(spans))
    text = "\n\n".join(pages).strip()
    if not text:
        return None, "no_text_content"
    return text, None
