"""Minimal deterministic PDF writer for fixtures.

Emits single/multi-page PDFs using only the text operators the extraction
kernel supports (``BT/ET``, ``Tf``, ``Td/TD/Tm/T*/TL``, ``Tj/TJ/'``,
literal + hex strings, optionally FlateDecode-compressed content streams)
— per FIXTURES.md §1. The reference consumes PDFs via pdfplumber
(/root/reference/modules/tools.py:42-46); this sandbox has no PDF libs, so
fixtures are produced by this writer and decoded by
``pdf_extract_spark.kernels.pdf_extract`` (same text model, bounded scope).
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612, 792
LEFT = 72
RIGHT_COL = 330
TOP = 720
LEADING = 14
FONT_SIZE = 12


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(ops: list[str], compress: bool = False) -> bytes:
    body = "\n".join(ops).encode("latin-1", errors="replace")
    if compress:
        body = zlib.compress(body, level=6)
        return (b"<< /Length " + str(len(body)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + body + b"\nendstream")
    return (b"<< /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream")


def page_ops_simple(lines: list[str]) -> list[str]:
    """One-column page: Td positioning + TD leading, one Tj per line."""
    ops = ["BT", f"/F1 {FONT_SIZE} Tf", f"{LEFT} {TOP} Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(f"0 -{LEADING} TD")
        ops.append(f"({_esc(line)}) Tj")
    ops.append("ET")
    return ops


def page_ops_words(words_rows: list[list[str]]) -> list[str]:
    """Exercise word grouping by x-gap: each word its own Tm-positioned Tj."""
    ops = ["BT", f"/F1 {FONT_SIZE} Tf"]
    y = TOP
    for row in words_rows:
        x = LEFT
        for w in row:
            ops.append(f"1 0 0 1 {x} {y} Tm")
            ops.append(f"({_esc(w)}) Tj")
            x += int(0.5 * FONT_SIZE * len(w)) + 6  # gap > space threshold
        y -= LEADING
    ops.append("ET")
    return ops


def page_ops_two_column(left_lines: list[str], right_lines: list[str]) -> list[str]:
    """Two-column page: right column emitted FIRST in stream order so the
    kernel's reading-order sort (left column before right) is actually tested."""
    ops = ["BT", f"/F1 {FONT_SIZE} Tf"]
    y = TOP
    for line in right_lines:
        ops.append(f"1 0 0 1 {RIGHT_COL} {y} Tm")
        ops.append(f"({_esc(line)}) Tj")
        y -= LEADING
    y = TOP
    for line in left_lines:
        ops.append(f"1 0 0 1 {LEFT} {y} Tm")
        ops.append(f"({_esc(line)}) Tj")
        y -= LEADING
    ops.append("ET")
    return ops


def page_ops_table(header: list[str], rows: list[list[str]]) -> list[str]:
    """Aligned-column table region: cells at fixed x positions."""
    xs = [LEFT + 110 * i for i in range(len(header))]
    ops = ["BT", f"/F1 {FONT_SIZE} Tf"]
    y = TOP
    for row in [header] + rows:
        for x, cell in zip(xs, row):
            ops.append(f"1 0 0 1 {x} {y} Tm")
            ops.append(f"({_esc(cell)}) Tj")
        y -= LEADING
    ops.append("ET")
    return ops


def page_ops_tj_array(segments: list[list]) -> list[str]:
    """TJ array form: [(str) kern (str) ...] per line; kern < -500 ⇒ word gap."""
    ops = ["BT", f"/F1 {FONT_SIZE} Tf", f"{LEFT} {TOP} Td"]
    for i, seg in enumerate(segments):
        if i:
            ops.append(f"0 -{LEADING} TD")
        parts = []
        for item in seg:
            if isinstance(item, str):
                parts.append(f"({_esc(item)})")
            else:
                parts.append(str(item))
        ops.append("[" + " ".join(parts) + "] TJ")
    ops.append("ET")
    return ops


def page_ops_quote_hex(lines: list[str]) -> list[str]:
    """Exercise TL leading + the ' (next-line-show) operator and hex-string
    arguments: odd lines as hex strings, even as literals."""
    ops = ["BT", f"/F1 {FONT_SIZE} Tf", f"{LEADING} TL",
           f"{LEFT} {TOP} Td"]
    for i, line in enumerate(lines):
        if i == 0:
            ops.append(f"({_esc(line)}) Tj")
        elif i % 2:
            hx = line.encode("latin-1", errors="replace").hex()
            ops.append(f"<{hx}> '")
        else:
            ops.append(f"({_esc(line)}) '")
    ops.append("ET")
    return ops


def build_pdf(pages_ops: list[list[str]], compress: bool = False) -> bytes:
    """Assemble a valid-enough PDF: header, objects, xref, trailer."""
    objects: list[bytes] = []
    n_pages = len(pages_ops)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    font_obj_num = 3 + 2 * n_pages
    for i, ops in enumerate(pages_ops):
        objects.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
             f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 "
             f"{font_obj_num} 0 R >> >> >>").encode()
        )
        objects.append(_content_stream(ops, compress=compress))
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
