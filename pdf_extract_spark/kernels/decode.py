"""Payload dispatch: magic-byte discrimination of binary page payloads.

PDFs and HTML share the ``html:binary`` column per BASELINE.json:15; the
``%PDF-`` magic selects the PDF layout kernel, everything else goes through
the HTML boilerplate stripper (SURVEY.md §2.1 S1).
"""

from __future__ import annotations

import hashlib

from .html_extract import decode_html_bytes
from .pdf_extract import extract_pdf_text


def decode_payload(payload: bytes | None) -> tuple[str | None, str | None]:
    """(text, error). Pure function of bytes — the per-row golden oracle."""
    if payload is None or len(payload) == 0:
        return None, "empty_payload"
    if payload[:5] == b"%PDF-":
        return extract_pdf_text(payload)
    return decode_html_bytes(payload)


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
