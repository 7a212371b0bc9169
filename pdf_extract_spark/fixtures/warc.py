"""Deterministic WARC/1.0 fixture writer (ISO 28500, the Common Crawl
archive format): wraps fixtures/pages rows as `response` records carrying
an HTTP/1.1 response whose body is the page payload. Used to test the
`warc` Data Source end to end — same urls/payloads as make_rows, so the
extraction pipeline's golden SHA-256 contract carries over unchanged.

Records are written as concatenated per-record gzip members when the path
ends in .gz — the Common Crawl convention that keeps files streamable
record by record (RFC 1952 members concatenate transparently).
"""

from __future__ import annotations

import gzip
import io

from .pages import make_rows


def _warc_record(url: str, ts, payload: bytes) -> bytes:
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n" + payload)
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
    head = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + date + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n")
    return head + http + b"\r\n\r\n"


def write_warc(path: str, n: int, start: int = 0) -> str:
    """Write rows [start, start+n) as one WARC file (gzip per-record
    members if path endswith .gz)."""
    gz = path.endswith(".gz")
    with open(path, "wb") as f:
        for url, ts, payload, _text, _lang in make_rows(n, start=start):
            rec = _warc_record(url, ts, payload or b"")
            if gz:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(rec)
                f.write(buf.getvalue())
            else:
                f.write(rec)
    return path
