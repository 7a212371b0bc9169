"""`warc` — Python Data Source reading WARC/1.0 archives (ISO 28500, the
Common Crawl format) into the engine's pages schema.

One InputPartition per file: .warc.gz members are not block-splittable
(the Common Crawl convention is per-record gzip members, streamable but
not seekable), so file granularity is the natural parallel unit — a
crawl segment ships thousands of ~1 GB files, which parallelizes a
cluster fine. Records stream through a bounded parser (never the whole
file in memory; per-record payloads are capped at MAX_RECORD_BYTES and
oversized/invalid-length records are skipped by streaming-discard) and
exit as Arrow RecordBatches.

Paths accept an optional URL scheme. Schemeless and `file://` paths are
listed and opened natively; any other scheme (`s3://`, `https://`,
`gs://` — where Common Crawl actually lives) dispatches to fsspec when
it is importable and raises a clear install hint when it is not (this
sandbox ships no fsspec, so remote reads are exercised through the
`file://` branch, which takes the same scheme-dispatch path).
Partitioning and parsing are identical for every scheme.

Only `response` records with an HTTP payload become rows; the HTTP header
block is stripped (the engine decodes raw html bytes). `text`/`lang` are
NULL — they are what the extraction pipeline computes.

Usage:
    spark.dataSource.register(WarcDataSource)
    spark.read.format("warc").option("path", "/crawl/segment/*.warc.gz").load()
"""

from __future__ import annotations

import contextlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ROWS_PER_BATCH = 512
MAX_RECORD_BYTES = 64 * 1024 * 1024  # cap per-record payload buffering


class _WarcFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _split_scheme(path: str) -> tuple[str | None, str]:
    """('s3', 'bucket/key') for 's3://bucket/key'; (None, path) when no
    scheme. Windows-style drive letters never appear in this engine's
    deployments, so a single-char scheme is not special-cased."""
    at = path.find("://")
    if at > 0:
        return path[:at].lower(), path[at + 3:]
    return None, path


def _list_paths(glob_str: str) -> list[str]:
    scheme, rest = _split_scheme(glob_str)
    if scheme in (None, "file"):
        import glob as g

        return sorted(g.glob(rest))
    try:
        import fsspec
    except ImportError as exc:  # pragma: no cover - fsspec not in sandbox
        raise ImportError(
            f"reading {scheme}:// WARC paths requires fsspec "
            f"(pip install fsspec[{scheme}])") from exc
    fs = fsspec.filesystem(scheme)
    return sorted(f"{scheme}://{p}" for p in fs.glob(rest))


@contextlib.contextmanager
def _open_stream(path: str):
    """Binary stream for one WARC file, any scheme, gzip-wrapped when the
    name says so (gzip.GzipFile streams over any file-like, so remote
    objects decompress incrementally without local staging). Context
    manager because GzipFile does not close a passed fileobj — both
    layers close on exit."""
    import gzip

    scheme, rest = _split_scheme(path)
    if scheme in (None, "file"):
        raw = open(rest, "rb")
    else:  # pragma: no cover - fsspec not in sandbox
        import fsspec

        raw = fsspec.open(path, "rb").open()
    stream = gzip.GzipFile(fileobj=raw) if path.endswith(".gz") else raw
    try:
        yield stream
    finally:
        if stream is not raw:
            stream.close()
        raw.close()


def _iter_records(stream):
    """Yield (headers: dict, payload: bytes) per WARC record from a
    binary stream; tolerant of trailing junk and truncated tails.
    Records without a valid Content-Length, or claiming more than
    MAX_RECORD_BYTES, are SKIPPED: the claimed length of a corrupt or
    hostile record is NOT trusted — the scanner resynchronizes on the
    next 'WARC/' header line instead of buffering or seeking by it.
    All line reads are size-bounded so a newline-free file cannot make
    readline buffer unboundedly."""
    pending = None
    while True:
        line = pending if pending is not None else stream.readline(1 << 20)
        pending = None
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # skip inter-record padding / junk
        headers = {}
        while True:
            h = stream.readline(1 << 20)
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower().decode("ascii", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            length = -1
        if not 0 <= length <= MAX_RECORD_BYTES:
            # invalid or hostile length: scan forward to the next record
            # header marker (which may sit mid-line after junk bytes, or
            # split across size-capped reads — carry a 4-byte tail so a
            # marker straddling two chunks is still found), then re-enter
            # the loop with it
            tail = b""
            while True:
                l2 = stream.readline(1 << 20)
                if not l2:
                    return
                probe = tail + l2
                at = probe.find(b"WARC/")
                if at != -1:
                    pending = probe[at:]
                    break
                tail = l2[-4:]
            continue
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated tail: drop the torn record
        yield headers, payload


def _dechunk(body: bytes) -> bytes:
    """Decode Transfer-Encoding: chunked framing (hex-size lines between
    chunks); returns what was decodable, tolerant of truncation."""
    out = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl == -1:
            break
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        start = nl + 2
        out.append(body[start:start + size])
        pos = start + size + 2  # skip chunk + trailing CRLF
    return b"".join(out)


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response header block from an application/http
    payload (de-chunking Transfer-Encoding: chunked bodies — Common
    Crawl preserves the raw HTTP message); non-HTTP payloads pass
    through unchanged."""
    import re

    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep != -1:
            head = payload[:sep].lower()
            body = payload[sep + 4:]
            # parse the Transfer-Encoding header's OWN value: two loose
            # substring hits could false-positive on unrelated headers
            # and _dechunk would wipe a non-chunked body to empty
            te = re.search(rb"^transfer-encoding:([^\r\n]*)", head, re.M)
            if te and b"chunked" in te.group(1):
                return _dechunk(body)
            return body
    return payload


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.glob = options.get("path")
        if not self.glob:
            raise ValueError("warc source requires .option('path', <glob>)")

    def partitions(self):
        paths = _list_paths(self.glob)
        if not paths:
            raise FileNotFoundError(f"no WARC files match {self.glob!r}")
        return [_WarcFile(p) for p in paths]

    def read(self, partition: _WarcFile):
        import datetime as dt

        import pyarrow as pa

        rows: list[tuple] = []

        def batch(rs):
            urls, tss, htmls = zip(*rs)
            return pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.timestamp("us")),
                 pa.array(htmls, pa.binary()),
                 pa.array([None] * len(rs), pa.string()),
                 pa.array([None] * len(rs), pa.string())],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

        with _open_stream(partition.path) as f:
            for headers, payload in _iter_records(f):
                if headers.get("warc-type") != "response":
                    continue
                url = headers.get("warc-target-uri")
                if not url:
                    continue
                ts = None
                raw = headers.get("warc-date", "")
                try:
                    # WARC/1.0 second precision and WARC/1.1 fractional
                    # seconds both parse; tz-aware UTC so session timezone
                    # never shifts the value
                    ts = dt.datetime.fromisoformat(
                        raw.replace("Z", "+00:00"))
                    if ts.tzinfo is None:
                        ts = ts.replace(tzinfo=dt.timezone.utc)
                    # Arrow's tz-naive timestamp stores the WALL CLOCK and
                    # drops the offset — convert to UTC first so the wall
                    # clock IS the UTC instant for any input offset
                    ts = ts.astimezone(dt.timezone.utc)
                except ValueError:
                    pass
                rows.append((url, ts, _http_body(payload)))
                if len(rows) >= ROWS_PER_BATCH:
                    yield batch(rows)
                    rows = []
        if rows:
            yield batch(rows)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path_glob: str):
    register(spark)
    return spark.read.format("warc").option("path", path_glob).load()
