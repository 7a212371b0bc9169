"""`warc` — Python Data Source reading WARC/1.0 archives (ISO 28500, the
Common Crawl format) into the engine's pages schema.

One InputPartition per file: .warc.gz members are not block-splittable
(the Common Crawl convention is per-record gzip members, streamable but
not seekable), so file granularity is the natural parallel unit — a
crawl segment ships thousands of ~1 GB files, which parallelizes a
cluster fine. Records stream through a bounded parser (never the whole
file in memory) and exit as Arrow RecordBatches.

Only `response` records with an HTTP payload become rows; the HTTP header
block is stripped (the engine decodes raw html bytes). `text`/`lang` are
NULL — they are what the extraction pipeline computes.

Usage:
    spark.dataSource.register(WarcDataSource)
    spark.read.format("warc").option("path", "/crawl/segment/*.warc.gz").load()
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ROWS_PER_BATCH = 512


class _WarcFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _iter_records(stream):
    """Yield (headers: dict, payload: bytes) per WARC record from a
    binary stream; tolerant of trailing junk and truncated tails."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # skip inter-record padding / junk
        headers = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower().decode("ascii", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated tail: drop the torn record
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response header block from an application/http
    payload; non-HTTP payloads pass through unchanged."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep != -1:
            return payload[sep + 4:]
    return payload


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.glob = options.get("path")
        if not self.glob:
            raise ValueError("warc source requires .option('path', <glob>)")

    def partitions(self):
        import glob as g

        paths = sorted(g.glob(self.glob))
        if not paths:
            raise FileNotFoundError(f"no WARC files match {self.glob!r}")
        return [_WarcFile(p) for p in paths]

    def read(self, partition: _WarcFile):
        import datetime as dt
        import gzip

        import pyarrow as pa

        opener = gzip.open if partition.path.endswith(".gz") else open
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

        with opener(partition.path, "rb") as f:
            for headers, payload in _iter_records(f):
                if headers.get("warc-type") != "response":
                    continue
                url = headers.get("warc-target-uri")
                if not url:
                    continue
                ts = None
                raw = headers.get("warc-date", "")
                try:
                    ts = dt.datetime.strptime(raw, "%Y-%m-%dT%H:%M:%SZ")
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
