"""Distributed extraction operator: binary payloads → extracted text.

The Spark face of the S1 scan kernel (SURVEY.md §2.1; reference
/root/reference/modules/tools.py:27-50). Arrow-batched ``mapInPandas`` —
never per-row Python at the plan level (BASELINE.json:15 input_hint) —
calling the same pure kernel (`kernels.decode.decode_payload`) that produces
the single-node golden SHA-256s, so distributed output is byte-identical by
construction; tests assert it stays that way under any partitioning.

Skew handling (SURVEY.md O7): oversized payloads (long-tail Zipf) are
round-robin repartitioned so no partition holds more than
ceil(n_big / P) heavy rows, while the small majority hash-partitions on
xxhash64(url). AQE cannot fix map-side payload skew, so this is explicit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, "
    "text string, text_sha256 string, n_bytes long, error string"
)

BIG_PAYLOAD_BYTES = 64 * 1024  # size-bucket threshold for salted spread


def salted_repartition(df: DataFrame, num_partitions: int,
                       big_bytes: int = BIG_PAYLOAD_BYTES) -> DataFrame:
    """Two-class partitioning: heavy rows round-robin (exact byte balance of
    the long tail), light rows by url-hash (uniform, deterministic co-location
    for downstream per-url ops). Union is narrow — no extra shuffle.

    Hash directly on `url` — NOT on a precomputed pmod(xxhash64(url), n)
    bucket id: repartition hashes its expression again, and re-hashing n
    distinct bucket ids into n partitions is a balls-in-bins throw (~1/e of
    the partitions empty, others 2-3 buckets) — a 3× straggler skew that
    halves scaling efficiency."""
    n_bytes = F.coalesce(F.length(F.col("html")), F.lit(0))
    big = (df.filter(n_bytes > big_bytes)
             .repartition(num_partitions))  # round-robin spread of heavy rows
    small = (df.filter(n_bytes <= big_bytes)
               .repartition(num_partitions, F.col("url")))
    return small.unionByName(big)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the task so --py-files shipping works without driver state
    from pdf_extract_spark.kernels.decode import decode_payload, text_sha256

    for pdf in batches:
        texts, shas, errors, sizes = [], [], [], []
        for payload in pdf["html"]:
            # Arrow hands binary columns over as bytes already — avoid a
            # per-row copy of the (potentially large) payload
            if payload is None:
                raw = b""
            elif isinstance(payload, bytes):
                raw = payload
            else:
                raw = bytes(payload)
            text, err = decode_payload(raw)
            texts.append(text)
            shas.append(text_sha256(text) if text is not None else None)
            errors.append(err)
            sizes.append(len(raw))
        yield pd.DataFrame({
            "url": pdf["url"],
            "warc_ts": pdf["warc_ts"],
            "lang": pdf["lang"],
            "text": texts,
            "text_sha256": shas,
            "n_bytes": sizes,
            "error": errors,
        })


def extract_text(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extracted table.

    Column pruning note: only url/warc_ts/html/lang are read — the input
    `text` column is never deserialized (Catalyst prunes it from the scan).
    """
    df = pages.select("url", "warc_ts", "html", "lang")
    if num_partitions:
        df = salted_repartition(df, num_partitions)
    return df.mapInPandas(_decode_batches, schema=EXTRACT_SCHEMA)


def quarantine(extracted: DataFrame) -> DataFrame:
    """Error rows → quarantine table (reference error_final analog,
    /root/reference/modules/graphs.py:22-30)."""
    return (extracted.filter(F.col("error").isNotNull())
            .select("url", F.lit("extract").alias("stage"), "error"))


def extracted_ok(extracted: DataFrame) -> DataFrame:
    return extracted.filter(F.col("error").isNull())
