"""Custom stateful streaming operator: cross-batch exact deduplication via
``applyInPandasWithState`` (build brief §streaming: custom stateful
operators).

A training-data ingest stream re-crawls pages; exactly-once *file*
semantics (ingest.py) do not dedup re-crawled *urls* across batches. This
operator keys the stream by a url-hash prefix and keeps the set of seen
url digests in state, emitting only first occurrences — the streaming twin
of dedup_q.dedup_exact.

State is keyed by a 2-hex-char shard of sha256(url) (256 shards), so
state size per key stays bounded and shard cardinality is fixed
regardless of stream size; a real deployment adds state TTL via
GroupStateTimeout.ProcessingTimeTimeout for bounded retention.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# shard_drain_seq: how many prior drains had delivered data to this url's
# shard when the url was first seen — a per-shard sequence, NOT a global
# batch id (shards are only invoked when they receive rows, so the same
# drain can assign different values in different shards)
OUT_SCHEMA = "url string, url_sha string, shard_drain_seq long"
STATE_SCHEMA = "seen array<string>, n_batches long"


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        seen, batch_id = set(state.get[0]), int(state.get[1])
    else:
        seen, batch_id = set(), 0
    out_urls, out_shas = [], []
    for pdf in pdfs:
        for url, sha in zip(pdf["url"], pdf["url_sha"]):
            if sha not in seen:
                seen.add(sha)
                out_urls.append(url)
                out_shas.append(sha)
    state.update((sorted(seen), batch_id + 1))
    if out_urls:
        yield pd.DataFrame({"url": out_urls, "url_sha": out_shas,
                            "shard_drain_seq": [batch_id] * len(out_urls)})


def stream_dedup(pages_stream: DataFrame) -> DataFrame:
    """streaming pages → first-occurrence-only rows, state per url-hash
    shard. Input must be a streaming DataFrame with a `url` column."""
    keyed = pages_stream.select(
        "url",
        F.sha2("url", 256).alias("url_sha"),
    ).withColumn("shard", F.substring("url_sha", 1, 2))
    return (
        keyed.groupBy("shard")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_dedup(spark, input_dir: str, output_dir: str,
                     checkpoint_dir: str) -> int:
    """Drain the pending backlog through the stateful dedup into a parquet
    sink (the memory sink cannot recover from a checkpoint across drains);
    returns total first-occurrence rows accumulated in the output."""
    from ..fixtures.pages import PAGES_SCHEMA

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .format("parquet").load(input_dir))
    q = (stream_dedup(stream).writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    import os
    if not os.path.isdir(output_dir):
        return 0  # nothing written yet; real read errors must propagate
    return spark.read.parquet(output_dir).count()
