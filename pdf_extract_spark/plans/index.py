"""Chunk-embedding index: the table IS the index (SURVEY.md S3/S4/S5).

The reference materializes a FAISS IVF file plus a chunks JSON side-file
mid-pipeline and passes their *paths* through state
(/root/reference/modules/tools.py:115-140) — a dual-file consistency
hazard. Here both become ONE partitioned parquet table
(url, chunk_idx, chunk, embedding) written once and queried relationally;
k-NN search over it is the broadcast theta-join of queries/vectors_q.

Scale path: bucket the table by embedding coarse-cluster (IVF analog,
vectors_q.ann_ivf_topk) or LSH band so search probes a partition subset.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

INDEX_SCHEMA = ("url string, chunk_idx int, chunk string, "
                "embedding array<float>")


def _chunk_embed_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..kernels.chunker import split_text
    from ..kernels.embed import embed_batch

    for pdf in pdfs:
        urls, idxs, chunks = [], [], []
        for url, text in zip(pdf["url"], pdf["text"]):
            cs = split_text(text or "", chunk_size=2000, chunk_overlap=200)
            for i, c in enumerate(cs):
                urls.append(url)
                idxs.append(i)
                chunks.append(c)
        if not urls:
            continue  # empty pandas frames infer float64 cols → Arrow cast error
        vecs = embed_batch(chunks)
        yield pd.DataFrame({
            "url": urls, "chunk_idx": idxs, "chunk": chunks,
            "embedding": [v.tolist() for v in vecs],
        })


def build_index(extracted: DataFrame) -> DataFrame:
    """(url, text) → chunk-embedding table. V1 splitter + V3 hash embed in
    one narrow Arrow pass (reference chunk_and_embed, tools.py:52-152)."""
    return (extracted.select("url", "text")
            .mapInPandas(_chunk_embed_batches, schema=INDEX_SCHEMA))


def write_index(extracted: DataFrame, out_dir: str) -> str:
    path = os.path.join(out_dir, "chunk_index")
    build_index(extracted).write.mode("overwrite").parquet(path)
    return path


def search_index(spark: SparkSession, index_path: str, query_text: str,
                 k: int = 5) -> DataFrame:
    """k-NN over the persisted index (reference search_tool,
    tools.py:155-277): embed the query driver-side, broadcast it, score
    1/(1+L2) per chunk, over-fetch broad_k = min(max(4k,15), n) then
    adaptive-cut (tools.py:186,369-391)."""
    from ..kernels.embed import embed_text

    qv = [float(x) for x in embed_text(query_text)]
    idx = spark.read.parquet(index_path)
    qdf = spark.createDataFrame([(qv,)], "qv array<float>")
    l2 = ("(aggregate(zip_with(qv, embedding, (x, y) -> "
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
    scored = (idx.crossJoin(F.broadcast(qdf))
              .select("url", "chunk_idx", "chunk",
                      F.expr(f"1.0 / (1.0 + {l2})").alias("score")))
    broad_k = max(4 * k, 15)
    # over-fetch via orderBy().limit() → TakeOrderedAndProject (distributed
    # partial top-k), NEVER a global row_number window (which would collapse
    # the whole index into one partition); rn is then assigned on the tiny
    # broad_k-row result.
    broad = scored.orderBy(F.desc("score"), F.asc("url"),
                           F.asc("chunk_idx")).limit(broad_k)
    # adaptive cut, full reference clamp (tools.py:369-391): count the
    # quality rows (≥60% of top), slice to that count clamped to
    # [max(k//2,2), 2k], falling back to min(k, n) when fewer than the
    # minimum qualify — same semantics as queries/chunks_q.adaptive_topk.
    # The windows below are unpartitioned BUT run on the ≤broad_k-row
    # result of the distributed TakeOrderedAndProject, never on the index.
    w = Window.orderBy(F.desc("score"), F.asc("url"), F.asc("chunk_idx"))
    wall = Window.partitionBy()
    min_r = max(k // 2, 2)
    j = (broad.withColumn("rn", F.row_number().over(w))
         .withColumn("t", F.max("score").over(wall))
         .withColumn("n", F.count("*").over(wall))
         .withColumn("nq", F.sum(
             F.expr("CAST(score >= CAST(0.6 AS DOUBLE) * t AS INT)"))
             .over(wall)))
    return (j.filter(F.expr(
        f"rn <= CASE WHEN nq < {min_r} THEN least({k}, n)"
        f" WHEN nq > {2 * k} THEN {2 * k} ELSE nq END"))
        .drop("t", "n", "nq"))


# --- persisted IVF index (S3/S4 as tables; reference tools.py:115-140) ----

def write_ivf_index(emb: DataFrame, out_dir: str) -> str:
    """Persist the IVF analog of a FAISS IndexIVFFlat as TWO tables:

    - ``ivf_vectors``: the embedding rows partitioned by coarse list id
      (`label`) — the inverted lists ARE parquet partitions, so probing a
      list is file-level partition pruning, not a filter over all rows;
    - ``ivf_centroids``: per-list exact component means (tiny, broadcast
      at query time).

    Component means use DECIMAL sums (order-insensitive) so the persisted
    centroids are bit-identical to the DuckDB oracle's."""
    vec_path = os.path.join(out_dir, "ivf_vectors")
    cen_path = os.path.join(out_dir, "ivf_centroids")
    (emb.select("vec_id", "label", "embedding")
     .write.partitionBy("label").mode("overwrite").parquet(vec_path))
    comp = (
        emb.select("label", F.posexplode("embedding").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.expr("CAST(SUM(CAST(x AS DECIMAL(18,12))) AS DOUBLE)"
                    " / COUNT(*)").alias("c"))
    )
    (comp.groupBy("label")
     .agg(F.expr("transform(array_sort(collect_list(struct(i, c))),"
                 " s -> s.c)").alias("cv"))
     .write.mode("overwrite").parquet(cen_path))
    return out_dir


def ivf_probe_labels(spark: SparkSession, index_dir: str, q: DataFrame,
                     nprobe: int = 2) -> DataFrame:
    """(qid, label) probe assignments: nearest nprobe centroids per query.
    Centroid table is tiny → both sides broadcast, no shuffle."""
    l2 = ("aggregate(zip_with(qv, cv, (x, y) -> (CAST(x AS DOUBLE)"
          " - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    centroids = spark.read.parquet(os.path.join(index_dir, "ivf_centroids"))
    w = Window.partitionBy("qid").orderBy(F.col("cdist").asc(),
                                          F.col("label").asc())
    return (F.broadcast(q).crossJoin(F.broadcast(centroids))
            .select("qid", "label", F.expr(l2).alias("cdist"))
            .withColumn("pr", F.row_number().over(w))
            .filter(F.col("pr") <= nprobe)
            .select("qid", "label"))


def ivf_search(spark: SparkSession, index_dir: str, q: DataFrame,
               k: int = 10, nprobe: int = 2) -> DataFrame:
    """Two-stage ANN over the PERSISTED index: probe labels, then scan
    ONLY the probed ivf_vectors partitions (static `label IN (...)`
    filter from the tiny collected probe set → file-level partition
    pruning, the FAISS inverted-list read). Fine top-k per qid."""
    probes_df = ivf_probe_labels(spark, index_dir, q, nprobe)
    # probe set is queries × nprobe rows — tiny by construction; collect it
    # ONCE: the collected rows yield both the static partition-pruning
    # label list and the per-qid probe table (rebuilding the DataFrame
    # locally avoids re-running the coarse-quantization job in the join)
    probe_rows = probes_df.collect()
    labels = sorted({r["label"] for r in probe_rows})
    probes = spark.createDataFrame(probe_rows, probes_df.schema)
    vecs = (spark.read.parquet(os.path.join(index_dir, "ivf_vectors"))
            .filter(F.col("label").isin(labels)))
    l2 = ("aggregate(zip_with(qv, embedding, (x, y) -> (CAST(x AS DOUBLE)"
          " - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    fine = (F.broadcast(q.join(probes, "qid"))
            .join(vecs, "label")
            .select("qid", "vec_id",
                    F.expr(f"1.0 / (1.0 + {l2})").alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (fine.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= k))
