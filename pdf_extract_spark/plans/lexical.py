"""Persisted lexical inverted index (SCALE.md: "at corpus scale the
posting/df tables are a persisted inverted index, not recomputed per
query") — the TF-IDF analog of the persisted IVF index in plans/index.py.

Layout under <index_dir>/:

    postings/b=<0..NB-1>/...   (term, doc_id, tf) partitioned by term-hash
                               bucket — a query's terms resolve to a static
                               bucket set, so the scan prunes to those
                               directory partitions (the inverted-list read
                               as partition pruning, same trick as the IVF
                               label partitions)
    dfreq/b=<...>/...          (term, df) same bucketing
    meta/                      one row: n_docs

IDF is integer-scaled floor(1e6 * N / df) — identical to the in-query
lexical_topk path, so the persisted-index query shares its DuckDB oracle
verbatim (the driver proves both paths value-identical).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

N_BUCKETS = 64


def _bucket(col: str) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def write_lexical_index(docs: DataFrame, out_dir: str) -> None:
    """documents(doc_id, text) → persisted postings/dfreq/meta tables.

    One explode + one groupBy(doc_id, term) shuffle builds the postings;
    df and meta derive from them with term-keyed / global aggregates. At
    10^12 docs this is the batch index-build job; incremental refresh
    appends new docs' postings and rebuilds dfreq (a term-keyed agg over
    the postings table, not the corpus)."""
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    posts = (words.groupBy("doc_id", "term")
             .agg(F.count("*").alias("tf"))
             .withColumn("b", _bucket("term")))
    posts.write.partitionBy("b").mode("overwrite").parquet(
        os.path.join(out_dir, "postings"))
    # (term, doc_id) is unique per postings row → df = row count per term;
    # derive dfreq from the WRITTEN postings, not the lineage (one decode
    # of the corpus, not two)
    dfreq = (docs.sparkSession.read.parquet(os.path.join(out_dir, "postings"))
             .groupBy("term").agg(F.count("*").alias("df"))
             .withColumn("b", _bucket("term")))
    dfreq.write.partitionBy("b").mode("overwrite").parquet(
        os.path.join(out_dir, "dfreq"))
    docs.agg(F.count("*").alias("n")).write.mode("overwrite").parquet(
        os.path.join(out_dir, "meta"))


def lexical_search(spark: SparkSession, index_dir: str,
                   qterms: DataFrame, k: int) -> DataFrame:
    """qterms(qid, term) → per-query TF-IDF top-k over the persisted
    index. Query terms are collected (queries are tiny by construction)
    so their bucket set becomes a STATIC `IN` filter — the postings and
    dfreq scans prune to those directory partitions; everything else is
    broadcast joins against the pruned slices."""
    from pyspark.sql.window import Window

    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    if not terms:
        return (qterms.select("qid").limit(0)
                .select("qid", F.lit(0).cast("bigint").alias("doc_id"),
                        F.lit(0).cast("bigint").alias("score"),
                        F.lit(0).cast("bigint").alias("rn")))
    # same hash expression as the writer — computed on a literal frame so
    # the bucket list is a plan-time constant
    buckets = sorted({r["b"] for r in
                      spark.createDataFrame([(t,) for t in terms], "term string")
                      .select(_bucket("term").alias("b")).collect()})
    posts = (spark.read.parquet(os.path.join(index_dir, "postings"))
             .filter(F.col("b").isin(buckets))
             .filter(F.col("term").isin(terms)))
    dfreq = (spark.read.parquet(os.path.join(index_dir, "dfreq"))
             .filter(F.col("b").isin(buckets))
             .filter(F.col("term").isin(terms)))
    n_docs = spark.read.parquet(os.path.join(index_dir, "meta"))
    idf = F.expr("CAST(floor(CAST(1000000 AS DOUBLE) * n / df) AS BIGINT)")
    idf_t = (dfreq.crossJoin(F.broadcast(n_docs))
             .select("term", idf.alias("idf")))
    scored = (qterms.join(posts.drop("b"), "term")
              .join(F.broadcast(idf_t), "term")
              .groupBy("qid", "doc_id")
              .agg(F.sum(F.col("tf") * F.col("idf")).cast("bigint")
                   .alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= k))
