"""End-to-end extraction job: scan → salted repartition → extract →
partitioned write + per-partition lineage + quarantine, checkpoint-resumable.

North-rule mechanics (BASELINE.json:14): per-partition lineage rows
(partition id, counts, checksum) and resume via left-anti join of the input
against already-committed urls — re-running after a partial failure never
duplicates output and converges to the identical final table digest
(SURVEY.md §2.4 A8, §7.1 M6). Iceberg would make data+lineage a single
transaction; on the parquet fallback the resume key is the *data* table
itself, so a crash between data and lineage writes still cannot duplicate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_text, extracted_ok, quarantine

LINEAGE_SCHEMA = ("run_id string, partition_id int, n_in long, n_out long, "
                  "n_err long, digest string")


def _read_urls(spark: SparkSession, d: str) -> DataFrame | None:
    try:
        if not any(f.endswith(".parquet") for f in os.listdir(d)):
            return None
        return spark.read.parquet(d).select("url")
    except Exception:
        return None


def _existing_urls(spark: SparkSession, data_dir: str,
                   quarantine_dir: str) -> DataFrame | None:
    """Committed = extracted OR quarantined — error rows are terminal too,
    otherwise every resume would re-decode the whole quarantine tail."""
    done = _read_urls(spark, data_dir)
    quar = _read_urls(spark, quarantine_dir)
    if done is None:
        return quar
    return done if quar is None else done.unionByName(quar)


def lineage_rows(extracted: DataFrame, run_id: str) -> DataFrame:
    """One row per task partition: counts + order-insensitive checksum
    (sha256 over the sorted per-row text digests)."""
    return (
        extracted
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("n_in"),
            F.count("text_sha256").alias("n_out"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_err"),
            F.sha2(F.concat_ws("", F.array_sort(
                F.collect_list(F.coalesce("text_sha256", F.lit("")))
            )), 256).alias("digest"),
        )
        .select(F.lit(run_id).alias("run_id"), "partition_id",
                "n_in", "n_out", "n_err", "digest")
    )


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    num_partitions: int = 32,
) -> dict:
    """Run (or resume) the extraction job. Returns counters for the run."""
    data_dir = os.path.join(out_dir, "data")
    lineage_dir = os.path.join(out_dir, "lineage")
    quarantine_dir = os.path.join(out_dir, "quarantine")

    done = _existing_urls(spark, data_dir, quarantine_dir)
    todo = pages
    if done is not None:
        # Snapshot the committed-url set to a staging dir: the extraction plan
        # must NOT read the directory it appends to — Spark refreshes/invalidates
        # cached plans on write-to-path, which would make post-append actions
        # re-list the output and see their own writes.
        snap_dir = os.path.join(out_dir, "_resume_snapshots", run_id)
        done.write.mode("overwrite").parquet(snap_dir)
        todo = pages.join(spark.read.parquet(snap_dir), "url", "left_anti")

    ext = (extract_text(todo, num_partitions=num_partitions)
           .withColumn("partition_id", F.spark_partition_id())
           .persist())
    try:
        ok = extracted_ok(ext).drop("partition_id")
        ok.write.mode("append").parquet(data_dir)
        lineage_rows(ext, run_id).write.mode("append").parquet(lineage_dir)
        (quarantine(ext.drop("partition_id"))
            .write.mode("append").parquet(quarantine_dir))
        n_in = ext.count()
        n_err = ext.filter(F.col("error").isNotNull()).count()
    finally:
        ext.unpersist()
    return {"run_id": run_id, "n_in": n_in, "n_ok": n_in - n_err, "n_err": n_err}


def final_digest(spark: SparkSession, out_dir: str) -> str:
    """Order-insensitive digest of the whole output table (for resume tests)."""
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    row = df.agg(F.sha2(F.concat_ws("", F.array_sort(
        F.collect_list(F.concat_ws("|", "url", "text_sha256")))), 256)
        .alias("d")).collect()[0]
    return row["d"]
