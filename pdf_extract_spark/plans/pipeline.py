"""End-to-end extraction job: scan → salted repartition → extract →
single partitioned write + per-partition lineage, checkpoint-resumable.

North-rule mechanics (BASELINE.json:14): per-partition lineage rows
(partition id, counts, checksum) and resume via left-anti join of the input
against already-committed urls — re-running after a partial failure never
duplicates output and converges to the identical final table digest
(SURVEY.md §2.4 A8, §7.1 M6).

Single-pass layout (one decode pass, one data write — no persist, no
second full-table action):

    <out>/extracted/status={ok,err}/...   rows carry run_id + partition_id
    <out>/lineage/                        one row per task partition per run

ok/err are directory partitions of ONE write (Catalyst routes rows by the
status column), so the quarantine table (reference error_final analog,
/root/reference/modules/graphs.py:22-30) is a partition filter, not a
second job. Lineage is derived from a column-pruned re-read of the rows
just written (3 thin columns), and run counters come from the lineage
table itself — the full extracted text is scanned exactly once and
written exactly once.

Crash safety (run-level commit protocol): lineage is written LAST and
published as ONE atomically-renamed parquet file per run, so its presence
is the commit marker for a run and can never be half-visible. At resume,
run_id= directories with no lineage (crashed mid-write — committer v2
exposes task files as tasks finish, possibly torn) are deleted wholesale
and their input reprocessed; committed runs are never touched, and a
lineage file that is unreadable without being provably torn (parquet
footer magic intact) ABORTS the resume rather than risking deletion of
committed data. Iceberg would make data+lineage one transaction; this
protocol is the parquet equivalent at run granularity, tested including a
torn-parquet-file crash.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_text

LINEAGE_SCHEMA = ("run_id string, partition_id int, n_in long, n_out long, "
                  "n_err long, digest string")


def _is_torn_parquet(path: str) -> bool:
    """True iff the file is provably NOT a complete parquet file (missing
    the trailing PAR1 magic) — the signature of a write that crashed
    mid-flight. Returns False when the file cannot even be read: transient
    I/O errors must not be mistaken for corruption."""
    try:
        with open(path, "rb") as f:
            size = os.fstat(f.fileno()).st_size
            if size < 12:  # magic + footer-len + magic is the minimum
                return True
            f.seek(-4, os.SEEK_END)
            return f.read(4) != b"PAR1"
    except OSError:
        return False


def _committed_run_ids(spark: SparkSession, lineage_dir: str) -> set[str]:
    """Runs whose lineage exists are committed: lineage is the LAST write
    of a run, so its presence proves the data write completed.

    Read file-by-file: a torn lineage file belongs to a run that crashed
    DURING its lineage write (still uncommitted) — it must not poison the
    whole-directory read, or every committed run would look uncommitted
    and be wrongly deleted. Only files that provably lack the parquet
    footer magic are treated as torn and removed; any other read failure
    (transient I/O, environment) aborts the resume instead — wrongly
    deleting a committed run's lineage would cascade into
    _cleanup_uncommitted rmtree-ing its DATA."""
    if not os.path.isdir(lineage_dir):
        return set()
    import pyarrow.parquet as pq

    committed: set[str] = set()
    for name in sorted(os.listdir(lineage_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(lineage_dir, name)
        try:
            col = pq.read_table(path, columns=["run_id"]).column("run_id")
            committed.update(col.to_pylist())
        except Exception as e:
            if _is_torn_parquet(path):
                os.remove(path)  # torn file from a crashed lineage write
                continue
            raise RuntimeError(
                f"lineage file {path} is unreadable but not provably torn "
                f"({e!r}); refusing to resume — a wrong 'uncommitted' "
                "verdict here would delete committed data") from e
    return committed


def _cleanup_uncommitted(extracted_dir: str, committed: set[str]) -> list[str]:
    """Delete run_id= directories with no lineage (crashed mid-write).

    Committer v2 makes task files visible as tasks finish, so a crashed run
    leaves partial — possibly torn — files behind; because the output is
    directory-partitioned by run_id, the whole crashed run is removable
    without touching committed data. (Local-FS listing here; on a real
    cluster this is the same operation through the Hadoop FS API, and an
    Iceberg writer would make the whole run one transaction instead.)"""
    from urllib.parse import unquote

    removed = []
    if not os.path.isdir(extracted_dir):
        return removed
    for name in os.listdir(extracted_dir):
        if not name.startswith("run_id="):
            continue
        # Spark percent-escapes partition values in directory names
        # (run_id='run 1' → 'run_id=run%201') — unescape before comparing,
        # or committed runs would be wrongly treated as crashed
        run_id = unquote(name.split("=", 1)[1])
        if run_id not in committed:
            shutil.rmtree(os.path.join(extracted_dir, name), ignore_errors=True)
            removed.append(name)
    return removed


def _read_urls(spark: SparkSession, d: str) -> DataFrame | None:
    try:
        df = spark.read.parquet(d)
        return df.select("url")
    except Exception:
        return None


# Order-insensitive O(1)-state checksum: each row contributes the low 60
# bits of its sha256 (15 hex chars via conv), summed as DECIMAL(38,0) —
# exact and commutative, so partition order and merge order never matter —
# then reduced mod 2^60 and rendered as fixed-width hex. Unlike the
# previous array_sort(collect_list(...)) digest this buffers ONE number
# per aggregation state instead of every row digest of a partition (which
# at 10^12 rows would OOM the agg buffer). It is an audit checksum, not a
# cryptographic commitment: a 2^-60 collision chance per comparison is
# fine for detecting divergent reruns.
_MOD_2_60 = str(1 << 60)


def _sum_digest(row_hex_expr: str) -> F.Column:
    return F.expr(
        f"lpad(hex(CAST(pmod(SUM(CAST(conv(substring({row_hex_expr}, 1, 15),"
        f" 16, 10) AS DECIMAL(38,0))), CAST({_MOD_2_60} AS DECIMAL(38,0)))"
        f" AS BIGINT)), 15, '0')")


def lineage_rows(extracted: DataFrame, run_id: str) -> DataFrame:
    """One row per task partition: counts + order-insensitive checksum
    (modular sum of per-row text digests — constant agg state)."""
    return (
        extracted
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("n_in"),
            F.count("text_sha256").alias("n_out"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_err"),
            _sum_digest("coalesce(text_sha256, '0')").alias("digest"),
        )
        .select(F.lit(run_id).alias("run_id"), "partition_id",
                "n_in", "n_out", "n_err", "digest")
    )


def _publish_lineage(lineage: DataFrame, out_dir: str, lineage_dir: str,
                     run_id: str) -> "pyarrow.Table":
    """Atomically publish a run's lineage as ONE parquet file and return
    the published rows as the Arrow table (callers derive run counters
    from it without another Spark job).

    Lineage presence is the run's commit marker, so the marker itself must
    appear atomically: a multi-file Spark append under committer v2 can
    crash having committed a subset of part files, making the run look
    committed while its audit counters are permanently under-reported.
    Lineage is tiny (one row per task partition), so it is collected to the
    driver as Arrow, written to a temp file on the same filesystem, and
    os.replace'd into place — the POSIX-atomic rename; on S3/HDFS the same
    role is played by an atomic PUT / create-then-rename, and an Iceberg
    writer would fold this into the table transaction."""
    from urllib.parse import quote

    import pyarrow.parquet as pq

    tab = lineage.toArrow()
    os.makedirs(lineage_dir, exist_ok=True)
    safe = quote(run_id, safe="")
    tmp = os.path.join(out_dir, f"_lineage_tmp_{safe}.parquet")
    pq.write_table(tab, tmp)
    os.replace(tmp, os.path.join(lineage_dir, f"run-{safe}.parquet"))
    return tab


class ParquetRunWriter:
    """Default output writer: directory-partitioned parquet append. Run
    atomicity comes from the surrounding run-level commit protocol
    (lineage file as commit marker + crashed-run directory cleanup) —
    see the module docstring."""

    def __init__(self, extracted_dir: str):
        self.extracted_dir = extracted_dir

    def write_run(self, ext: DataFrame) -> None:
        # run_id is a directory partition too: the lineage re-read and any
        # later per-run audit prune straight to this run's files
        (ext.write.partitionBy("run_id", "status")
         .mode("append").parquet(self.extracted_dir))


class IcebergRunWriter:
    """DataFrameWriterV2 seam for an Iceberg output table: one
    `writeTo(table).append()` — the table format's snapshot commit makes
    the whole run atomic, subsuming the parquet run-commit protocol
    (north rule BASELINE.json:14 names Iceberg tables).

    This sandbox cannot ship the iceberg-spark-runtime jar (no installs,
    no network — waiver recorded in SCALE.md §Iceberg), so construction
    verifies the catalog is actually configured and fails with the exact
    spark-submit flags a real cluster needs. Swapping this writer into
    run_extraction is the ONLY change required — the seam is the point.
    """

    def __init__(self, spark: SparkSession, table: str):
        catalog = table.split(".", 1)[0]
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None:
            raise RuntimeError(
                f"no Spark catalog {catalog!r} configured for Iceberg table "
                f"{table!r}; launch with --packages org.apache.iceberg:"
                "iceberg-spark-runtime-4.0_2.13:<ver> --conf spark.sql."
                f"catalog.{catalog}=org.apache.iceberg.spark.SparkCatalog "
                f"--conf spark.sql.catalog.{catalog}.type=hadoop|hive")
        self.table = table

    def write_run(self, ext: DataFrame) -> None:
        # createOrReplace on first run would drop history; append is the
        # incremental-run semantic. Partitioning (run_id, status) is part
        # of the table DDL, not the write.
        ext.writeTo(self.table).append()


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    num_partitions: int = 32,
    writer=None,
) -> dict:
    """Run (or resume) the extraction job. Returns counters for the run.

    `writer` is the output-format seam (default ParquetRunWriter; pass an
    IcebergRunWriter on a cluster with the runtime jar)."""
    extracted_dir = os.path.join(out_dir, "extracted")
    lineage_dir = os.path.join(out_dir, "lineage")
    if writer is None:
        writer = ParquetRunWriter(extracted_dir)

    # run-level commit protocol: drop data from runs that crashed before
    # their lineage (= commit marker) was written, and sweep lineage temp
    # files orphaned by a crash inside _publish_lineage itself (written
    # but never renamed — their runs are uncommitted by definition)
    for name in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        if name.startswith("_lineage_tmp_"):
            os.remove(os.path.join(out_dir, name))
    committed = _committed_run_ids(spark, lineage_dir)
    _cleanup_uncommitted(extracted_dir, committed)
    if run_id in committed:
        # re-using a committed run_id would re-append its lineage rows and
        # double the audit counters — require a fresh id per invocation
        raise ValueError(
            f"run_id {run_id!r} is already committed in {out_dir}; "
            "use a new run_id for each invocation (resume is automatic)")

    done = _read_urls(spark, extracted_dir)
    todo = pages
    snap_dir = None
    if done is not None:
        # Snapshot the committed-url set to a staging dir: the extraction plan
        # must NOT read the directory it appends to — Spark refreshes/invalidates
        # cached plans on write-to-path, which would make post-append actions
        # re-list the output and see their own writes.
        snap_dir = os.path.join(out_dir, "_resume_snapshots", run_id)
        done.write.mode("overwrite").parquet(snap_dir)
        todo = pages.join(spark.read.parquet(snap_dir), "url", "left_anti")

    ext = (
        extract_text(todo, num_partitions=num_partitions)
        .withColumn("partition_id", F.spark_partition_id())
        .withColumn("run_id", F.lit(run_id))
        .withColumn("status",
                    F.when(F.col("error").isNull(), "ok").otherwise("err"))
    )
    writer.write_run(ext)
    if snap_dir is not None:
        # the resume snapshot is only needed while the plan above executes
        shutil.rmtree(snap_dir, ignore_errors=True)

    # Lineage from a column-pruned re-read of what was just committed.
    # Split planning sizes tasks by FULL file bytes (the pruned sha column
    # is a fraction of that), so under the session's small decode-oriented
    # maxPartitionBytes this tiny job would fan out into hundreds of tasks
    # — widen splits for its duration (scheduling overhead is a FIXED
    # driver cost that would otherwise eat into high-parallelism scaling).
    # The wide-split conf lives on a CLONED session (same SparkContext and
    # cached data, separate SQLConf), so concurrent queries planned on the
    # caller's session never see it.
    lineage_spark = spark.newSession()
    lineage_spark.conf.set("spark.sql.files.maxPartitionBytes",
                           str(512 * 1024 * 1024))
    staged = (lineage_spark.read.parquet(extracted_dir)
              .filter(F.col("run_id") == run_id)
              .select("partition_id", "text_sha256", "error"))
    tab = _publish_lineage(lineage_rows(staged, run_id), out_dir,
                           lineage_dir, run_id)

    # run counters from the just-published lineage table (same rows that
    # landed in the commit marker — no extra Spark job)
    n_in = sum(tab.column("n_in").to_pylist()) if tab.num_rows else 0
    n_err = sum(tab.column("n_err").to_pylist()) if tab.num_rows else 0
    return {"run_id": run_id, "n_in": int(n_in), "n_ok": int(n_in - n_err),
            "n_err": int(n_err)}


def extracted_ok(spark: SparkSession, out_dir: str) -> DataFrame:
    """The clean extracted table (partition-pruned scan of status=ok)."""
    return (spark.read.parquet(os.path.join(out_dir, "extracted"))
            .filter(F.col("status") == "ok"))


def quarantine(spark: SparkSession, out_dir: str) -> DataFrame:
    """Quarantine rows: (url, stage, error) — a partition filter."""
    return (spark.read.parquet(os.path.join(out_dir, "extracted"))
            .filter(F.col("status") == "err")
            .select("url", F.lit("extract").alias("stage"), "error"))


def final_digest(spark: SparkSession, out_dir: str) -> str:
    """Order-insensitive digest of the clean output table (resume tests):
    modular sum over per-row sha256(url|text_sha256) — O(1) agg state,
    same construction as the lineage checksum."""
    row = extracted_ok(spark, out_dir).agg(
        _sum_digest("sha2(concat_ws('|', url, text_sha256), 256)")
        .alias("d")).collect()[0]
    return row["d"]
