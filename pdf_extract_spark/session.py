"""SparkSession factory with the engine's standard configuration.

Local-mode defaults tuned for the sandbox (local[N], single JVM); on a real
cluster these same settings ride along via spark-submit --conf. UTC session
timezone is pinned so timestamp results agree with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def get_spark(master: str | None = None,
              app_name: str = "pdf-extract-spark",
              shuffle_partitions: int | None = None,
              arrow_batch: int = 4096) -> SparkSession:
    # arrow_batch sizing: target ~10-30 MB per Arrow batch so per-batch
    # fixed costs (pandas block build, IPC framing) amortize. 4096 rows of
    # ~3 KB sandbox pages ≈ 12 MB; for ~60 KB real Common-Crawl pages set
    # SPARK_GRAFT env / pass ~512.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else "8"
        shuffle_partitions = cpus if n == "*" else max(int(n), 8)
    builder = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        # free Arrow IPC buffers during the pandas conversion instead of
        # holding both copies: ~8% on the decode phase (6.55s vs 7.11s on
        # the 300k-page A/B) and lower worker peak memory. Arrow IPC
        # compression (zstd/lz4) measured a wash on these payloads.
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled",
                "true")
        # let Python Data Source connectors receive pushed filters
        # (sources/synth_pages.py prunes rows before payload synthesis)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Input-split sizing: default 128 MB splits + 4 MB open-cost starve a
        # 32-core box of parallelism on the small sandbox fixtures (a 60 MB
        # table becomes 2 splits). At 100 TB the cluster default is right;
        # here we size splits so the scan saturates the cores.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"))
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        # Output path: task-side commit (v1 renames every file serially on
        # the driver — seconds per job at 100s of files), and no parquet
        # dictionary pages (the dominant column is unique document text;
        # dictionary encoding burns CPU for zero compression there).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
                "2")
        .config("spark.hadoop.parquet.enable.dictionary", "false")
        # zstd beats snappy on BOTH write wall (10.8s -> 7.2s for the 300k
        # extraction write, measured) and size (99 vs 168 MB) here, and at
        # 100 TB the smaller footprint also shrinks every downstream scan
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-warehouse"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
