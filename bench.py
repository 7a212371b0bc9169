"""Per-round benchmark. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "extraction": {...}, "scaling": {...}}

Three phases:
  1. Flagship extraction job (synth pages → decode → partitioned write +
     lineage) at two parallelism levels on the SAME pre-materialized
     parquet input — the sandbox evidence for the north rule's N→4N
     executor scaling criterion (BASELINE.md sandbox protocol).
  2. Headline registry queries at $SPARK_GRAFT_SF_DIR (default sf0.1),
     each timed to a noop sink (full materialization, no output cost).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_DOCS (default 20000), SPARK_GRAFT_BENCH_SCALING=0 to
skip the low-parallelism run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
LOW_CPUS = max(CPUS // 4, 1)

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "window_top_orders_per_customer",
    "events_hourly_rollup",
    "events_sessionize",
    "chunk_fixed_width",
    "page_concat_digest",
    "context_expand",
    "adaptive_topk",
    "knn_topk",
    "variant_merge",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "token_stats",
    "entity_extract",
    "extract_roundtrip",
    "summarize_docs",
]


def _materialize_pages(n: int) -> str:
    """Synthesize the fixture pages table once; both scaling runs read the
    identical parquet layout."""
    path = f"/tmp/bench_pages_{n}.parquet"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from pdf_extract_spark.fixtures.pages import pages_df
    from pdf_extract_spark.session import get_spark
    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-gen")
    try:
        pages_df(spark, n, partitions=max(CPUS, 8)).write.mode(
            "overwrite").parquet(path)
    finally:
        spark.stop()
    return path


def _extraction_run(pages_path: str, cpus: int, tag: str) -> dict:
    from pdf_extract_spark.plans.pipeline import run_extraction
    from pdf_extract_spark.session import get_spark
    out = f"/tmp/bench_out_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark(master=f"local[{cpus}]", app_name=f"bench-extract-{tag}",
                      shuffle_partitions=cpus)
    try:
        pages = spark.read.parquet(pages_path)
        t0 = time.monotonic()
        stats = run_extraction(spark, pages, out, run_id=f"bench-{tag}",
                               num_partitions=cpus)
        wall = time.monotonic() - t0
    finally:
        spark.stop()
    return {"cpus": cpus, "docs": stats["n_in"], "wall_s": round(wall, 2),
            "docs_per_s": round(stats["n_in"] / wall, 1)}


def _query_runs() -> dict:
    from pdf_extract_spark.queries import load_all
    from pdf_extract_spark.session import get_spark
    registry = load_all()
    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-queries")
    timings = {}
    try:
        for name in BENCH_QUERIES:
            df = registry[name].fn(spark, SF_DIR)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()
    return timings


def main() -> None:
    pages_path = _materialize_pages(N_DOCS)

    high = _extraction_run(pages_path, CPUS, f"hi{CPUS}")
    scaling = {}
    if DO_SCALING and LOW_CPUS < CPUS:
        low = _extraction_run(pages_path, LOW_CPUS, f"lo{LOW_CPUS}")
        factor = CPUS / LOW_CPUS
        scaling = {
            "cpus_low": LOW_CPUS, "cpus_high": CPUS,
            "docs_per_s_low": low["docs_per_s"],
            "docs_per_s_high": high["docs_per_s"],
            "factor": factor,
            "efficiency": round(
                high["docs_per_s"] / (factor * low["docs_per_s"]), 3),
        }

    queries = _query_runs()
    total = round(sum(queries.values()) + high["wall_s"], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    print(json.dumps({
        "metric": "extraction+headline-queries wall",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "extraction": high,
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
