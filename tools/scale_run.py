"""Single scaling-protocol measurement: run the extraction job in THIS
process at a given parallelism and print one JSON line.

Methodology (BASELINE.md sandbox protocol):
- caller pins the process to N cores via `taskset -c 0-(N-1)` so local[N]
  really means N cores — an unpinned local[8] on a 32-core box borrows
  idle cores for JVM-side Arrow/parquet work and inflates the baseline;
- a small warm-up job spawns+imports the Python workers before timing
  (cluster executors are warm; we measure throughput, not cold start);
- decode partitions are FIXED (default 128) across parallelism levels:
  on a real cluster the input-split count is data-determined, not
  cluster-size-determined — scaling 4x executors over the same splits is
  exactly what the N->4N criterion measures. (A per-cpu partition count
  would hand the low run artificially coarse, overhead-free tasks and
  deflate measured efficiency.)
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--parts", type=int, default=128)
    args = ap.parse_args()

    from pdf_extract_spark.fixtures.pages import pages_df
    from pdf_extract_spark.plans.pipeline import run_extraction
    from pdf_extract_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]",
                      app_name=f"scale-{args.cpus}",
                      shuffle_partitions=args.cpus)
    try:
        if not args.no_warmup:
            from pdf_extract_spark.operators.extract import extract_text
            extract_text(pages_df(spark, 2000, partitions=args.cpus)) \
                .write.format("noop").mode("overwrite").save()

        pages = spark.read.parquet(args.pages)
        shutil.rmtree(args.out, ignore_errors=True)
        t0 = time.monotonic()
        stats = run_extraction(spark, pages, args.out,
                               run_id=f"scale{args.cpus}",
                               num_partitions=args.parts)
        wall = time.monotonic() - t0
        print(json.dumps({"cpus": args.cpus, "docs": stats["n_in"],
                          "wall_s": round(wall, 2),
                          "docs_per_s": round(stats["n_in"] / wall, 1)}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
