"""spark-submit entry point for the full document pipeline:
extract → analyze (chunk/summarize/NER/verify) → report table.

  spark-submit --master local[32] --py-files pdf_extract_spark.zip \
      jobs/analyze_job.py --input <pages_parquet|synth:N> \
      --output /path/out --run-id r1 --partitions 64

Composes the two stage jobs: the resumable extraction pipeline
(plans/pipeline.py) then the analysis pass + lang-partitioned report
write (plans/analyze.py). Re-running resumes extraction from lineage and
rebuilds reports only for the extracted set.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pdf_extract_spark.plans.analyze import run_analysis
    from pdf_extract_spark.plans.pipeline import extracted_ok, run_extraction
    from pdf_extract_spark.session import get_spark

    spark = get_spark(master=args.master, app_name=f"analyze-{args.run_id}")
    try:
        if args.input.startswith("synth:"):
            from pdf_extract_spark.fixtures.pages import pages_df
            n = int(args.input.split(":", 1)[1])
            pages = pages_df(spark, n, partitions=args.partitions)
        else:
            pages = spark.read.parquet(args.input)

        t0 = time.monotonic()
        ex_stats = run_extraction(spark, pages, args.output,
                                  run_id=args.run_id,
                                  num_partitions=args.partitions)
        an_stats = run_analysis(spark, extracted_ok(spark, args.output),
                                args.output)
        wall = time.monotonic() - t0
        print(json.dumps({**ex_stats, **an_stats,
                          "wall_s": round(wall, 3)}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
