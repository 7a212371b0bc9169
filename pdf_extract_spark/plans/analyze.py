"""Analysis pipeline (M5): per-document chunk→summarize→NER→verify→report,
plus the corpus-level partial/final summary aggregation.

Re-expresses the reference's agent stages as one Arrow-batched pass plus
one grouped aggregation (reference /root/reference/modules/agents.py):

- agent_analyze per-chunk map + hierarchical reduce (agents.py:438-676)
  → chunk/summarize/combine INSIDE one mapInPandas kernel per document
  (narrow — zero shuffles for everything per-doc);
- the LLM entity stage (agents.py:171-273) → deterministic rule NER
  (kernels/ner.py), same 4-list output contract;
- agent_verify's search-vs-analysis reconciliation (agents.py:743-877,
  LLM-judged) → deterministic overlap: entities found in the summary vs
  entities from the full text; confidence = |overlap| / |full|, verified
  at the reference's 0.3 threshold (agents.py:853-864);
- agent_aggregate's Pydantic FinalOutput → report (agents.py:938-979)
  → explicit StructType + to_json;
- summary-group packing ≤150k tokens, token ≈ len//3 (agents.py:412-436)
  + parallel group summaries + final combine (agents.py:621-644)
  → groupBy(source).applyInPandas two-level aggregation — Spark's
  partial/final agg split (SURVEY.md A6).

Output (S6 sink): report table partitioned by lang — the reference's
outputs/*.json directory becomes a queryable partitioned table.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# F9 FinalOutput shape — ONE definition shared by report_json() (the
# oracle-checked query face) and run_analysis() (the written table).
# A function, not a module constant: building a Column requires an active
# SparkSession, which doesn't exist at import time.
def report_json_expr():
    return F.to_json(F.struct(
        "url", "summary",
        F.struct("names", "dates", "locations", "numbers").alias("entities"),
        F.struct("confidence", "verified", "summary_only_mode")
        .alias("verified_data"),
    ))

REPORT_SCHEMA = (
    "url string, lang string, summary string, "
    "names array<string>, dates array<string>, locations array<string>, "
    "numbers array<string>, n_entities int, n_chunks int, "
    "confidence double, verified boolean, summary_only_mode boolean"
)

ROLLUP_SCHEMA = ("source string, n_docs long, combined_summary string, "
                 "n_groups int")


def _analyze_one(text: str) -> dict:
    """Pure single-doc analysis — also the pytest golden oracle."""
    from ..kernels.chunker import split_text
    from ..kernels.ner import entity_count, extract_entities
    from ..kernels.summarize import combine_summaries, summarize_extractive

    chunks = split_text(text or "", chunk_size=2000, chunk_overlap=200)
    chunk_summaries = [summarize_extractive(c) for c in chunks]
    summary = combine_summaries(chunk_summaries)
    ents = extract_entities(text or "")
    summary_ents = extract_entities(summary)
    full = {e for v in ents.values() for e in v}
    in_summary = {e for v in summary_ents.values() for e in v}
    overlap = full & in_summary
    confidence = (len(overlap) / len(full)) if full else 0.0
    # Summary-only degraded mode (states.py:35, agents.py:588-593): entity
    # extraction yielded nothing but a summary exists -> the reference
    # CONTINUES the workflow, returning verified_data with low confidence
    # instead of erroring (agents.py:826-833, 884-890) — so the doc is
    # accepted (verified) with the flag set and confidence 0.0. The
    # NUMERIC 0.2-vs-0.3 score gate applies where scores exist, on the
    # search side: queries/search_q.verify_gate_modes.
    n_entities = entity_count(ents)
    summary_only = n_entities == 0 and bool(summary)
    return {
        "summary": summary,
        "entities": ents,
        "n_entities": n_entities,
        "n_chunks": len(chunks),
        "confidence": confidence,
        "verified": summary_only or confidence >= 0.3,
        "summary_only_mode": summary_only,
    }


def _analyze_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in pdfs:
        rows = {k: [] for k in ("url", "lang", "summary", "names", "dates",
                                "locations", "numbers", "n_entities",
                                "n_chunks", "confidence", "verified",
                                "summary_only_mode")}
        for url, lang, text in zip(pdf["url"], pdf["lang"], pdf["text"]):
            r = _analyze_one(text)
            rows["url"].append(url)
            rows["lang"].append(lang)
            rows["summary"].append(r["summary"])
            for cat in ("names", "dates", "locations", "numbers"):
                rows[cat].append(r["entities"][cat])
            rows["n_entities"].append(r["n_entities"])
            rows["n_chunks"].append(r["n_chunks"])
            rows["confidence"].append(r["confidence"])
            rows["verified"].append(r["verified"])
            rows["summary_only_mode"].append(r["summary_only_mode"])
        yield pd.DataFrame(rows)


def analyze_extracted(extracted: DataFrame) -> DataFrame:
    """(url, lang, text) → per-doc analysis. Narrow (no shuffle): all
    per-document stages fuse into one Arrow-batched pass."""
    return (extracted.select("url", "lang", "text")
            .mapInPandas(_analyze_batches, schema=REPORT_SCHEMA))


def report_json(analyzed: DataFrame) -> DataFrame:
    """F9: FinalOutput-shaped JSON per doc via to_json(struct(...)) —
    explicit schema, no free-form serialization (agents.py:938-969)."""
    return analyzed.select("url", "lang", report_json_expr().alias("report"))


def _rollup_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """A6 final agg: pack per-doc summaries into ≤150k-token groups,
    summarize each group, then combine — the reference's hierarchical
    reduce (agents.py:412-436,621-644) as an applyInPandas UDAF."""
    from ..kernels.summarize import (
        combine_summaries,
        pack_groups,
        summarize_extractive,
    )

    summaries = sorted(pdf["summary"].fillna("").tolist())  # canonical order
    groups = pack_groups(summaries)
    group_summaries = [summarize_extractive(" ".join(g)) for g in groups]
    final = combine_summaries(group_summaries)
    return pd.DataFrame({
        "source": [key[0]],
        "n_docs": [len(pdf)],
        "combined_summary": [final],
        "n_groups": [len(groups)],
    })


def source_rollup(analyzed_with_source: DataFrame) -> DataFrame:
    """groupBy(source) hierarchical summary — one shuffle on the group key;
    the map side (per-doc summaries) already ran in analyze_extracted."""
    return (analyzed_with_source
            .select("source", "summary")
            .groupBy("source")
            .applyInPandas(_rollup_group, schema=ROLLUP_SCHEMA))


def run_analysis(spark: SparkSession, extracted: DataFrame,
                 out_dir: str) -> dict:
    """Analyze extracted docs and write the report table partitioned by
    lang (S6: partitioned sink replaces outputs/*.json files)."""
    # one narrow pass: serialize the report inline rather than joining
    # report_json(analyzed) back (a self-join would recompute the whole
    # analysis kernel once per branch plus an unneeded shuffle); NULL lang
    # becomes 'und' so the partition value (and the summary sort below)
    # never deals with None
    analyzed = analyze_extracted(extracted).withColumn(
        "lang", F.coalesce("lang", F.lit("und")))
    reports = (analyzed.withColumn("report", report_json_expr())
               .drop("summary"))
    reports.write.partitionBy("lang").mode("overwrite").parquet(
        os.path.join(out_dir, "reports"))
    written = spark.read.parquet(os.path.join(out_dir, "reports"))
    return {"n_reports": written.count(),
            "langs": sorted(r["lang"] for r in
                            written.select("lang").distinct().collect())}
