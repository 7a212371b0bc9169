"""M5 analysis pipeline + chunk-index tests: distributed output equals the
single-node kernel composition (golden), report JSON parses with stable
schema, hierarchical rollup is partition-invariant, index search honors
over-fetch + adaptive-cut semantics."""

from __future__ import annotations

import json

import pytest

from pdf_extract_spark.plans.analyze import (
    _analyze_one,
    analyze_extracted,
    report_json,
    run_analysis,
    source_rollup,
)
from pdf_extract_spark.plans.index import search_index, write_index

DOCS = [
    ("u1", "en", "src0",
     "Alice Johnson visited Paris on 2024-01-15. She measured 42.5 units of "
     "throughput in the data engine. The partition strategy held at scale. "
     "Later the team reviewed results in Berlin on 2024-02-20 and found "
     "12.25 percent improvement across every benchmark suite they ran."),
    ("u2", "en", "src0",
     "The quick brown fox jumps over the lazy dog near the river bank. " * 40),
    ("u3", "en", "src1", "short text"),
    ("u4", "en", "src1", ""),
]


@pytest.fixture(scope="module")
def docs_sdf(spark):
    return spark.createDataFrame(
        [(u, lang, s, t) for u, lang, s, t in DOCS],
        "url string, lang string, source string, text string")


def test_analysis_matches_single_node_golden(spark, docs_sdf):
    got = {r["url"]: r.asDict() for r in
           analyze_extracted(docs_sdf.repartition(3)).collect()}
    for url, _, _, text in DOCS:
        want = _analyze_one(text)
        assert got[url]["summary"] == want["summary"], url
        assert got[url]["names"] == want["entities"]["names"]
        assert got[url]["dates"] == want["entities"]["dates"]
        assert got[url]["n_entities"] == want["n_entities"]
        assert got[url]["confidence"] == pytest.approx(want["confidence"])
        assert got[url]["verified"] == want["verified"]


def test_entities_found_and_verified(spark, docs_sdf):
    rows = {r["url"]: r for r in analyze_extracted(docs_sdf).collect()}
    r = rows["u1"]
    assert "Alice Johnson" in r["names"]
    assert "2024-01-15" in r["dates"] and "2024-02-20" in r["dates"]
    assert any("42.5" in n for n in r["numbers"])
    assert r["n_entities"] > 5


def test_report_json_schema(spark, docs_sdf):
    reports = report_json(analyze_extracted(docs_sdf)).collect()
    for r in reports:
        doc = json.loads(r["report"])
        assert set(doc) == {"url", "summary", "entities", "verified_data"}
        assert set(doc["entities"]) == {"names", "dates", "locations",
                                        "numbers"}
        assert set(doc["verified_data"]) == {"confidence", "verified",
                                            "summary_only_mode"}


def test_summary_only_mode_flag(spark, docs_sdf):
    """Docs with a summary but zero extractable entities run in degraded
    summary-only mode (reference states.py:35, agents.py:588-593,853): the
    flag is set, the acceptance threshold drops to 0.2, and the doc still
    reaches the report instead of erroring."""
    rows = {r["url"]: r for r in analyze_extracted(docs_sdf).collect()}
    assert rows["u1"]["summary_only_mode"] is False  # entities found
    assert rows["u2"]["summary_only_mode"] is True   # summary, no entities
    assert rows["u3"]["summary_only_mode"] is True
    assert rows["u4"]["summary_only_mode"] is False  # no summary: hard path
    # golden twin agrees
    for url, _, _, text in DOCS:
        assert rows[url]["summary_only_mode"] == \
            _analyze_one(text)["summary_only_mode"], url


def test_rollup_partition_invariance(spark, docs_sdf):
    a = sorted(map(tuple,
                   source_rollup(
                       analyze_extracted(docs_sdf.repartition(1))
                       .join(docs_sdf.select("url", "source"), "url"))
                   .collect()))
    b = sorted(map(tuple,
                   source_rollup(
                       analyze_extracted(docs_sdf.repartition(4))
                       .join(docs_sdf.select("url", "source"), "url"))
                   .collect()))
    assert a == b
    assert len(a) == 2  # src0, src1
    by_src = {r[0]: r for r in a}
    assert by_src["src0"][1] == 2  # n_docs


def test_run_analysis_partitioned_write(spark, docs_sdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("analysis"))
    stats = run_analysis(spark, docs_sdf, out)
    assert stats["n_reports"] == 4
    assert stats["langs"] == ["en"]
    df = spark.read.parquet(f"{out}/reports")
    assert {f.name for f in df.schema} >= {"url", "report", "verified",
                                           "n_entities", "lang"}


def test_index_build_and_search(spark, docs_sdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    path = write_index(docs_sdf, out)
    idx = spark.read.parquet(path)
    # chunk rows exist, embeddings are 64-dim
    assert idx.count() >= 4
    row = idx.first()
    assert len(row["embedding"]) == 64
    hits = search_index(spark, path, "quick brown fox jumps", k=3).collect()
    assert hits
    assert hits[0]["url"] == "u2"  # the fox doc must rank first
    assert all(h["score"] <= hits[0]["score"] for h in hits)
    assert len(hits) <= 6  # 2k cap
