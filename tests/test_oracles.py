"""Oracle-parity smoke: representative queries() entries vs their DuckDB
oracle_sql() at sf0.001 — the same comparison the driver runs at sf0.01
(tools/check_oracles.py is the full sweep)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from tools.check_oracles import TABLES, rows_to_multiset  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# one per operator family: agg, join+topk, window, chunk stack, vector,
# dedup, text, flagship
SMOKE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "window_top_orders_per_customer",
    "page_concat_digest",
    "adaptive_topk",
    "knn_topk",
    "dedup_minhash_lsh",
    "entity_extract",
    "extract_roundtrip",
    "query_variants",
    "verify_gate_modes",
    "media_meta",
    "media_frames",
    "lang_id_sql",
    "dedup_clusters",
    "media_features",
    "lexical_topk",
    "doc_repetition",
    # round-3 training-data pipeline ops
    "pii_scrub",
    "seq_pack",
    "quota_sample",
    "dedup_substring",
    "ann_range_search",
    "url_canonicalize",
    "hash_split",
    "top_ngrams",
    "split_contamination",
    "quality_gate",
    # late-round-3 ops (each has a value-exact oracle; gate them in CI,
    # not only in ad-hoc check_oracles sweeps)
    "text_normalize",
    "winnow_fingerprint",
    "dedup_paragraph",
    "lm_surprisal",
    "domain_gate",
    "ann_sq_topk",
    "dedup_simhash_sql",  # round-4 relational twin of the simhash kernel
    # round-4 corpus-lifecycle ops
    "dedup_incremental",
    "dedup_semantic",
    "decontam_bloom",
    "importance_sample",
    # round-4 production-hash fast paths (internal xxhash keys, outputs
    # identical — they share the sha variants' oracles verbatim)
    "dedup_paragraph_xx",
    "dedup_substring_xx",
    # round-4 RefinedWeb/CCNet additions
    "line_dedup",
    "ccnet_bucket",
    "source_mix",
    "link_graph",
    "link_rank",
    # round-4 model-fit-backed curation ops
    "nb_classify",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_encode",
    "kmeans_embed",
    "extract_markdown",
    # round-5: ExactSubstr excision (the removal pass; Lee et al. §4.1)
    "dedup_substring_cut",
    "dedup_substring_cut_xx",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def registry():
    from pdf_extract_spark.queries import load_all
    return load_all()


@pytest.mark.parametrize("name", SMOKE)
def test_oracle_parity(spark, duck, registry, name):
    q = registry[name]
    df = q.fn(spark, SF_DIR)
    sp_cols = df.columns
    sp_rows = [tuple(r) for r in df.collect()]
    res = duck.execute(q.oracle)
    du_cols = [d[0] for d in res.description]
    du_rows = res.fetchall()
    assert sorted(sp_cols) == sorted(du_cols)
    assert len(sp_rows) == len(du_rows)
    assert rows_to_multiset(sp_rows, sp_cols) == rows_to_multiset(du_rows, du_cols)
