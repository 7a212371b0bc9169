"""Multi-stage search pipeline gaps from round 1 (VERDICT missing #1-3):
query-variant TEXT generation (F4/F5 as transformers), the variant-search →
J2 merge chain end-to-end, the fallback strategy chain (W5 as a real
gated operator), and the dual-threshold verify gate with summary-only
degraded mode — reference /root/reference/modules/tools.py:246-297,
:393-413, states.py:35, agents.py:780-864.

Query construction for the gate/fallback queries scales the query vector
by a per-qid CASE factor: embeddings are unit-norm, so the self-match
score 1/(1+(c-1)²) lands in chosen bands (c=1 → strict pass, c=2 → the
[0.2,0.3) summary-only window, c=3 → fail + top<0.3 fallback trigger) —
every branch of the reference's control flow is exercised on the fixture
corpus, deterministically in both engines.

Scale notes: the query/variant side is O(queries) rows and is broadcast;
the corpus side never shuffles for scoring (narrow map), and each
ranking is one window per qid partition. At 100 TB the per-doc word sets
(lexical search) and embeddings are precomputed columns of the chunk
index table, not recomputed per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import register, tbl
from .text_q import _INJECT, _SPARK_INJECT
from .vectors_q import _duck_l2, _spark_l2

K_VAR = 10   # per-variant lexical top-k
K_MAIN = 10  # main/fallback final k
POOL = 40    # fallback candidate pool = 2k searched with 2× over-fetch

# --- query-variant generation (reference tools.py:279-297) ----------------
# main   = P6-normalized text (first 500 chars, whitespace collapse)
# short  = first 150 chars           when len(main) > 200
# keywords = first 15 words          when len(main) > 100
# entities = first 10 capitalized words (len > 3)  when > 10 words
# variants equal to main are dropped (reference: variant != optimized).

_DUCK_VARIANTS = f"""
    qdocs AS (
      SELECT doc_id AS qid, {_INJECT} AS t2
      FROM documents WHERE doc_id < 25 AND doc_id % 5 = 0),
    norm AS (
      SELECT qid,
             trim(regexp_replace(substr(t2, 1, 500), '\\s+', ' ', 'g')) AS main
      FROM qdocs),
    wrds AS (
      SELECT qid, main, string_split(main, ' ') AS words FROM norm),
    gen AS (
      SELECT qid, 'main' AS variant, main AS vtext FROM wrds
      UNION ALL
      SELECT qid, 'short', substr(main, 1, 150) FROM wrds
      WHERE length(main) > 200
      UNION ALL
      SELECT qid, 'keywords', array_to_string(words[1:15], ' ') FROM wrds
      WHERE length(main) > 100
      UNION ALL
      SELECT qid, 'entities',
             array_to_string(list_filter(words, w -> length(w) > 3
               AND substring(w, 1, 1) >= 'A'
               AND substring(w, 1, 1) <= 'Z')[1:10], ' ')
      FROM wrds
      WHERE len(words) > 10
        AND len(list_filter(words, w -> length(w) > 3
              AND substring(w, 1, 1) >= 'A'
              AND substring(w, 1, 1) <= 'Z')) > 0),
    variants AS (
      SELECT g.qid, g.variant, g.vtext FROM gen g JOIN norm n ON g.qid = n.qid
      WHERE g.variant = 'main' OR g.vtext <> n.main)
"""

_SPARK_CAPS = ("filter(words, w -> length(w) > 3"
               " AND substring(w, 1, 1) >= 'A'"
               " AND substring(w, 1, 1) <= 'Z')")


def _variant_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    qdocs = (docs.filter((F.col("doc_id") < 25) & (F.col("doc_id") % 5 == 0))
             .select(F.col("doc_id").alias("qid"),
                     F.expr(_SPARK_INJECT).alias("t2")))
    norm = qdocs.select(
        "qid",
        F.trim(F.regexp_replace(F.substring("t2", 1, 500), r"\s+", " "))
        .alias("main"))
    wrds = norm.select("qid", "main", F.split("main", " ").alias("words"))
    main_v = wrds.select("qid", F.lit("main").alias("variant"),
                         F.col("main").alias("vtext"))
    short_v = (wrds.filter(F.length("main") > 200)
               .select("qid", F.lit("short").alias("variant"),
                       F.substring("main", 1, 150).alias("vtext")))
    kw_v = (wrds.filter(F.length("main") > 100)
            .select("qid", F.lit("keywords").alias("variant"),
                    F.expr("array_join(slice(words, 1, 15), ' ')")
                    .alias("vtext")))
    ent_v = (wrds.filter((F.size("words") > 10)
                         & (F.expr(f"size({_SPARK_CAPS})") > 0))
             .select("qid", F.lit("entities").alias("variant"),
                     F.expr(f"array_join(slice({_SPARK_CAPS}, 1, 10), ' ')")
                     .alias("vtext")))
    gen = main_v.unionByName(short_v).unionByName(kw_v).unionByName(ent_v)
    return (gen.join(norm, "qid")
            .filter((F.col("variant") == "main")
                    | (F.col("vtext") != F.col("main")))
            .select("qid", "variant", "vtext"))


@register(
    "query_variant_texts",
    oracle=f"WITH {_DUCK_VARIANTS} SELECT qid, variant, vtext FROM variants",
)
def query_variant_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (capitalized-entity variant) and F5 (truncation variants) as
    QUERY TRANSFORMERS — the generation half of reference
    tools.py:279-297, value-exact per variant string."""
    return _variant_texts(spark, sf_dir)


# Lexical search: Jaccard over distinct word sets — deterministic integer
# arithmetic, identical in both engines (|A∩B| / (|A|+|B|-|A∩B|)).
_DUCK_SEARCH = f"""
    {_DUCK_VARIANTS},
    vsets AS (
      SELECT qid, variant, list_distinct(string_split(vtext, ' ')) AS vw
      FROM variants),
    dsets AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS dw
      FROM documents),
    scored AS (
      SELECT v.qid, v.variant, d.doc_id,
             CAST(len(list_filter(v.vw, x -> list_contains(d.dw, x)))
                  AS DOUBLE)
             / CAST(len(v.vw) + len(d.dw)
                    - len(list_filter(v.vw, x -> list_contains(d.dw, x)))
                    AS DOUBLE) AS score
      FROM vsets v CROSS JOIN dsets d),
    hits AS (
      SELECT qid, variant, doc_id, score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid, variant
                                     ORDER BY score DESC, doc_id) AS rn
        FROM scored WHERE score > 0) t
      WHERE rn <= {K_VAR})
"""

_BOOST = ("CASE COUNT(*) WHEN 1 THEN CAST(1.0 AS DOUBLE)"
          " WHEN 2 THEN CAST(1.2 AS DOUBLE)"
          " WHEN 3 THEN CAST(1.44 AS DOUBLE)"
          " ELSE CAST(1.728 AS DOUBLE) END")


@register(
    "query_variants",
    oracle=f"""
    WITH {_DUCK_SEARCH}
    SELECT qid, doc_id,
           least(MAX(score) * {_BOOST}, CAST(1.0 AS DOUBLE)) AS merged_score,
           COUNT(*) AS n_variants,
           string_agg(variant, '+' ORDER BY variant) AS query_types
    FROM hits GROUP BY qid, doc_id
    """,
)
def query_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full J2 chain: variant generation → per-variant search →
    multi-hit merge (reference tools.py:190-229: re-found chunks get a
    1.2× boost per extra hit, capped at 1.0, query_type accumulates the
    variant names — sorted here, the reference's dict order isn't
    canonical). Search is lexical Jaccard over distinct word sets (the
    embedding twin is exercised by variant_merge/knn_topk); one window
    per (qid, variant), one groupBy for the merge."""
    docs = tbl(spark, sf_dir, "documents")
    vsets = _variant_texts(spark, sf_dir).select(
        "qid", "variant", F.array_distinct(F.split("vtext", " ")).alias("vw"))
    dsets = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("dw"))
    inter = "size(filter(vw, x -> array_contains(dw, x)))"
    scored = (F.broadcast(vsets).crossJoin(dsets)
              .select("qid", "variant", "doc_id",
                      F.expr(f"CAST({inter} AS DOUBLE)"
                             f" / CAST(size(vw) + size(dw) - {inter}"
                             " AS DOUBLE)").alias("score"))
              .filter(F.col("score") > 0))
    w = Window.partitionBy("qid", "variant").orderBy(F.desc("score"),
                                                     F.asc("doc_id"))
    hits = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= K_VAR))
    return hits.groupBy("qid", "doc_id").agg(
        F.expr(f"least(MAX(score) * {_BOOST}, CAST(1.0 AS DOUBLE))")
        .alias("merged_score"),
        F.count("*").alias("n_variants"),
        F.array_join(F.array_sort(F.collect_list("variant")), "+")
        .alias("query_types"),
    )


# --- fallback strategy chain (reference tools.py:246-251, 393-413) --------

_DUCK_FBQ = """
    q AS (
      SELECT vec_id AS qid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)
               * CASE WHEN vec_id >= 3 THEN CAST(3.0 AS DOUBLE)
                      ELSE CAST(1.0 AS DOUBLE) END) AS qv
      FROM embeddings WHERE vec_id < 5)
"""


@register(
    "fallback_rank",
    oracle=f"""
    WITH {_DUCK_FBQ},
    d AS (
      SELECT q.qid, e.vec_id,
             1.0 / (1.0 + {_duck_l2('q.qv', 'e.embedding')}) AS score
      FROM q CROSS JOIN embeddings e),
    ranked AS (
      SELECT qid, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score DESC, vec_id) AS rn
      FROM d),
    gate AS (SELECT qid, MAX(score) < CAST(0.3 AS DOUBLE) AS needs_fallback
             FROM d GROUP BY qid),
    pool AS (SELECT * FROM ranked WHERE rn <= {POOL}),
    refb AS (
      SELECT qid, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score DESC, vec_id) AS rn
      FROM pool)
    SELECT r.qid, r.vec_id, r.score, r.rn, 'main' AS strategy
    FROM ranked r JOIN gate g ON r.qid = g.qid
    WHERE NOT g.needs_fallback AND r.rn <= {K_MAIN}
    UNION ALL
    SELECT f.qid, f.vec_id, f.score, f.rn, 'fallback'
    FROM refb f JOIN gate g ON f.qid = g.qid
    WHERE g.needs_fallback AND f.rn <= {K_MAIN}
    """,
)
def fallback_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 fallback re-sort as a real gated operator (reference
    tools.py:246-251: top score < 0.3 → _fallback_search over a 2×-larger
    pool, re-sorted by score, take k; :393-413). qids 3-4 are scaled ×3
    so their best score is 0.2 < 0.3 and the fallback branch actually
    runs; qids 0-2 take the main branch."""
    emb = tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("qid"),
                 F.expr("transform(embedding, x -> CAST(x AS DOUBLE)"
                        " * CASE WHEN vec_id >= 3 THEN CAST(3.0 AS DOUBLE)"
                        " ELSE CAST(1.0 AS DOUBLE) END)").alias("qv")))
    d = (F.broadcast(q).crossJoin(emb)
         .select("qid", "vec_id",
                 F.expr(f"1.0 / (1.0 + {_spark_l2('qv', 'embedding')})")
                 .alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    ranked = d.withColumn("rn", F.row_number().over(w).cast("bigint"))
    gate = d.groupBy("qid").agg(
        (F.max("score") < F.expr("CAST(0.3 AS DOUBLE)"))
        .alias("needs_fallback"))
    pool = ranked.filter(F.col("rn") <= POOL).drop("rn")
    refb = pool.withColumn("rn", F.row_number().over(w).cast("bigint"))
    main = (ranked.join(F.broadcast(gate), "qid")
            .filter(~F.col("needs_fallback") & (F.col("rn") <= K_MAIN))
            .select("qid", "vec_id", "score", "rn",
                    F.lit("main").alias("strategy")))
    fb = (refb.join(F.broadcast(gate), "qid")
          .filter(F.col("needs_fallback") & (F.col("rn") <= K_MAIN))
          .select("qid", "vec_id", "score", "rn",
                  F.lit("fallback").alias("strategy")))
    return main.unionByName(fb)


# --- dual-threshold verify gate + summary-only mode -----------------------
# (reference states.py:35, agents.py:780-864: entity extraction failed →
# summary_only_mode → acceptance threshold drops from 0.3 to 0.2)

_DUCK_VGQ = """
    q AS (
      SELECT vec_id AS qid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)
               * CASE vec_id WHEN 0 THEN CAST(2.0 AS DOUBLE)
                             WHEN 2 THEN CAST(2.0 AS DOUBLE)
                             WHEN 4 THEN CAST(3.0 AS DOUBLE)
                             ELSE CAST(1.0 AS DOUBLE) END) AS qv
      FROM embeddings WHERE vec_id < 5)
"""

_NAMES_PAT = "[A-Z][a-z]+ [A-Z][a-z]+"


@register(
    "verify_gate_modes",
    oracle=f"""
    WITH {_DUCK_VGQ},
    modes AS (
      SELECT doc_id AS qid,
             NOT regexp_matches(
               CASE WHEN doc_id % 3 = 0 THEN {_INJECT} ELSE text END,
               '{_NAMES_PAT}') AS summary_only_mode
      FROM documents WHERE doc_id < 5),
    d AS (
      SELECT q.qid, e.vec_id,
             1.0 / (1.0 + {_duck_l2('q.qv', 'e.embedding')}) AS score
      FROM q CROSS JOIN embeddings e),
    topk AS (
      SELECT qid, score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY score DESC, vec_id) AS rn
        FROM d) t WHERE rn <= {K_MAIN}),
    agg AS (
      SELECT qid, CAST(SUM(CAST(score AS DECIMAL(18,12))) AS DOUBLE)
                  / COUNT(*) AS avg_score
      FROM topk GROUP BY qid)
    SELECT a.qid, m.summary_only_mode,
           CASE WHEN m.summary_only_mode THEN CAST(0.2 AS DOUBLE)
                ELSE CAST(0.3 AS DOUBLE) END AS min_score,
           a.avg_score,
           a.avg_score >= CASE WHEN m.summary_only_mode
                               THEN CAST(0.2 AS DOUBLE)
                               ELSE CAST(0.3 AS DOUBLE) END AS verified,
           (m.summary_only_mode
            AND a.avg_score >= CAST(0.2 AS DOUBLE)
            AND a.avg_score < CAST(0.3 AS DOUBLE)) AS degraded_pass,
           CASE WHEN m.summary_only_mode THEN 'summary_only'
                ELSE 'full' END AS mode
    FROM agg a JOIN modes m ON a.qid = m.qid
    """,
)
def verify_gate_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 completed: the 0.2-threshold summary-only branch (reference
    agents.py:853-864) next to the 0.3 strict gate, with the
    summary_only_mode flag surfaced as an output column (states.py:35).
    Mode derives from data, like the reference's degraded-analyze
    trigger: a query doc with NO extractable name entities (doc_id%3==0
    docs carry injected names → full mode) runs in summary-only mode.
    Fixture bands cover every branch: qid0 full+avg .24 → rejected
    (strict reject), qid3 full+.48 → verified (strict pass), qid1
    summary+.48 → verified, qid2 summary+.23 → degraded pass (the
    0.2-window branch), qid4 summary+.12 → fails even degraded."""
    emb = tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs = tbl(spark, sf_dir, "documents")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("qid"),
                 F.expr("transform(embedding, x -> CAST(x AS DOUBLE)"
                        " * CASE vec_id WHEN 0 THEN CAST(2.0 AS DOUBLE)"
                        " WHEN 2 THEN CAST(2.0 AS DOUBLE)"
                        " WHEN 4 THEN CAST(3.0 AS DOUBLE)"
                        " ELSE CAST(1.0 AS DOUBLE) END)").alias("qv")))
    modes = (docs.filter(F.col("doc_id") < 5)
             .select(F.col("doc_id").alias("qid"),
                     (~F.expr(f"CASE WHEN doc_id % 3 = 0 THEN {_SPARK_INJECT}"
                              f" ELSE text END rlike '{_NAMES_PAT}'"))
                     .alias("summary_only_mode")))
    d = (F.broadcast(q).crossJoin(emb)
         .select("qid", "vec_id",
                 F.expr(f"1.0 / (1.0 + {_spark_l2('qv', 'embedding')})")
                 .alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    topk = (d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= K_MAIN))
    agg = topk.groupBy("qid").agg(
        F.expr("CAST(SUM(CAST(score AS DECIMAL(18,12))) AS DOUBLE)"
               " / COUNT(*)").alias("avg_score"))
    min_score = F.expr("CASE WHEN summary_only_mode THEN CAST(0.2 AS DOUBLE)"
                       " ELSE CAST(0.3 AS DOUBLE) END")
    out = agg.join(F.broadcast(modes), "qid")
    return out.select(
        "qid", "summary_only_mode",
        min_score.alias("min_score"),
        "avg_score",
        (F.col("avg_score") >= min_score).alias("verified"),
        (F.col("summary_only_mode")
         & (F.col("avg_score") >= F.expr("CAST(0.2 AS DOUBLE)"))
         & (F.col("avg_score") < F.expr("CAST(0.3 AS DOUBLE)")))
        .alias("degraded_pass"),
        F.expr("CASE WHEN summary_only_mode THEN 'summary_only'"
               " ELSE 'full' END").alias("mode"),
    )


_LEXICAL_ORACLE = f"""
    WITH {_DUCK_VARIANTS},
    qterms AS (
      SELECT qid, unnest(list_distinct(string_split(vtext, ' '))) AS term
      FROM variants WHERE variant = 'keywords'),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    posts AS (
      -- join DISTINCT terms, not (qid, term): a term shared by several
      -- queries must not multiply tf
      SELECT d.doc_id, t.term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents) d
      JOIN (SELECT DISTINCT term FROM qterms) t ON t.term = d.w
      GROUP BY d.doc_id, t.term),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM posts GROUP BY term),
    scored AS (
      SELECT q.qid, p.doc_id,
             CAST(SUM(p.tf * CAST(floor(CAST(1000000 AS DOUBLE) * n.n / f.df)
                                  AS BIGINT)) AS BIGINT) AS score
      FROM qterms q
      JOIN posts p ON p.term = q.term
      JOIN df f ON f.term = q.term
      CROSS JOIN n_docs n
      GROUP BY q.qid, p.doc_id)
    SELECT qid, doc_id, score, rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY score DESC, doc_id) AS rn
      FROM scored) t WHERE rn <= {K_MAIN}
    """


@register("lexical_topk", oracle=_LEXICAL_ORACLE)
def lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text lexical retrieval: inverted-index TF-IDF top-k (the
    BM25-family shape — posting lists via explode, document frequencies,
    per-query-term scoring, per-query top-k). IDF is integer-scaled
    (floor(1e6 · N/df)) so per-doc score sums are INTEGER — exact and
    order-insensitive under Spark's partial/final aggregation, no float
    log whose libm could differ between engines.

    Scale shape: query terms broadcast; the posting-list build is one
    explode + groupBy keyed by (doc, term); df and scores reuse the same
    posting table. At corpus scale the posting/df tables are a persisted
    inverted index, not recomputed per query."""
    docs = tbl(spark, sf_dir, "documents")
    qterms = (_variant_texts(spark, sf_dir)
              .filter(F.col("variant") == "keywords")
              .select("qid", F.explode(
                  F.array_distinct(F.split("vtext", " "))).alias("term")))
    # N stays in-plan (1-row aggregate, broadcast) — no eager count job
    # at query-construction time
    n_docs = docs.agg(F.count("*").alias("n"))
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    posts = (words.join(F.broadcast(qterms.select("term").distinct()),
                        words.w == F.col("term"))
             .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df_t = (posts.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
            .crossJoin(F.broadcast(n_docs)))
    idf = F.expr("CAST(floor(CAST(1000000 AS DOUBLE) * n / df) AS BIGINT)")
    scored = (qterms.join(posts, "term")
              .join(F.broadcast(df_t.select("term", idf.alias("idf"))), "term")
              .groupBy("qid", "doc_id")
              .agg(F.sum(F.col("tf") * F.col("idf")).cast("bigint")
                   .alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= K_MAIN))


def _lexical_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once disk cache for the persisted lexical index, keyed by the
    source table's size+mtime fingerprint with an atomic-rename publish —
    the same protocol as the IVF index (vectors_q._ivf_index_dir)."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from ..plans.lexical import write_lexical_index

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}".encode()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"pdfx_lex_{tag}")
    done = os.path.join(d, "meta", "_SUCCESS")
    if os.path.exists(done):
        return d
    staging = f"{d}.build-{uuid.uuid4().hex[:8]}"
    write_lexical_index(
        tbl(spark, sf_dir, "documents").select("doc_id", "text"), staging)
    try:
        os.rename(staging, d)
    except OSError as exc:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(done):
            raise RuntimeError(
                f"lexical index publish failed: {staging} -> {d}") from exc
    return d


@register("lexical_topk_indexed", oracle=_LEXICAL_ORACLE)
def lexical_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`lexical_topk` served from the PERSISTED inverted index
    (plans/lexical.py): postings and document frequencies are written
    once, directory-partitioned by term-hash bucket, and each query
    prunes its scans to the buckets its terms hash into (asserted in
    tests/test_plans.py) — the web-scale retrieval shape, where the index
    is a maintained table and per-query cost is proportional to the
    query's posting lists, not the corpus. SAME oracle as lexical_topk:
    the driver proves the two paths value-identical."""
    from ..plans.lexical import lexical_search

    qterms = (_variant_texts(spark, sf_dir)
              .filter(F.col("variant") == "keywords")
              .select("qid", F.explode(
                  F.array_distinct(F.split("vtext", " "))).alias("term")))
    return lexical_search(spark, _lexical_index_dir(spark, sf_dir),
                          qterms, K_MAIN)
