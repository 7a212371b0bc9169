"""Chunk-table relational stack: fixed-width chunking, order-sensitive
concat (A1), context expansion (J3), composite ranking (W1), adaptive
top-k (W2) — SURVEY.md §2.4/§2.5, reference /root/reference/modules/
tools.py:299-391.

The *recursive* splitter (V1, reference tools.py:76-82) is a Python kernel
(kernels/chunker.py) exercised in docpipe_q + pytest; here we use a
fixed-width chunker whose semantics are exactly expressible in ANSI SQL so
the whole downstream search/rank stack gets a value-exact DuckDB oracle.

Chunk geometry: WIDTH=120 chars, STRIDE=80 (overlap 40) — small enough
that every fixture doc yields several chunks, exercising adjacency (J3)
and per-doc ranking (W2) non-trivially.

Scale note: chunking is `explode(sequence(...))` — a narrow op, no
shuffle; every downstream groupBy keys on doc_id, so one shuffle total
co-locates all per-doc work.  The deterministic chunk score
1/(1 + |len-100|/50) stands in for the reference's 1/(1+L2) score
(tools.py:198) in shapes where embeddings would force a kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import register, tbl

WIDTH = 120
STRIDE = 80

# Score/bonus expressions shared VERBATIM between the Spark plan (F.expr)
# and the DuckDB oracle: every float literal is CAST to DOUBLE because the
# dialects default bare decimals differently (Spark/DuckDB DECIMAL vs double),
# which changes the arithmetic's last ulp.
SCORE_EXPR = ("CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + "
              "abs(CAST(length(chunk) AS DOUBLE) - CAST(100.0 AS DOUBLE)) "
              "/ CAST(50.0 AS DOUBLE))")
DECAY_EXPR = ("CASE abs(off) WHEN 0 THEN CAST(1.0 AS DOUBLE) "
              "WHEN 1 THEN CAST(0.7 AS DOUBLE) ELSE CAST(0.49 AS DOUBLE) END")
LENGTH_BONUS = ("CASE WHEN length(chunk) BETWEEN 80 AND 110 "
                "THEN CAST(1.1 AS DOUBLE) "
                "WHEN length(chunk) BETWEEN 40 AND 120 "
                "THEN CAST(1.05 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END")
TYPE_BONUS = ("CASE CAST(chunk_idx % 3 AS INT) WHEN 0 THEN CAST(1.0 AS DOUBLE) "
              "WHEN 1 THEN CAST(1.15 AS DOUBLE) ELSE CAST(0.95 AS DOUBLE) END")

# Shared DuckDB CTEs mirroring fixed_chunks()/scored_chunks() below.
CHUNK_CTE = """
chunks AS (
  SELECT doc_id, i AS chunk_idx, substr(text, i * 80 + 1, 120) AS chunk
  FROM documents
  CROSS JOIN (SELECT CAST(range AS BIGINT) AS i FROM range(0, 4096)) t
  WHERE i * 80 < length(text)
)"""

SCORED_CTE = CHUNK_CTE + f""",
scored AS (
  SELECT doc_id, chunk_idx, chunk, {SCORE_EXPR} AS score
  FROM chunks
)"""


MAX_CHUNKS_PER_DOC = 4096  # mirror of the oracle's range() cap


def fixed_chunks(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, chunk_idx, chunk): narrow explode, no shuffle.

    Guards matching the oracle exactly: Spark's sequence(0, -1) would yield
    [0, -1] for empty text (phantom rows the oracle never emits), so the
    sequence is floored at one element and the oracle's `i*STRIDE <
    length(text)` predicate is applied as a filter; the oracle's 4096-index
    cap is mirrored too."""
    n = F.expr(
        f"least(greatest(CAST(ceil(length(text) / {STRIDE}.0) AS BIGINT), 1),"
        f" {MAX_CHUNKS_PER_DOC})")
    return (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n - 1)).alias("chunk_idx"),
            "text",
        )
        .filter(F.expr(f"chunk_idx * {STRIDE} < length(text)"))
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"substring(text, CAST(chunk_idx * {STRIDE} + 1 AS INT), {WIDTH})")
            .alias("chunk"),
        )
    )


def scored_chunks(docs: DataFrame) -> DataFrame:
    return fixed_chunks(docs).withColumn("score", F.expr(SCORE_EXPR))


@register(
    "chunk_fixed_width",
    oracle=f"WITH {CHUNK_CTE} SELECT doc_id, chunk_idx, chunk FROM chunks",
)
def chunk_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 chunk-index stability: chunk_idx is a pure function of (doc, offset),
    never of partitioning (reference tools.py:82 relies on list position)."""
    return fixed_chunks(tbl(spark, sf_dir, "documents"))


@register(
    "chunk_stats",
    oracle=f"""
    WITH {CHUNK_CTE}
    SELECT doc_id, COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN length(chunk) BETWEEN 40 AND 120
                     AND trim(chunk) <> '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_valid,
           CAST(SUM(length(chunk)) AS BIGINT) AS total_chars
    FROM chunks GROUP BY doc_id
    """,
)
def chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 chunk-validity gate as data-quality aggregation (reference
    check_chunks, tools.py:18-19: bounds + non-blank + count cap)."""
    ch = fixed_chunks(tbl(spark, sf_dir, "documents"))
    valid = (F.length("chunk").between(40, 120)
             & (F.trim(F.col("chunk")) != "")).cast("bigint")
    return ch.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(valid).alias("n_valid"),
        F.sum(F.length("chunk").cast("bigint")).alias("total_chars"),
    )


@register(
    "page_concat_digest",
    oracle=f"""
    WITH {CHUNK_CTE}
    SELECT doc_id, sha256(string_agg(chunk, '' ORDER BY chunk_idx)) AS concat_sha
    FROM chunks GROUP BY doc_id
    """,
)
def page_concat_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 order-sensitive concat under distribution (reference
    tools.py:41-46 page loop): collect_list is unordered in Spark, so we
    sort (chunk_idx, chunk) structs before joining — the distributed
    equivalent of page-order concat, verified via SHA-256."""
    ch = fixed_chunks(tbl(spark, sf_dir, "documents"))
    return ch.groupBy("doc_id").agg(
        F.sha2(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(chunk_idx, chunk))),"
                       " x -> x.chunk)"),
                "",
            ),
            256,
        ).alias("concat_sha")
    )


@register(
    "context_expand",
    oracle=f"""
    WITH {SCORED_CTE},
    seeds AS (
      SELECT doc_id, chunk_idx, score FROM (
        SELECT doc_id, chunk_idx, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, chunk_idx) AS rn
        FROM scored) s WHERE rn = 1
    ),
    expanded AS (
      SELECT c.doc_id, c.chunk_idx, s.score * ({DECAY_EXPR}) AS exp_score
      FROM seeds s
      CROSS JOIN (SELECT CAST(range AS BIGINT) - 2 AS off FROM range(0, 5)) o
      JOIN chunks c ON c.doc_id = s.doc_id AND c.chunk_idx = s.chunk_idx + off
    )
    SELECT doc_id, chunk_idx, MAX(exp_score) AS exp_score
    FROM expanded GROUP BY doc_id, chunk_idx
    """,
)
def context_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 context expansion (reference tools.py:299-327): top hit per doc →
    neighbors at offsets ±1,±2 with decayed score 0.7^|off|, max per chunk.

    The range join is materialized as an equi-join after exploding the
    offset sequence — Catalyst plans a plain shuffled hash join on
    (doc_id, idx), no O(n²) range scan. Decay via a CASE literal table,
    not pow() (libm parity hazard)."""
    ch = scored_chunks(tbl(spark, sf_dir, "documents"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("chunk_idx"))
    seeds = (ch.withColumn("rn", F.row_number().over(w).cast("bigint"))
             .filter(F.col("rn") == 1)
             .select("doc_id", F.col("chunk_idx").alias("seed_idx"), "score"))
    offsets = seeds.select(
        "doc_id", "seed_idx", "score",
        F.explode(F.sequence(F.lit(-2), F.lit(2))).alias("off"),
    ).withColumn("decay", F.expr(DECAY_EXPR))
    target = ch.select(F.col("doc_id").alias("t_doc"),
                       F.col("chunk_idx").alias("t_idx"))
    joined = offsets.join(
        target,
        on=[F.col("doc_id") == F.col("t_doc"),
            (F.col("seed_idx") + F.col("off")) == F.col("t_idx")],
    ).select(F.col("t_doc").alias("doc_id"),
             F.col("t_idx").alias("chunk_idx"),
             (F.col("score") * F.col("decay")).alias("exp_score"))
    return joined.groupBy("doc_id", "chunk_idx").agg(
        F.max("exp_score").alias("exp_score"))


@register(
    "composite_rank",
    oracle=f"""
    WITH {SCORED_CTE},
    ranked AS (
      SELECT doc_id, chunk_idx,
             score * ({LENGTH_BONUS}) * ({TYPE_BONUS}) AS composite_score
      FROM scored)
    SELECT doc_id, chunk_idx, composite_score FROM ranked
    ORDER BY composite_score DESC, doc_id, chunk_idx
    LIMIT 50
    """,
)
def composite_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 composite-score ranking (reference tools.py:329-367): chained
    length-bonus × type-bonus × base score, global top-k → Catalyst
    TakeOrderedAndProject (no full sort at scale)."""
    ch = scored_chunks(tbl(spark, sf_dir, "documents"))
    return (
        ch.select(
            "doc_id", "chunk_idx",
            F.expr(f"score * ({LENGTH_BONUS}) * ({TYPE_BONUS})")
            .alias("composite_score"),
        )
        .orderBy(F.desc("composite_score"), F.asc("doc_id"), F.asc("chunk_idx"))
        .limit(50)
    )


@register(
    "adaptive_topk",
    oracle=f"""
    WITH {SCORED_CTE},
    with_top AS (
      SELECT doc_id, chunk_idx, score,
             MAX(score) OVER (PARTITION BY doc_id) AS top_score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, chunk_idx) AS rn,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM scored),
    sized AS (
      SELECT *,
             SUM(CASE WHEN score >= CAST(0.6 AS DOUBLE) * top_score
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id) AS nq
      FROM with_top)
    SELECT doc_id, chunk_idx, score, rn
    FROM sized
    WHERE rn <= CASE WHEN nq < 2 THEN least(3, n)
                     WHEN nq > 6 THEN 6 ELSE nq END
    """,
)
def adaptive_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 adaptive top-k, full clamp (reference tools.py:369-391): count
    the results within 60% of the per-group top score, then slice the
    ranking to that count clamped to [max(k//2,2), 2k] with k=3 — fewer
    than min_results quality rows falls back to min(k, n) (the floor the
    round-1 version lacked), more than 2k caps at 2k."""
    ch = scored_chunks(tbl(spark, sf_dir, "documents"))
    wp = Window.partitionBy("doc_id")
    wr = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("chunk_idx"))
    return (
        ch.select(
            "doc_id", "chunk_idx", "score",
            F.max("score").over(wp).alias("top_score"),
            F.row_number().over(wr).cast("bigint").alias("rn"),
            F.count("*").over(wp).alias("n"),
        )
        .withColumn("nq", F.expr(
            "SUM(CASE WHEN score >= CAST(0.6 AS DOUBLE) * top_score"
            " THEN 1 ELSE 0 END)").over(wp))
        .filter(F.expr("rn <= CASE WHEN nq < 2 THEN least(3, n)"
                       " WHEN nq > 6 THEN 6 ELSE nq END"))
        .select("doc_id", "chunk_idx", "score", "rn")
    )
