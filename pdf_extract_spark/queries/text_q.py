"""Text-analysis operators: normalization/truncation (P6), token counting
(F1-F3), quality scoring, rule-based entity extraction (F10/P4/A2/A3/U3),
entity reconciliation (J4), top-N summaries (A7) — SURVEY.md §2.2/§2.4/
§2.7 — plus kernel-backed language-ID / summarization / fingerprint /
SimHash queries (rows-only oracle: not ANSI-SQL-expressible).

SQL-expressible ops are pure Catalyst expressions (whole-stage codegen, no
Python in the hot path); kernel ops are Arrow-batched pandas UDFs over the
same pure functions pytest uses as single-node goldens.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

from . import explode_ne, register, tbl


@register(
    "query_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(substr(text, 1, 500), '\s+', ' ', 'g')) AS q_norm,
           length(trim(regexp_replace(substr(text, 1, 500), '\s+', ' ', 'g')))
             AS q_len  -- DuckDB length() is already BIGINT; Spark side casts
    FROM documents
    """,
)
def query_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 query truncation + whitespace collapse (reference
    tools.py:415-426: first 500 chars, ' '.join(q.split()))."""
    docs = tbl(spark, sf_dir, "documents")
    q_norm = F.trim(F.regexp_replace(F.substring("text", 1, 500), r"\s+", " "))
    return docs.select("doc_id", q_norm.alias("q_norm"),
                       F.length(q_norm).cast("bigint").alias("q_len"))


@register(
    "token_stats",
    oracle=r"""
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             AS n_tokens_ws,
           CAST(floor(length(text) / 3) AS BIGINT) AS token_est,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]', 0))
             AS BIGINT) AS n_tokens_re
    FROM documents
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3 token counting: whitespace tokens, the reference's
    len//3 token estimate (agents.py:412-414), and a BPE-ish regex
    tokenizer (runs-of-letters | runs-of-digits | single other-glyph, so
    CJK text counts per character)."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
        .alias("n_tokens_ws"),
        F.floor(F.length("text") / 3).cast("bigint").alias("token_est"),
        # Spark SQL string literals eat backslashes, hence the double escape
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
        .cast("bigint").alias("n_tokens_re"),
    )


@register(
    "doc_quality",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, length(text) AS n,
             string_split(text, ' ') AS w
      FROM documents),
    feat AS (
      SELECT doc_id, n,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS sum_wlen,
             CAST(len(list_filter(w, x -> x IN ('the','and','of','to','in',
               'for','is','it','that','was'))) AS BIGINT) AS n_stop
      FROM base)
    SELECT doc_id, n_words, sum_wlen, n_stop,
           CAST(CASE WHEN n BETWEEN 200 AND 100000 THEN 0.4 ELSE 0.2 END
            + CASE WHEN CAST(sum_wlen AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0
                   THEN 0.3 ELSE 0.1 END
            + CASE WHEN CAST(n_stop AS DOUBLE) / n_words >= 0.05
                   THEN 0.3 ELSE 0.1 END AS DOUBLE) AS quality
    FROM feat
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (training-data pipeline op): length band, mean word
    length band, stopword ratio — banded weights as exact CASE arithmetic
    (the richer float formula lives in kernels/textstats.quality_score,
    exercised by pytest)."""
    docs = tbl(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.length("text").alias("n"),
                       F.split("text", " ").alias("w"))
    stop = "('the','and','of','to','in','for','is','it','that','was')"
    feat = base.select(
        "doc_id", "n",
        F.size("w").cast("bigint").alias("n_words"),
        F.expr("CAST(aggregate(transform(w, x -> length(x)), 0,"
               " (acc, v) -> acc + v) AS BIGINT)").alias("sum_wlen"),
        F.expr(f"CAST(size(filter(w, x -> x IN {stop})) AS BIGINT)")
        .alias("n_stop"),
    )
    # The banded sum is computed in DECIMAL on both engines (exact) and cast
    # to DOUBLE once at the end — Spark's decimal(1,1) literals vs DuckDB's
    # decimal promote to different precisions, which driver hashes can see.
    quality = F.expr(
        "CAST(CASE WHEN n BETWEEN 200 AND 100000 THEN 0.4 ELSE 0.2 END"
        " + CASE WHEN CAST(sum_wlen AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0"
        "        THEN 0.3 ELSE 0.1 END"
        " + CASE WHEN CAST(n_stop AS DOUBLE) / n_words >= 0.05"
        "        THEN 0.3 ELSE 0.1 END AS DOUBLE)")
    return feat.select("doc_id", "n_words", "sum_wlen", "n_stop",
                       quality.alias("quality"))


# Deterministic entity injection so the multilingual lowercase corpus has
# names/dates/numbers to find (reference extracts from arbitrary documents).
_INJECT = ("'Alice Johnson visited Paris Region on 2024-01-15 and spent"
           " 42.50 units. ' || text")
_SPARK_INJECT = ("concat('Alice Johnson visited Paris Region on 2024-01-15"
                 " and spent 42.50 units. ', text)")

_PAT_DATE = r"\d{4}-\d{2}-\d{2}"
_PAT_NUM = r"\b\d+\.\d+\b"
_PAT_NAME = r"[A-Z][a-z]+ [A-Z][a-z]+"


@register(
    "entity_extract",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN {_INJECT} ELSE text END AS t2
      FROM documents),
    e AS (
      SELECT doc_id, 'dates' AS category,
             list_sort(list_distinct(regexp_extract_all(t2, '{_PAT_DATE}', 0))) AS vals
      FROM t
      UNION ALL
      SELECT doc_id, 'numbers',
             list_sort(list_distinct(regexp_extract_all(t2, '{_PAT_NUM}', 0)))
      FROM t
      UNION ALL
      SELECT doc_id, 'names',
             list_sort(list_distinct(regexp_extract_all(t2, '{_PAT_NAME}', 0)))
      FROM t)
    SELECT doc_id, category, unnest(vals) AS entity
    FROM e WHERE len(vals) > 0
    """,
)
def entity_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 rule-based entity extraction, relational skeleton (reference
    agents.py:242-273 line parser + :604-608 dedup): regexp_extract_all per
    category → distinct → canonical sort (SURVEY A3: the reference's
    list(set()) order is nondeterministic; we sort) → explode."""
    docs = tbl(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr(f"CASE WHEN doc_id % 5 = 0 THEN {_SPARK_INJECT}"
               " ELSE text END").alias("t2"))

    def cat(name: str, pat: str) -> DataFrame:
        # Spark SQL string literals eat backslashes → double-escape the regex
        spat = pat.replace("\\", "\\\\")
        vals = F.array_sort(F.array_distinct(
            F.expr(f"regexp_extract_all(t2, '{spat}', 0)")))
        return t.select("doc_id", F.lit(name).alias("category"),
                        vals.alias("vals"))

    e = (cat("dates", _PAT_DATE)
         .unionByName(cat("numbers", _PAT_NUM))
         .unionByName(cat("names", _PAT_NAME)))
    # explode_ne drops empty-vals rows itself, without the inferred-filter
    # regex recompute a size() pre-filter or plain explode would trigger
    return explode_ne(e, ["doc_id", "category"], "vals", "entity")


@register(
    "reconcile_entities",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             list_distinct(string_split(substr(text, 1,
               CAST(ceil(length(text) / 2.0) AS INT)), ' ')) AS s
      FROM documents),
    b AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
      FROM documents),
    ea AS (SELECT doc_id, unnest(s) AS w FROM a),
    eb AS (SELECT doc_id, unnest(s) AS w FROM b),
    common AS (
      SELECT ea.doc_id, COUNT(*) AS n_common
      FROM ea JOIN eb ON ea.doc_id = eb.doc_id AND ea.w = eb.w
      GROUP BY ea.doc_id)
    SELECT a.doc_id,
           CAST(len(a.s) AS BIGINT) AS n_a,
           CAST(len(b.s) AS BIGINT) AS n_b,
           COALESCE(c.n_common, 0) AS n_common,
           CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / greatest(CAST(len(b.s) AS BIGINT), 1) AS confidence
    FROM a JOIN b ON a.doc_id = b.doc_id
    LEFT JOIN common c ON c.doc_id = a.doc_id
    """,
)
def reconcile_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 search-vs-analysis reconciliation (reference agents.py:743-877,
    LLM-judged): deterministic replacement — overlap ratio between the
    token sets of two independent 'analyses' (half-doc vs full-doc) via
    explode + equi-join, confidence = |A∩B| / |B|."""
    docs = tbl(spark, sf_dir, "documents")
    a = docs.select("doc_id", F.array_distinct(F.split(F.expr(
        "substring(text, 1, CAST(ceil(length(text) / 2.0) AS INT))"), " "))
        .alias("s"))
    b = docs.select("doc_id", F.array_distinct(F.split("text", " ")).alias("s"))
    ea = explode_ne(a, ["doc_id"], "s", "w")  # see explode_ne
    eb = explode_ne(b, ["doc_id"], "s", "w")
    common = (ea.join(eb, ["doc_id", "w"])
              .groupBy("doc_id").agg(F.count("*").alias("n_common")))
    return (
        a.select("doc_id", F.size("s").cast("bigint").alias("n_a"))
        .join(b.select("doc_id", F.size("s").cast("bigint").alias("n_b")),
              "doc_id")
        .join(common, "doc_id", "left")
        .select(
            "doc_id", "n_a", "n_b",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            (F.coalesce("n_common", F.lit(0)).cast("double")
             / F.greatest(F.col("n_b"), F.lit(1))).alias("confidence"),
        )
    )


@register(
    "topn_summaries",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, text,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents)
    SELECT source,
           string_agg(substr(text, 1, 80), ' | ' ORDER BY doc_id) AS fallback_summary,
           COUNT(*) AS n_docs
    FROM ranked WHERE rn <= 3 GROUP BY source
    """,
)
def topn_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 top-N fallback summaries (reference agents.py:546,642: join first
    3-5 summaries on failure): rank per group, ordered concat of the
    first-80-char 'summaries'."""
    docs = tbl(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("source", "doc_id",
                    F.substring("text", 1, 80).alias("head"),
                    F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .groupBy("source")
        .agg(
            F.expr("array_join(transform(array_sort(collect_list("
                   "struct(doc_id, head))), x -> x.head), ' | ')")
            .alias("fallback_summary"),
            F.count("*").alias("n_docs"),
        )
    )


# Language-ID as a pure relational op (SQL-expressible twin of the kernel
# heuristic): stopword hit-rate argmax over fixed probe order + CJK ratio.
_LANG_PROBES = {
    "en": ("the and of to in is it you that was for on are with as at be "
           "this have from or had by word but not what all were when your "
           "can said there use each which she how their"),
    "fr": ("le la les de des du et un une est que qui dans pour sur avec "
           "ne pas au aux ce cette il elle nous vous ils sont été être "
           "plus mais ou donc car si"),
    "es": ("el la los las de del y un una es que en por para con no se su "
           "al lo como más pero sus le ya o este sí porque esta entre "
           "cuando muy sin sobre"),
    "de": ("der die das und von zu den dem ein eine ist nicht mit sich des "
           "auf für im als auch es an werden aus er hat dass sie nach wird "
           "bei einer um am sind noch wie"),
}


def _hits_expr(lang: str, filter_fn: str, len_fn: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANG_PROBES[lang].split())
    return f"{len_fn}({filter_fn}(w, x -> x IN ({lst})))"


@register(
    "lang_id_sql",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS w,
             length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS n_cjk,
             length(text) AS n
      FROM documents),
    h AS (
      SELECT doc_id, lang, n_cjk, n,
             {_hits_expr('en', 'list_filter', 'len')} AS en_h,
             {_hits_expr('fr', 'list_filter', 'len')} AS fr_h,
             {_hits_expr('es', 'list_filter', 'len')} AS es_h,
             {_hits_expr('de', 'list_filter', 'len')} AS de_h
      FROM t)
    SELECT doc_id, lang,
           CASE WHEN n > 0 AND CAST(n_cjk AS DOUBLE) / n > 0.05 THEN 'zh'
                WHEN greatest(en_h, fr_h, es_h, de_h) = 0 THEN 'und'
                WHEN de_h > greatest(en_h, fr_h, es_h) THEN 'de'
                WHEN es_h > greatest(en_h, fr_h) THEN 'es'
                WHEN fr_h > en_h THEN 'fr'
                ELSE 'en' END AS lang_pred,
           lang = CASE WHEN n > 0 AND CAST(n_cjk AS DOUBLE) / n > 0.05
                       THEN 'zh'
                WHEN greatest(en_h, fr_h, es_h, de_h) = 0 THEN 'und'
                WHEN de_h > greatest(en_h, fr_h, es_h) THEN 'de'
                WHEN es_h > greatest(en_h, fr_h) THEN 'es'
                WHEN fr_h > en_h THEN 'fr'
                ELSE 'en' END AS correct
    FROM h
    """,
)
def lang_id_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID as a RELATIONAL operator (training-data op, fully
    JVM-side — the pandas-UDF kernel twin is `lang_id`): per-language
    stopword hit counts via higher-order filter, argmax with the kernel's
    fixed first-wins probe order (en,fr,es,de), CJK-ratio gate for zh.
    Narrow projection — no shuffle, codegen-friendly."""
    docs = tbl(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang",
        F.split(F.lower("text"), " ").alias("w"),
        F.length(F.regexp_replace("text", "[^一-鿿]", "")).alias("n_cjk"),
        F.length("text").alias("n"))
    h = t.select(
        "doc_id", "lang", "n_cjk", "n",
        *[F.expr(_hits_expr(lang, "filter", "size"))
          .alias(f"{lang}_h") for lang in ("en", "fr", "es", "de")])
    pred = F.expr(
        "CASE WHEN n > 0 AND CAST(n_cjk AS DOUBLE) / n > 0.05 THEN 'zh'"
        " WHEN greatest(en_h, fr_h, es_h, de_h) = 0 THEN 'und'"
        " WHEN de_h > greatest(en_h, fr_h, es_h) THEN 'de'"
        " WHEN es_h > greatest(en_h, fr_h) THEN 'es'"
        " WHEN fr_h > en_h THEN 'fr'"
        " ELSE 'en' END")
    return h.select("doc_id", "lang", pred.alias("lang_pred"),
                    (F.col("lang") == pred).alias("correct"))


from ..kernels.textstats import EN_STOPWORDS as _EN_STOP  # noqa: E402
from .dedup_q import _duck_shingles, _spark_shingles  # noqa: E402

_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(_EN_STOP))


@register(
    "fingerprint_sql",
    oracle=f"""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, {_duck_shingles(5)} AS shingles
           FROM s WHERE len(w) >= 5)
    SELECT doc_id,
           unnest(list_slice(list_sort(list_transform(shingles,
                  x -> sha256(x))), 1, 8)) AS fp
    FROM sh
    """,
)
def fingerprint_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint as a RELATIONAL operator (the pandas-UDF twin
    is `fingerprint_docs`): bottom-8 sketch of word 5-shingles under
    sha256 — the same portable-hash discipline as dedup_minhash_lsh, so
    both engines compute the identical sketch. Winnowing-style dedup
    fingerprint, narrow projection, no shuffle."""
    docs = tbl(spark, sf_dir, "documents")
    sig = (docs.withColumn("w", F.split("text", " "))
           .filter(F.size("w") >= 5)
           .select("doc_id", F.expr(_spark_shingles(5)).alias("sh")))
    sk = F.expr("slice(array_sort(transform(sh, s -> sha2(s, 256))), 1, 8)")
    return explode_ne(sig, ["doc_id"], sk, "fp")  # see explode_ne


@register(
    "summarize_sql",
    oracle=f"""
    WITH lst AS (
      SELECT doc_id,
             list_filter(list_transform(
               regexp_extract_all(text, '[^.!?]+[.!?]?'), s -> trim(s)),
               s -> s <> '') AS sl
      FROM documents),
    sents AS (
      SELECT doc_id, unnest(sl) AS sent,
             generate_subscripts(sl, 1) - 1 AS pos
      FROM lst WHERE len(sl) > 0),
    dw AS (
      SELECT doc_id,
             unnest(list_filter(regexp_extract_all(lower(text), '[a-z'']+'),
                    w -> w NOT IN ({_STOP_SQL}))) AS wd
      FROM documents),
    freq AS (SELECT doc_id, wd, COUNT(*) AS f FROM dw GROUP BY doc_id, wd),
    sw AS (
      SELECT doc_id, pos,
             unnest(list_filter(regexp_extract_all(lower(sent), '[a-z'']+'),
                    w -> w NOT IN ({_STOP_SQL}))) AS wd
      FROM sents),
    sc AS (
      SELECT s.doc_id, s.pos,
             CAST(CAST(SUM(f.f) AS BIGINT) AS DOUBLE) / COUNT(*) AS score
      FROM sw s JOIN freq f ON f.doc_id = s.doc_id AND f.wd = s.wd
      GROUP BY s.doc_id, s.pos),
    ranked AS (
      SELECT se.doc_id, se.sent, coalesce(sc.score, 0.0) AS score,
             row_number() OVER (PARTITION BY se.doc_id
                                ORDER BY coalesce(sc.score, 0.0) DESC,
                                         se.pos) AS rn
      FROM sents se LEFT JOIN sc
        ON sc.doc_id = se.doc_id AND sc.pos = se.pos)
    SELECT doc_id, sent AS top_sentence, score AS top_score
    FROM ranked WHERE rn = 1
    """,
)
def summarize_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractive summarization's scoring core as a RELATIONAL operator
    (the pandas-UDF twin is `summarize_docs`): classic Luhn sentence
    scoring — document-level non-stopword frequency, per-sentence mean —
    and the argmax sentence per document (score desc, position asc).
    Integer frequency sums divide to bit-identical doubles in both
    engines, so the driver's value hash covers the float column too."""
    docs = tbl(spark, sf_dir, "documents")
    # posexplode_outer + isNotNull: same inferred-filter dodge as
    # explode_ne (sentence lists are null-element-free)
    sents = docs.select(
        "doc_id",
        F.posexplode_outer(F.expr(
            "filter(transform(regexp_extract_all(text,"
            " '[^.!?]+[.!?]?', 0), s -> trim(s)), s -> s != '')"))
        .alias("pos", "sent")).filter(F.col("sent").isNotNull())
    word_of = ("filter(regexp_extract_all(lower({src}), '[a-z'']+', 0),"
               f" w -> NOT w IN ({_STOP_SQL}))")
    dw = explode_ne(docs, ["doc_id"],
                    F.expr(word_of.format(src="text")), "wd")
    freq = dw.groupBy("doc_id", "wd").agg(F.count("*").alias("f"))
    sw = explode_ne(sents, ["doc_id", "pos"],
                    F.expr(word_of.format(src="sent")), "wd")
    sc = (sw.join(freq, ["doc_id", "wd"])
          .groupBy("doc_id", "pos")
          .agg((F.sum("f").cast("double") / F.count("*")).alias("score")))
    ranked = (sents.join(sc, ["doc_id", "pos"], "left")
              .withColumn("score", F.coalesce("score", F.lit(0.0)))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("doc_id")
                  .orderBy(F.desc("score"), F.asc("pos")))))
    return (ranked.filter(F.col("rn") == 1)
            .select("doc_id", F.col("sent").alias("top_sentence"),
                    F.col("score").alias("top_score")))


# --- kernel-backed queries (rows-only driver check; goldens in pytest) ----

@register("lang_id", oracle=None)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID kernel (training-data op): stopword/CJK heuristic pandas
    UDF, compared against the fixture's labeled lang column."""
    docs = tbl(spark, sf_dir, "documents")

    @F.pandas_udf(StringType())
    def detect(texts: pd.Series) -> pd.Series:
        from pdf_extract_spark.kernels.textstats import detect_language
        return texts.map(lambda t: detect_language(t or ""))

    return docs.select(
        "doc_id", "lang",
        detect(F.col("text")).alias("lang_pred"),
    ).withColumn("correct", F.col("lang") == F.col("lang_pred"))


@register("summarize_docs", oracle=None)
def summarize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 map-side extractive summary (reference agents.py:152-169: ≤100
    words per chunk) as an Arrow-batched pandas UDF."""
    docs = tbl(spark, sf_dir, "documents")

    @F.pandas_udf(StringType())
    def summ(texts: pd.Series) -> pd.Series:
        from pdf_extract_spark.kernels.summarize import summarize_extractive
        return texts.map(lambda t: summarize_extractive(t or ""))

    return docs.select("doc_id", summ(F.col("text")).alias("summary")) \
               .withColumn("summary_words", F.size(F.split("summary", " ")))


@register("fingerprint_docs", oracle=None)
def fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style sketch of word
    5-shingles) — training-data dedup sketch, kernel-backed."""
    docs = tbl(spark, sf_dir, "documents")

    @F.pandas_udf(StringType())
    def fp(texts: pd.Series) -> pd.Series:
        from pdf_extract_spark.kernels.textstats import rolling_fingerprint
        return texts.map(
            lambda t: ",".join(f"{h:016x}" for h in rolling_fingerprint(t or "")))

    return docs.select("doc_id", fp(F.col("text")).alias("fingerprint"))


def _simhash_schema_rows(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pdf_extract_spark.kernels.textstats import simhash64
    for pdf in pdfs:
        sh = pdf["text"].map(lambda t: simhash64(t or ""))
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "simhash": sh.map(lambda v: f"{v:016x}"),
            # 4 bands of 16 bits for banded hamming candidate generation
            "band0": sh.map(lambda v: (v >> 0) & 0xFFFF),
            "band1": sh.map(lambda v: (v >> 16) & 0xFFFF),
            "band2": sh.map(lambda v: (v >> 32) & 0xFFFF),
            "band3": sh.map(lambda v: (v >> 48) & 0xFFFF),
        })


@register("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit simhash kernel → 4×16-bit bands → banded
    candidates (Hamming ≤ 3 pairs must share ≥1 band) — the standard
    Manku/Jain/Sarma web-dedup shape; no cross join.

    Candidate generation is a bucket groupBy + in-array pair expansion,
    NOT a band self-join: one shuffle on the band key, and buckets larger
    than MAX_BUCKET are dropped BEFORE the O(bucket²) expansion — a
    boilerplate-heavy web corpus makes one hot 16-bit band bucket
    quadratic otherwise (same discipline as dedup_minhash_lsh)."""
    from .dedup_q import MAX_BUCKET

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    sig = docs.mapInPandas(
        _simhash_schema_rows,
        schema=("doc_id long, simhash string, band0 long, band1 long, "
                "band2 long, band3 long"),
    )
    bands = sig.select(
        "doc_id", "simhash",
        F.posexplode(F.array("band0", "band1", "band2", "band3"))
        .alias("b", "band_key"))
    # ids sorts by doc_id (unique), so i<j expansion ⇒ a_id < b_id
    buckets = (
        bands.groupBy("b", "band_key")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash")))
             .alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
    )
    pair_expr = (
        "flatten(transform(sequence(1, size(ids) - 1), i -> "
        "transform(slice(ids, i + 1, size(ids) - i), "
        "y -> struct(element_at(ids, i).doc_id AS a_id, y.doc_id AS b_id, "
        "element_at(ids, i).simhash AS a_sim, y.simhash AS b_sim))))"
    )
    return (explode_ne(buckets, [], F.expr(pair_expr), "p")
            .select("p.a_id", "p.b_id", "p.a_sim", "p.b_sim")
            .distinct())


@register(
    "report_projection",
    oracle="""
    SELECT doc_id,
           to_json(struct_pack(
             doc_id := doc_id, lang := lang,
             token_est := CAST(floor(length(text) / 3) AS BIGINT),
             head := substr(text, 1, 40))) AS report
    FROM documents
    """,
)
def report_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 report serialization (reference FinalOutput.model_dump_json,
    agents.py:938-969): to_json over an explicit struct — field order and
    formatting verified byte-identical against DuckDB's serializer."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.to_json(F.struct(
            F.col("doc_id"), F.col("lang"),
            F.floor(F.length("text") / 3).cast("bigint").alias("token_est"),
            F.substring("text", 1, 40).alias("head"),
        )).alias("report"),
    )


@register(
    "json_fence_repair",
    oracle="""
    WITH fenced AS (
      SELECT event_id,
             '```json' || chr(10) || props || chr(10) || '```' AS raw
      FROM events),
    stripped AS (
      SELECT event_id,
             replace(replace(raw, '```json' || chr(10), ''),
                     chr(10) || '```', '') AS content
      FROM fenced)
    SELECT event_id,
           length(content) >= 10 AND content LIKE '{%' AS plausible,
           COALESCE(CAST(json_extract_string(content, '$.k') AS BIGINT), -1)
             AS k
    FROM stripped
    """,
)
def json_fence_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 markdown-fence strip + P8 JSON-plausibility + F8 schema repair
    (reference agents.py:309-351): wrap each props payload in ```json
    fences (simulating LLM output), strip, gate on plausibility, parse
    with null-backfill (missing key → -1)."""
    ev = tbl(spark, sf_dir, "events")
    fenced = ev.select(
        "event_id",
        F.concat(F.lit("```json\n"), F.col("props"), F.lit("\n```"))
        .alias("raw"))
    stripped = fenced.select(
        "event_id",
        F.replace(F.replace("raw", F.lit("```json\n"), F.lit("")),
                  F.lit("\n```"), F.lit("")).alias("content"))
    return stripped.select(
        "event_id",
        ((F.length("content") >= 10) & F.col("content").like("{%"))
        .alias("plausible"),
        F.coalesce(F.get_json_object("content", "$.k").cast("bigint"),
                   F.lit(-1)).alias("k"),
    )


@register("analyze_docs", oracle=None)
def analyze_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full M5 analysis kernel pipeline over the documents table (chunk →
    summarize → NER → verify), rows-only check; goldens in
    tests/test_analyze.py."""
    from ..plans.analyze import analyze_extracted

    docs = (tbl(spark, sf_dir, "documents")
            .select(F.col("doc_id").cast("string").alias("url"),
                    "lang", "text"))
    out = analyze_extracted(docs)
    return out.select(F.col("url").cast("bigint").alias("doc_id"),
                      "summary", "n_entities", "n_chunks",
                      "confidence", "verified")


@register(
    "doc_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    base AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
             CASE WHEN len(words) >= 2 THEN
               list_transform(range(1, len(words)),
                              i -> words[i] || ' ' || words[i + 1])
             ELSE [] END AS grams
      FROM w),
    g AS (SELECT doc_id, unnest(grams) AS gram FROM base),
    gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
    top AS (SELECT doc_id, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n_grams
            FROM gc GROUP BY doc_id)
    SELECT b.doc_id, b.n_words,
           CAST(1.0 AS DOUBLE)
             - CAST(b.n_distinct AS DOUBLE) / b.n_words AS frac_dup_words,
           CAST(t.top_c AS DOUBLE) / t.n_grams AS top_bigram_frac,
           (CAST(1.0 AS DOUBLE) - CAST(b.n_distinct AS DOUBLE) / b.n_words
              > CAST(0.7 AS DOUBLE)
            OR CAST(t.top_c AS DOUBLE) / t.n_grams > CAST(0.2 AS DOUBLE))
             AS repetitive
    FROM base b JOIN top t ON b.doc_id = t.doc_id
    WHERE b.n_words >= 2
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (training-data op, the
    Gopher-rules shape: duplicate-word fraction and most-frequent-bigram
    fraction, with reject thresholds). One explode + two aggregations on
    doc_id — a single shuffle key end to end, no joins across docs."""
    docs = tbl(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.split("text", " ").alias("words"),
    ).select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("words")).cast("bigint").alias("n_distinct"),
        F.expr("CASE WHEN size(words) >= 2 THEN"
               " transform(sequence(1, size(words) - 1),"
               " i -> concat(element_at(words, i), ' ',"
               " element_at(words, i + 1)))"
               " ELSE array() END").alias("grams"),
    ).filter(F.col("n_words") >= 2)
    g = explode_ne(base, ["doc_id"], "grams", "gram")  # see explode_ne
    gc = g.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    top = gc.groupBy("doc_id").agg(
        F.max("c").alias("top_c"),
        F.sum("c").cast("bigint").alias("n_grams"))
    dup = F.expr("CAST(1.0 AS DOUBLE)"
                 " - CAST(n_distinct AS DOUBLE) / n_words")
    big = F.expr("CAST(top_c AS DOUBLE) / n_grams")
    return (base.select("doc_id", "n_words", "n_distinct")
            .join(top, "doc_id")
            .select(
                "doc_id", "n_words",
                dup.alias("frac_dup_words"),
                big.alias("top_bigram_frac"),
                ((dup > F.expr("CAST(0.7 AS DOUBLE)"))
                 | (big > F.expr("CAST(0.2 AS DOUBLE)")))
                .alias("repetitive")))


# --- unicode/control-character normalization --------------------------------
# The janitorial first pass every crawl corpus needs: strip C0 control
# characters, normalize CRLF, collapse runs of spaces/tabs, trim. The
# corpus is clean synthetic prose, so deterministic noise is injected per
# doc first (the pii_scrub/_INJECT discipline): a C0 byte, doc_id-varied
# tab runs, a CRLF, and trailing spaces. Regexes stay in the Java∩RE2
# subset (char classes, \x escapes — no backreferences, no lookaround).

_SPARK_NOISE = ("concat(chr(1), repeat(chr(9), CAST(doc_id % 3 AS INT) + 1),"
                " 'hdr', chr(13), chr(10), text, '   ')")
_DUCK_NOISE = ("chr(1) || repeat(chr(9), CAST(doc_id % 3 AS INT) + 1)"
               " || 'hdr' || chr(13) || chr(10) || text || '   '")

# pass order matters and is identical on both engines
_NORM_PASSES = [
    (r"\r\n", "\n"),                              # CRLF -> LF
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F]", ""),        # strip C0 controls
    (r"[ \t]+", " "),                              # collapse blanks
    (r"^ +| +\z", ""),                             # trim (anchored, no trim()
]                                                  # dialect drift)
# the trailing-trim anchor is \z (end of TEXT — identical in Java and
# RE2), not $: Java '$' also matches before a final line terminator
# while RE2's does not, so 'text   \n' would trim on Spark only.


@register(
    "text_normalize",
    oracle=f"""
    WITH n AS (SELECT doc_id, {_DUCK_NOISE} AS raw FROM documents),
    c AS (SELECT doc_id, raw,
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(raw, '{_NORM_PASSES[0][0]}', '{_NORM_PASSES[0][1]}', 'g'),
                   '{_NORM_PASSES[1][0]}', '', 'g'),
                   '{_NORM_PASSES[2][0]}', ' ', 'g'),
                   '{_NORM_PASSES[3][0]}', '', 'g') AS clean
          FROM n)
    SELECT doc_id, clean,
           CAST(length(raw) AS BIGINT) AS raw_len,
           CAST(length(clean) AS BIGINT) AS clean_len,
           CAST(length(raw) - length(clean) AS BIGINT) AS n_removed,
           sha256(clean) AS clean_sha
    FROM c
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-char/whitespace normalization over noise-injected docs;
    emits the cleaned text plus byte accounting and a content digest
    (what an incremental pipeline keys re-extraction on).

    Scale: pure narrow map — four codegen'd JVM regex passes, no
    shuffle, no Python. DuckDB needs the 'g' flag for global
    replacement; Spark's regexp_replace is global by default."""
    docs = tbl(spark, sf_dir, "documents")
    e: object = F.expr(_SPARK_NOISE)
    raw = e
    for pat, rep in _NORM_PASSES:
        e = F.regexp_replace(e, pat, rep)
    return docs.select(
        "doc_id", e.alias("clean"),
        F.length(raw).cast("bigint").alias("raw_len"),
        F.length(e).cast("bigint").alias("clean_len"),
        (F.length(raw) - F.length(e)).cast("bigint").alias("n_removed"),
        F.sha2(e, 256).alias("clean_sha"))


# --- winnowing fingerprints (Schleimer et al. 2003) -------------------------
# The MOSS local document fingerprint: hash every K-word gram, slide a
# W-gram window, keep the RIGHTMOST MINIMAL hash per window, distinct the
# selections. Guarantees any shared run of >= K+W-1 words produces a
# shared fingerprint — the locality property top-N sha slices
# (fingerprint_sql) lack. Hashes are fixed-width sha256 hex prefixes, so
# lexicographic order == numeric order on both engines.

WINNOW_K = 3  # words per gram
WINNOW_W = 4  # grams per window


@register(
    "winnow_fingerprint",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    gr AS (SELECT doc_id,
                  list_transform(range(1, len(w) - {WINNOW_K} + 2),
                    i -> concat_ws(' ', {", ".join(
                        f"w[i + {j}]" for j in range(WINNOW_K))})) AS grams
           FROM w WHERE len(w) >= {WINNOW_K + WINNOW_W - 1}),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(grams) + 1),
                   i -> struct_pack(pos := i - 1, gr := grams[i]))) AS u,
                 len(grams) AS ng
          FROM gr),
    h AS (SELECT doc_id, ng, u.pos AS pos,
                 substr(sha256(u.gr), 1, 16) AS fp
          FROM g),
    win AS (SELECT doc_id, pos, fp,
                   unnest(range(greatest(0, pos - {WINNOW_W} + 1),
                                least(pos, ng - {WINNOW_W}) + 1)) AS wn
            FROM h),
    sel AS (SELECT doc_id, pos, fp,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, wn
                                      ORDER BY fp, pos DESC) AS rn
            FROM win)
    SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp
    FROM sel WHERE rn = 1
    """,
)
def winnow_fingerprint(spark: SparkSession, sf_dir: str,
                       hash_fn: str = "sha") -> DataFrame:
    """Winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003): positional
    {WINNOW_K}-gram hashes, rightmost-minimum selection per sliding
    {WINNOW_W}-window, distinct (doc, pos, fp) output. The plagiarism/
    near-dup fingerprint with the (K+W-1)-word shared-run guarantee.

    Scale: winnow selection is a strictly PER-DOCUMENT sequential scan,
    so the whole query is ZERO-SHUFFLE map-side work — the fps array is
    built per doc with transform(), each window's rightmost-minimum is an
    aggregate() fold over {WINNOW_W} array slots (a left-to-right scan
    keeping later ties, O(ng·W) comparisons, no allocation beyond the
    arrays), duplicates collapse with array_distinct INSIDE the doc (a
    fingerprint can only repeat within its own document — (doc, pos, fp)
    is per-doc by construction), and the result explodes straight to
    output rows. The round-4 shape instead exploded every gram into its
    ≤{WINNOW_W} covering windows and paid a corpus-sized groupBy(doc,
    window) exchange on 25-char string keys — measured 5.2→0.6 s (sha) /
    5.7→0.5 s (xx) at sf0.1/local[32], byte-identical output. Per-row
    state is bounded by a single document's own word count (the
    collect_list reassembly bound used across the dedup family). The
    fixture table is one parquet file → ~3 scan partitions, so the build
    is fanned out by an up-front repartition (the _aug_docs discipline;
    a real crawl table's split count is data-determined).

    ``hash_fn`` selects the gram hash: "sha" (default) is the
    oracle-parity sha256 prefix over the gram STRING, portable to DuckDB;
    "xx" is the production path, and it never builds a gram string at
    all — each word is xxhash64'd ONCE, and every gram fingerprint is a
    variadic xxhash64 over its {WINNOW_K} word-hash longs (the
    _shingle_sets idiom from plans/corpus.py). Rendered as 16 lowercase
    hex chars so lexicographic order == unsigned numeric order and every
    downstream expression is hash-agnostic. Winnowing only needs a hash
    that acts as a random order on grams; tests/test_plans.py proves
    both variants select exactly the rightmost-minimum winnow of their
    hash sequence and both honor the shared-run guarantee."""
    docs = (tbl(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism, "doc_id"))
    w = (docs.select("doc_id", F.split("text", " ").alias("w"))
         .filter(F.size("w") >= WINNOW_K + WINNOW_W - 1))
    if hash_fn == "sha":
        joined = ", ".join(f"element_at(w, i + {j + 1})"
                           for j in range(WINNOW_K))
        fps = F.expr(
            f"transform(sequence(0, size(w) - {WINNOW_K}), i -> "
            f"substring(sha2(concat_ws(' ', {joined}), 256), 1, 16))")
        d = w
    elif hash_fn == "xx":
        whs = ", ".join(f"element_at(wh, i + {j + 1})"
                        for j in range(WINNOW_K))
        fps = F.expr(
            f"transform(sequence(0, size(w) - {WINNOW_K}),"
            f" i -> lower(lpad(hex(xxhash64({whs})), 16, '0')))")
        d = w.withColumn("wh", F.expr("transform(w, x -> xxhash64(x))"))
    else:  # pragma: no cover - guarded misuse
        raise ValueError(f"hash_fn must be 'sha' or 'xx', got {hash_fn!r}")
    # rightmost-minimum per sliding window: a fold keeping later ties
    # (<=), so ties resolve to the RIGHTMOST position — Schleimer et
    # al.'s rule. All array-domain; no explode until final output rows.
    sel = F.expr(
        f"array_distinct(transform(sequence(0, size(fps) - {WINNOW_W}),"
        f" wn -> aggregate(sequence(wn + 1, wn + {WINNOW_W - 1}),"
        f" struct(element_at(fps, wn + 1) AS m, wn AS p),"
        f" (acc, i) -> IF(element_at(fps, i + 1) <= acc.m,"
        f" struct(element_at(fps, i + 1) AS m, i AS p), acc))))")
    return (d.select("doc_id", fps.alias("fps"))
            .select("doc_id", F.explode(sel).alias("s"))
            .select("doc_id", F.col("s.p").cast("bigint").alias("pos"),
                    F.col("s.m").alias("fp")))


@register("winnow_fingerprint_xx")  # rows-only: xxhash64 has no DuckDB twin
def winnow_fingerprint_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash winnowing: same selection plan as
    winnow_fingerprint, but fingerprints are variadic xxhash64 combines
    of once-hashed word longs — NO gram string is ever materialized
    (xxhash64 has no DuckDB equivalent, dedup_q.py:12, so this entry is
    rows-only by construction; the sha twin keeps the value-exact
    oracle). Fingerprint VALUES differ by design — winnowing's
    guarantees are hash-agnostic, and the selection logic is proven
    permutation-equivalent in tests/test_plans.py (local-reference
    winnow equality for BOTH hash functions, plus the shared-run
    guarantee on the xx path)."""
    return winnow_fingerprint(spark, sf_dir, hash_fn="xx")
