"""Training-data pipeline ops, round 3 additions: PII scrubbing, sequence
packing, per-language quota sampling, duplicated-substring detection, URL
canonicalization, and deterministic train/val/test splitting — the
corpus-preparation steps a 100 TB web-text pipeline runs between
extraction (operators/extract.py) and training, generalizing the
reference's single-document flow (/root/reference/modules/agents.py) the
same way dedup_q generalizes its keep-best dedup.

Parity contract (queries/__init__.py): every computed column is aliased
identically in Spark and DuckDB; integer outputs are BIGINT on both sides
(DuckDB window SUM yields HUGEINT — always cast); regexes use the
Java∩RE2-compatible subset (char classes, bounded repetition, \\b, \\d)
so both engines match identical spans; float divisions share the exact
expression shape.

Scale notes per query are in the docstrings; the common theme: every op
here is linear — one groupBy or a two-pass prefix-sum — with no pair
expansion and no single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import REGISTRY, explode_ne, register, tbl
from .dedup_q import _DUCK_AUG, _aug_docs, _duck_shingles, _spark_shingles

# --- PII scrubbing ---------------------------------------------------------
# The corpus is synthetic lowercase prose with no natural PII, so each doc
# gets a deterministic injected preamble (same discipline as text_q._INJECT
# for entity extraction): one email, one IPv4, one phone per doc, varying
# with doc_id so redaction counts and scrubbed bytes are non-trivial.

_PAT_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PAT_IP = r"\b\d{1,3}(\.\d{1,3}){3}\b"
_PAT_PHONE = r"\b555-\d{4}\b"

_SPARK_PII_INJECT = (
    "concat('contact u', CAST(doc_id % 50 AS STRING), '@mail.example or "
    "10.2.', CAST(doc_id % 256 AS STRING), '.7 tel 555-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), '. ', text)")
_DUCK_PII_INJECT = (
    "'contact u' || CAST(doc_id % 50 AS VARCHAR) || '@mail.example or "
    "10.2.' || CAST(doc_id % 256 AS VARCHAR) || '.7 tel 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '. ' || text")


@register(
    "pii_scrub",
    oracle=f"""
    WITH inj AS (SELECT doc_id, {_DUCK_PII_INJECT} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PAT_EMAIL}', 0)) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PAT_IP}', 0)) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(t, '{_PAT_PHONE}', 0)) AS BIGINT)
             AS n_phones,
           sha256(regexp_replace(regexp_replace(regexp_replace(t,
               '{_PAT_EMAIL}', '<EMAIL>', 'g'),
               '{_PAT_IP}', '<IP>', 'g'),
               '{_PAT_PHONE}', '<PHONE>', 'g')) AS scrub_sha
    FROM inj
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (training-data pipeline op): count and replace emails,
    IPv4 addresses, and phone numbers with typed placeholders; the output
    carries sha256 of the scrubbed text so the oracle proves byte-identical
    redaction, not just identical counts.

    Scale: a narrow per-row map — no shuffle, whole-stage codegen'd JVM
    regex (Java and RE2 agree on this pattern subset; replacement order
    email → ip → phone is fixed so overlapping matches resolve
    identically). At 100 TB this runs at scan speed."""
    docs = tbl(spark, sf_dir, "documents")
    t = F.expr(_SPARK_PII_INJECT)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PAT_EMAIL, "<EMAIL>"),
            _PAT_IP, "<IP>"),
        _PAT_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_PAT_EMAIL), F.lit(0)))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PAT_IP), F.lit(0)))
        .cast("bigint").alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(_PAT_PHONE), F.lit(0)))
        .cast("bigint").alias("n_phones"),
        F.sha2(scrubbed, 256).alias("scrub_sha"),
    )


# --- sequence packing ------------------------------------------------------

PACK_BUDGET = 128  # tokens per training sequence
PACK_CHUNK = 4096  # doc_ids per prefix-sum partition (two-pass global cumsum)


@register(
    "seq_pack",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM d),
    s AS (
      SELECT doc_id, n_tok, off,
             CAST(unnest(range(off // {PACK_BUDGET},
                               (off + n_tok - 1) // {PACK_BUDGET} + 1))
               AS BIGINT) AS seq_id
      FROM c)
    SELECT seq_id, doc_id,
           GREATEST(off, seq_id * {PACK_BUDGET}) AS tok_begin,
           LEAST(off + n_tok, (seq_id + 1) * {PACK_BUDGET}) AS tok_end
    FROM s
    """,
)
def seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: concatenate the corpus in doc_id
    order and slice it into fixed {PACK_BUDGET}-token training sequences —
    the GPT-style concat-then-chunk packing. Output maps each doc to every
    sequence it intersects with its global token interval clipped to the
    sequence, so a loader can assemble any seq_id from exactly these rows.

    Scale shape — the global exclusive prefix sum over 10^12 docs is NOT a
    single-partition window (`Window.orderBy` with no partition key
    serializes the corpus through one task). It is a TWO-LEVEL distributed
    prefix sum: per-range token sums ({PACK_CHUNK} docs per range) roll up
    into super-range sums ({PACK_CHUNK}² docs per super-range), so the one
    unavoidable unpartitioned cumsum runs over |corpus|/{PACK_CHUNK}² rows
    — ~6×10⁴ at 10^12 docs, metadata scale — while every corpus-sized
    window partitions by its range key. All passes are exact integer
    arithmetic, so the result is bit-identical to the oracle's
    single-threaded window."""
    docs = tbl(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    ).withColumn("pid", F.expr(f"doc_id DIV {PACK_CHUNK}"))
    # level 1: per-range partial sums (|corpus|/PACK_CHUNK rows)
    psums = (d.groupBy("pid").agg(F.sum("n_tok").alias("ptok"))
             .withColumn("spid", F.expr(f"pid DIV {PACK_CHUNK}")))
    # level 2: super-range sums — the only unpartitioned cumsum, over
    # |corpus|/PACK_CHUNK² rows (one small task at any realistic corpus)
    wsuper = (Window.orderBy("spid")
              .rowsBetween(Window.unboundedPreceding, -1))
    s_pref = (psums.groupBy("spid").agg(F.sum("ptok").alias("stok"))
              .select("spid",
                      F.coalesce(F.sum("stok").over(wsuper), F.lit(0))
                      .alias("sprefix")))
    # range prefix = super prefix + cumsum of ranges within the super-range
    wrange = (Window.partitionBy("spid").orderBy("pid")
              .rowsBetween(Window.unboundedPreceding, -1))
    prefixes = (psums.join(F.broadcast(s_pref), "spid")
                .select("pid", (F.col("sprefix")
                                + F.coalesce(F.sum("ptok").over(wrange),
                                             F.lit(0))).alias("prefix")))
    # final pass: within-range exclusive cumsum + range prefix. No
    # broadcast hint on prefixes: it is |corpus|/PACK_CHUNK rows — AQE
    # broadcasts it at sandbox scale, and at 10^12 docs it plans as a
    # shuffled join on pid, the same key the window below partitions by
    wlocal = (Window.partitionBy("pid").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, -1))
    c = (d.join(prefixes, "pid")
         .withColumn("off", F.col("prefix")
                     + F.coalesce(F.sum("n_tok").over(wlocal), F.lit(0))))
    B = PACK_BUDGET
    s = explode_ne(c, ["doc_id", "n_tok", "off"], F.sequence(
        F.expr(f"off DIV {B}"),
        F.expr(f"(off + n_tok - 1) DIV {B}")), "seq_id")
    return s.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        F.greatest("off", F.expr(f"seq_id * {B}")).cast("bigint")
        .alias("tok_begin"),
        F.least(F.expr("off + n_tok"), F.expr(f"(seq_id + 1) * {B}"))
        .cast("bigint").alias("tok_end"),
    )


# --- per-language quota sampling ------------------------------------------

QUOTA_N = 20  # docs kept per language
QUOTA_SALT = 32  # stage-1 partial top-N groups per language


@register(
    "quota_sample",
    oracle=f"""
    WITH r AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY sha256('qs#' || CAST(doc_id AS VARCHAR)), doc_id)
               AS smpl_rank
      FROM documents)
    SELECT lang, doc_id, CAST(smpl_rank AS BIGINT) AS smpl_rank
    FROM r WHERE smpl_rank <= {QUOTA_N}
    """,
)
def quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sampling (the language-rebalancing
    step of a multilingual training mix): rank docs within each language by
    sha256(doc_id) — a uniform, seed-stable permutation — and keep the
    first {QUOTA_N}.

    Scale shape — a naive per-lang window is one partition per language,
    and at web scale `en` is half the corpus: one task sorts 5×10^11 rows.
    Instead, stage 1 computes a partial top-N inside each of {QUOTA_SALT}
    salt groups per language (any global top-N row is necessarily in its
    salt group's top-N, so this is exact, not approximate); stage 2 ranks
    only the ≤ lang×salt×N survivors. The hot key never concentrates."""
    docs = tbl(spark, sf_dir, "documents")
    rk = F.sha2(F.concat(F.lit("qs#"), F.col("doc_id").cast("string")), 256)
    staged = (docs.select("lang", "doc_id", rk.alias("rk"),
                          F.pmod(F.col("doc_id"), F.lit(QUOTA_SALT))
                          .alias("salt"))
              .groupBy("lang", "salt")
              .agg(F.slice(F.array_sort(F.collect_list(
                  F.struct("rk", "doc_id"))), 1, QUOTA_N).alias("top"))
              .select("lang", F.explode("top").alias("t"))
              .select("lang", F.col("t.rk").alias("rk"),
                      F.col("t.doc_id").alias("doc_id")))
    w = Window.partitionBy("lang").orderBy("rk", "doc_id")
    return (staged.withColumn("smpl_rank",
                              F.row_number().over(w).cast("bigint"))
            .filter(F.col("smpl_rank") <= QUOTA_N)
            .select("lang", "doc_id", "smpl_rank"))


# --- duplicated-substring detection ----------------------------------------

SUBSTR_N = 8  # words per gram (the fixture docs are ~30 words; real
#              pipelines use 50-token grams — the shape is identical)


_SUBSTR_ORACLE_SQL = f"""
    WITH {_DUCK_AUG},
    sh AS (
      SELECT doc_id, {_duck_shingles(SUBSTR_N)} AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM aug) s),
    sig AS (SELECT doc_id, grams FROM sh WHERE len(grams) > 0),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sig),
    dupg AS (SELECT g FROM ex GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (
      SELECT ex.doc_id, COUNT(*) AS n_dup_grams
      FROM ex JOIN dupg USING (g) GROUP BY ex.doc_id)
    SELECT sig.doc_id,
           CAST(len(sig.grams) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(COALESCE(h.n_dup_grams, 0) AS DOUBLE)
             / CAST(len(sig.grams) AS DOUBLE) AS dup_frac
    FROM sig LEFT JOIN hits h ON h.doc_id = sig.doc_id
    """


@register("dedup_substring", oracle=_SUBSTR_ORACLE_SQL)
def dedup_substring(spark: SparkSession, sf_dir: str,
                    hash_fn: str = "text") -> DataFrame:
    """Duplicated-substring detection (ExactSubstr-style, Lee et al.
    "Deduplicating Training Data Makes Language Models Better"): for each
    doc, how many of its distinct {SUBSTR_N}-word grams also occur in at
    least one OTHER doc — the per-doc signal a substring-dedup pass cuts
    on. Runs over the planted-dup augmented corpus (dedup_q._aug_docs), so
    the perturbed copies light up with dup_frac ≈ 1.

    Scale shape — strictly linear, unlike the pair-emitting dedup ops:
    one groupBy(gram) marking grams with ≥2 distinct docs, one semi-join
    back, one groupBy(doc). No pair expansion exists anywhere, so no
    MAX_POSTING cap is needed — a boilerplate gram shared by 10^6 docs
    contributes 10^6 join rows (linear in its postings), not 10^12.

    ``hash_fn``: "text" (default) shuffles the raw {SUBSTR_N}-word gram
    strings — what the DuckDB oracle replays; "xx" pre-hashes each gram
    to a 128-bit double-xxhash64 key before the groupBy/join, so shuffle
    rows are fixed 32 chars instead of ~50-400 bytes of gram text (the
    dominant shuffle-volume term at 50-token production grams). The key
    is internal — both variants return identical rows — so the xx entry
    shares this oracle verbatim."""
    aug = _aug_docs(spark, sf_dir)
    sig = (aug.withColumn("w", F.split("text", " "))
           .filter(F.size("w") >= SUBSTR_N)
           .select("doc_id",
                   F.expr(_spark_shingles(SUBSTR_N)).alias("grams"))
           .persist())  # 2 downstream subtrees (ex, sizes)
    try:
        ex = sig.select("doc_id", F.explode("grams").alias("g"))
        if hash_fn == "xx":
            # lpad keeps each half fixed-width 16: unambiguous 128-bit key
            ex = ex.select("doc_id", F.concat(
                F.lpad(F.hex(F.xxhash64("g")), 16, "0"),
                F.lpad(F.hex(F.xxhash64(F.lit(1), "g")), 16, "0"))
                .alias("g"))
        dupg = (ex.groupBy("g")
                .agg(F.countDistinct("doc_id").alias("nd"))
                .filter(F.col("nd") >= 2).select("g"))
        hits = (ex.join(dupg, "g")
                .groupBy("doc_id").agg(F.count("*").alias("n_dup_grams")))
        out = (sig.select("doc_id",
                          F.size("grams").cast("bigint").alias("n_grams"))
               .join(hits, "doc_id", "left")
               .select(
                   "doc_id", "n_grams",
                   F.coalesce("n_dup_grams", F.lit(0)).cast("bigint")
                   .alias("n_dup_grams"),
                   (F.coalesce("n_dup_grams", F.lit(0)).cast("double")
                    / F.col("n_grams").cast("double")).alias("dup_frac")))
        # materialize before unpersisting the shared subtree
        return out.localCheckpoint(eager=True)
    finally:
        sig.unpersist()


@register("dedup_substring_xx", oracle=_SUBSTR_ORACLE_SQL)
def dedup_substring_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash substring dedup: dedup_substring with grams
    pre-hashed to 128-bit double-xxhash64 keys before the shuffle (fixed
    32-char shuffle rows vs raw gram text). The key never reaches the
    output, so this entry shares dedup_substring's DuckDB oracle
    verbatim — value-exact under the driver gate."""
    return dedup_substring(spark, sf_dir, hash_fn="xx")


# --- duplicated-substring EXCISION (ExactSubstr, the removal pass) ----------
# dedup_substring above computes the per-doc duplicated-gram SIGNAL; the
# production op of Lee et al. 2022 §4.1 REMOVES every duplicated >=N-token
# span from all but its first corpus-wide occurrence and reassembles the
# document. Occurrence counting is TOTAL (a span repeated within one doc is
# cut at its later position too — ExactSubstr's suffix-array semantics),
# unlike the signal op's >=2-distinct-docs rule.

_SUBSTR_CUT_ORACLE_SQL = f"""
    WITH {_DUCK_AUG},
    wt AS (SELECT doc_id, string_split(text, ' ') AS w,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS L
           FROM aug),
    occ AS (
      SELECT doc_id, u.pos AS pos, u.g AS g FROM (
        SELECT doc_id, unnest(list_transform(
                 range(0, CAST(L - {SUBSTR_N} + 1 AS INT)),
                 i -> struct_pack(
                   pos := i,
                   g := array_to_string(w[i + 1 : i + {SUBSTR_N}], ' '))))
               AS u
        FROM wt WHERE L >= {SUBSTR_N}) s),
    firsts AS (
      SELECT g, COUNT(*) AS cnt,
             MIN(lpad(CAST(doc_id AS VARCHAR), 19, '0')
                 || lpad(CAST(pos AS VARCHAR), 9, '0')) AS f_enc
      FROM occ GROUP BY g),
    cutocc AS (
      SELECT occ.doc_id, occ.pos
      FROM occ JOIN firsts USING (g)
      WHERE firsts.cnt >= 2
        AND lpad(CAST(occ.doc_id AS VARCHAR), 19, '0')
            || lpad(CAST(occ.pos AS VARCHAR), 9, '0') <> firsts.f_enc),
    cutpos AS (
      SELECT DISTINCT doc_id, wp FROM (
        SELECT doc_id, unnest(range(pos, pos + {SUBSTR_N})) AS wp
        FROM cutocc) e),
    percut AS (
      SELECT doc_id, list(wp) AS cuts,
             CAST(COUNT(*) AS BIGINT) AS n_cut
      FROM cutpos GROUP BY doc_id)
    SELECT wt.doc_id, wt.L AS n_words,
           CAST(COALESCE(p.n_cut, 0) AS BIGINT) AS n_cut,
           COALESCE(array_to_string(
             list_transform(
               list_filter(range(0, CAST(wt.L AS BIGINT)),
                           i -> p.cuts IS NULL
                                OR NOT list_contains(p.cuts, i)),
               i -> wt.w[CAST(i AS INT) + 1]),
             ' '), '') AS clean_text
    FROM wt LEFT JOIN percut p ON p.doc_id = wt.doc_id
    """


@register("dedup_substring_cut", oracle=_SUBSTR_CUT_ORACLE_SQL)
def dedup_substring_cut(spark: SparkSession, sf_dir: str,
                        hash_fn: str = "text",
                        materialize: bool = True) -> DataFrame:
    """ExactSubstr span EXCISION (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", §4.1 — the removal pass their
    production dedup runs, where dedup_substring above is only the
    signal): every {SUBSTR_N}-word gram occurring >=2 times in the corpus
    keeps its FIRST occurrence (min (doc_id, pos), the dedup_paragraph
    winner discipline); every other occurrence marks its covered word
    positions [pos, pos+{SUBSTR_N}) for removal — overlapping duplicated
    grams merge into maximal cut spans for free, because removal is
    per-position — and each document is reassembled from the surviving
    words in original order. Runs over the planted-dup corpus
    (dedup_q._aug_docs): each planted copy excises down to (at most) its
    first {SUBSTR_N}-1 words while the originals stay byte-identical.

    Scale shape — strictly linear, no pair expansion anywhere (test-gated
    in tests/test_plans.py): one groupBy(gram) with map-side-partial
    MIN(enc)+COUNT (hot boilerplate grams reduce to one partial per task
    before the exchange), one equi-join of occurrences back to that
    one-row-per-gram table (linear in postings — a gram in 10^6 docs
    costs 10^6 join rows, never 10^12 pairs), a bounded x{SUBSTR_N}
    map-side position expansion, one distinct + groupBy(doc_id) whose
    collect_set state is bounded by a single document's own length, and
    one doc_id equi-join for reassembly. The per-word cut test is a HOF
    filter over the doc's own words — zero extra shuffles.

    ``hash_fn="xx"`` pre-hashes grams to 128-bit double-xxhash64 keys
    before the shuffle (fixed 32-char rows vs raw gram text — the
    dominant shuffle-volume term at production 50-token grams; 64 bits
    alone would birthday-collide at 10^12 grams and a collision here
    CUTS innocent text). Keys are internal, so both variants share this
    oracle verbatim."""
    aug = _aug_docs(spark, sf_dir)
    wt = (aug.withColumn("w", F.split("text", " "))
          .withColumn("L", F.size("w").cast("bigint"))
          .persist())  # reused: occurrence subtree + reassembly subtree
    try:
        enc = F.concat(F.lpad(F.col("doc_id").cast("string"), 19, "0"),
                       F.lpad(F.col("pos").cast("string"), 9, "0"))
        grams = F.expr(
            f"transform(sequence(0, CAST(size(w) - {SUBSTR_N} AS INT)),"
            f" i -> struct(i AS pos,"
            f" concat_ws(' ', slice(w, i + 1, {SUBSTR_N})) AS g))")
        occ = (wt.filter(F.col("L") >= SUBSTR_N)
               .select("doc_id", F.explode(grams).alias("u"))
               .select("doc_id", F.col("u.pos").alias("pos"),
                       F.col("u.g").alias("g")))
        if hash_fn == "xx":
            occ = occ.withColumn("g", F.concat(
                F.lpad(F.hex(F.xxhash64("g")), 16, "0"),
                F.lpad(F.hex(F.xxhash64(F.lit(1), "g")), 16, "0")))
        occ = occ.withColumn("enc", enc)
        firsts = (occ.groupBy("g")
                  .agg(F.count("*").alias("cnt"),
                       F.min("enc").alias("f_enc")))
        cutocc = (occ.join(firsts, "g")
                  .filter((F.col("cnt") >= 2)
                          & (F.col("enc") != F.col("f_enc"))))
        cutpos = (cutocc.select(
            "doc_id",
            F.explode(F.expr(
                f"sequence(pos, pos + {SUBSTR_N} - 1)")).alias("wp"))
            .distinct())
        percut = (cutpos.groupBy("doc_id")
                  .agg(F.collect_set("wp").alias("cuts"),
                       F.count("*").cast("bigint").alias("n_cut")))
        out = (wt.join(percut, "doc_id", "left")
               .select(
                   "doc_id",
                   F.col("L").alias("n_words"),
                   F.coalesce("n_cut", F.lit(0)).cast("bigint")
                   .alias("n_cut"),
                   F.when(
                       F.col("cuts").isNull(),
                       F.concat_ws(" ", F.col("w")))
                   .otherwise(F.concat_ws(" ", F.filter(
                       "w",
                       lambda x, i: ~F.array_contains(F.col("cuts"), i))))
                   .alias("clean_text")))
        # materialize before unpersisting the shared subtree;
        # materialize=False exposes the raw plan (tests/test_plans.py)
        return out.localCheckpoint(eager=True) if materialize else out
    finally:
        wt.unpersist()


@register("dedup_substring_cut_xx", oracle=_SUBSTR_CUT_ORACLE_SQL)
def dedup_substring_cut_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash ExactSubstr excision: dedup_substring_cut with the
    128-bit double-xxhash64 gram keys (internal only), sharing the text
    variant's DuckDB oracle verbatim — value-exact under the driver
    gate."""
    return dedup_substring_cut(spark, sf_dir, hash_fn="xx")


# --- URL canonicalization ----------------------------------------------------
# The documents table has no url column, so one is synthesized per doc the
# same way text_q injects entities / pii_scrub injects PII: mixed-case
# scheme+host, default port, utm_* tracking params, and a fragment — all
# the things a crawl-frontier canonicalizer must strip. doc_id % 50 paths
# collide after stripping, so the dedup count is non-trivial.
#
# Replacement strings use NO backreferences: Java spells them $1, RE2
# spells them \\1 — capture-free passes sidestep the one regex-dialect
# difference between the engines.

_SPARK_URL_INJECT = (
    "concat('HTTPS://WWW.Example', CAST(doc_id % 7 AS STRING),"
    " '.COM:443/page/', CAST(doc_id % 50 AS STRING),"
    " '?utm_source=s', CAST(doc_id % 3 AS STRING),"
    " '&id=', CAST(doc_id % 10 AS STRING),"
    " '&utm_campaign=c', CAST(doc_id % 5 AS STRING), '#sec')")
_DUCK_URL_INJECT = (
    "'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.COM:443/page/' || CAST(doc_id % 50 AS VARCHAR)"
    " || '?utm_source=s' || CAST(doc_id % 3 AS VARCHAR)"
    " || '&id=' || CAST(doc_id % 10 AS VARCHAR)"
    " || '&utm_campaign=c' || CAST(doc_id % 5 AS VARCHAR) || '#sec'")

# canonicalization passes, applied in this exact order on both engines:
# 1. drop fragment  2-4. drop utm_* params (three capture-free shapes)
# 5. strip default https port — host casing is handled by lowering the
# scheme://host prefix extracted separately.
_URL_PASSES = [
    ("#.*$", ""),
    (r"\?utm_[a-z]+=[^&#]*&", "?"),
    ("&utm_[a-z]+=[^&#]*", ""),
    (r"\?utm_[a-z]+=[^&#]*$", ""),
    (":443/", "/"),
]


def _duck_url_canon(var: str) -> str:
    e = var
    for pat, rep in _URL_PASSES:
        e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    # lowercase the scheme://host prefix, keep the path case as-is
    return (f"lower(regexp_extract({e}, '^[^/]*//[^/:]*', 0))"
            f" || regexp_replace({e}, '^[^/]*//[^/:]*', '', 'g')")


@register(
    "url_canonicalize",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_DUCK_URL_INJECT} AS url FROM documents),
    c AS (SELECT doc_id, {_duck_url_canon('url')} AS canon_url FROM u)
    SELECT doc_id, canon_url,
           regexp_extract(canon_url, '//([^/:]+)', 1) AS host,
           CAST(COUNT(*) OVER (PARTITION BY canon_url) AS BIGINT)
             AS n_same_canon
    FROM c
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (crawl-frontier / URL-level dedup op): strip
    fragments and utm_* tracking params, drop the default https port,
    lowercase scheme+host (path case preserved, per RFC 3986 — only the
    authority is case-insensitive), then count docs sharing a canonical
    URL. Capture-free regex passes in a fixed order keep Java and RE2
    byte-identical.

    Scale: the passes are narrow codegen'd maps. The per-URL occurrence
    count is a groupBy(canon_url).count() joined back — NOT a count
    window: a window partition sends every row of a hot canonical URL
    (a crawl-loop pathology, millions of rows on one key) to one task
    with no combine, while the groupBy gets map-side partial counts so
    the hot key ships one partial per input partition, and the join back
    is an equi-join against a table with one row per distinct URL."""
    docs = tbl(spark, sf_dir, "documents")
    e: object = F.expr(_SPARK_URL_INJECT)
    for pat, rep in _URL_PASSES:
        e = F.regexp_replace(e, pat, rep)
    canon = F.concat(
        F.lower(F.regexp_extract(e, "^[^/]*//[^/:]*", 0)),
        F.regexp_replace(e, "^[^/]*//[^/:]*", ""))
    c = (docs.select("doc_id", canon.alias("canon_url"))
         .select("doc_id", "canon_url",
                 F.regexp_extract("canon_url", "//([^/:]+)", 1)
                 .alias("host")))
    counts = c.groupBy("canon_url").agg(
        F.count("*").cast("bigint").alias("n_same_canon"))
    return c.join(counts, "canon_url").select(
        "doc_id", "canon_url", "host", "n_same_canon")


# --- deterministic train/val/test split -------------------------------------

@register(
    "hash_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN h < 'c' THEN 'train'
                WHEN h < 'e' THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 substr(sha256('split#' || CAST(doc_id AS VARCHAR)), 1, 1)
                   AS h
          FROM documents) t
    """,
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-independent hash:
    the first hex digit of sha256('split#' || doc_id) buckets 12/16 →
    train, 2/16 → val, 2/16 → test. Seed-stable (the 'split#' salt is
    the seed), engine-exact, and — because the hash ignores content — a
    doc's split never changes when its text is re-extracted, which is the
    property a training pipeline needs to avoid train/test leakage across
    corpus versions.

    Scale: pure narrow map, no shuffle."""
    docs = tbl(spark, sf_dir, "documents")
    h = F.substring(
        F.sha2(F.concat(F.lit("split#"), F.col("doc_id").cast("string")),
               256), 1, 1)
    return docs.select(
        "doc_id",
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
        .alias("split"))


# --- per-language n-gram frequency table -------------------------------------

NGRAM_TOP_K = 20
NGRAM_SALT = 32


@register(
    "top_ngrams",
    oracle=f"""
    WITH w AS (
      SELECT lang, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT lang, w[i] || ' ' || w[i + 1] AS bigram
      FROM (SELECT lang, w, unnest(range(1, len(w))) AS i FROM w) t),
    cnt AS (
      SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM bg GROUP BY lang, bigram),
    r AS (
      SELECT lang, bigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram) AS rnk
      FROM cnt)
    SELECT lang, bigram, n, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {NGRAM_TOP_K}
    """,
)
def top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language bigram frequency table, top {NGRAM_TOP_K} — the
    n-gram-LM / boilerplate-phrase-list builder (perplexity filters and
    Gopher-style repetition lists start from exactly this table).

    Scale shape — two stages, both skew-aware: (1) the bigram count is a
    groupBy(lang, bigram) with map-side partial aggregation, so a
    boilerplate bigram appearing 10^9 times arrives at its reducer as
    one partial row per map task, not 10^9 rows; (2) the per-language
    top-K uses the same salt-group partial top-N as quota_sample (any
    global top-K row is in its salt group's top-K — exact), so the hot
    language never concentrates into one window task. Ties break
    lexicographically for engine-independent set membership at the cut."""
    docs = tbl(spark, sf_dir, "documents")
    w = docs.select("lang", F.split("text", " ").alias("w"))
    bg = explode_ne(w, ["lang"], F.expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        " ELSE array() END"), "bigram")  # see explode_ne
    cnt = (bg.groupBy("lang", "bigram")
           .agg(F.count("*").cast("bigint").alias("n")))
    # stage 1: partial top-K inside salt groups (exactness: a global top-K
    # row is in its group's top-K for any grouping). Sort key = (-n, bigram)
    # — struct sort is lexicographic on fields; negate n so array_sort's
    # ascending order yields descending counts.
    staged = (cnt.withColumn("salt",
                             F.pmod(F.xxhash64("bigram"), F.lit(NGRAM_SALT)))
              .groupBy("lang", "salt")
              .agg(F.slice(F.array_sort(F.collect_list(
                  F.struct((-F.col("n")).alias("neg_n"), "bigram", "n"))),
                  1, NGRAM_TOP_K).alias("top"))
              .select("lang", F.explode("top").alias("t"))
              .select("lang", F.col("t.bigram").alias("bigram"),
                      F.col("t.n").alias("n")))
    wnd = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (staged.withColumn("rnk", F.row_number().over(wnd).cast("bigint"))
            .filter(F.col("rnk") <= NGRAM_TOP_K)
            .select("lang", "bigram", "n", "rnk"))


# --- train/test contamination check ------------------------------------------

CONTAM_N = 8  # words per gram (matches dedup_substring)


@register(
    "split_contamination",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text,
             CASE WHEN substr(sha256('split#' || CAST(doc_id AS VARCHAR)),
                              1, 1) < 'c' THEN 'train'
                  WHEN substr(sha256('split#' || CAST(doc_id AS VARCHAR)),
                              1, 1) < 'e' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    sh AS (
      SELECT doc_id, split, {_duck_shingles(CONTAM_N)} AS grams
      FROM (SELECT doc_id, split, string_split(text, ' ') AS w FROM s) t),
    sig AS (SELECT doc_id, split, grams FROM sh WHERE len(grams) > 0),
    test_ex AS (
      SELECT doc_id, unnest(grams) AS g FROM sig WHERE split = 'test'),
    train_g AS (
      SELECT DISTINCT unnest(grams) AS g FROM sig WHERE split = 'train'),
    hits AS (
      SELECT te.doc_id, COUNT(*) AS n_contam
      FROM test_ex te JOIN train_g tr USING (g) GROUP BY te.doc_id)
    SELECT sig.doc_id,
           CAST(len(sig.grams) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_contam, 0) AS BIGINT) AS n_contam,
           CAST(COALESCE(h.n_contam, 0) AS DOUBLE)
             / CAST(len(sig.grams) AS DOUBLE) AS contam_frac
    FROM sig LEFT JOIN hits h ON h.doc_id = sig.doc_id
    WHERE sig.split = 'test'
    """,
)
def split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check (the benchmark-decontamination op,
    e.g. GPT-3 appendix C / PaLM-style 8-gram overlap): for each TEST doc
    under hash_split's assignment, the fraction of its distinct
    {CONTAM_N}-grams that also occur anywhere in the TRAIN split. A
    training pipeline cuts or flags test docs above a threshold before
    publishing eval numbers.

    Scale shape — same strictly linear inverted-index shape as
    dedup_substring: distinct train grams via groupBy (map-side partial),
    one semi-join of test grams against them, one groupBy(doc). The train
    side is grams-distinct BEFORE the join, so a boilerplate gram in 10^6
    train docs is ONE join row. No pair expansion anywhere."""
    docs = tbl(spark, sf_dir, "documents")
    h = F.substring(
        F.sha2(F.concat(F.lit("split#"), F.col("doc_id").cast("string")),
               256), 1, 1)
    s = docs.select(
        "doc_id", "text",
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
        .alias("split"))
    sig = (s.withColumn("w", F.split("text", " "))
           .filter(F.size("w") >= CONTAM_N)
           .select("doc_id", "split",
                   F.expr(_spark_shingles(CONTAM_N)).alias("grams"))
           .persist())  # test explode + train explode + final left join
    try:
        test_ex = (sig.filter(F.col("split") == "test")
                   .select("doc_id", F.explode("grams").alias("g")))
        train_g = (sig.filter(F.col("split") == "train")
                   .select(F.explode("grams").alias("g")).distinct())
        hits = (test_ex.join(train_g, "g")
                .groupBy("doc_id").agg(F.count("*").alias("n_contam")))
        out = (sig.filter(F.col("split") == "test")
               .select("doc_id",
                       F.size("grams").cast("bigint").alias("n_grams"))
               .join(hits, "doc_id", "left")
               .select(
                   "doc_id", "n_grams",
                   F.coalesce("n_contam", F.lit(0)).cast("bigint")
                   .alias("n_contam"),
                   (F.coalesce("n_contam", F.lit(0)).cast("double")
                    / F.col("n_grams").cast("double")).alias("contam_frac")))
        return out.localCheckpoint(eager=True)
    finally:
        sig.unpersist()


# --- composite keep/reject gate ----------------------------------------------

from . import REGISTRY as _REGISTRY  # noqa: E402
from . import text_q as _text_q  # noqa: E402,F401  (registers doc_quality/doc_repetition)

_Q_ORACLE = _REGISTRY["doc_quality"].oracle
_R_ORACLE = _REGISTRY["doc_repetition"].oracle


@register(
    "quality_gate",
    oracle=f"""
    WITH q AS ({_Q_ORACLE}),
    r AS ({_R_ORACLE})
    SELECT q.doc_id, q.quality, r.repetitive, r.n_words,
           (q.quality >= CAST(0.8 AS DOUBLE) AND NOT r.repetitive
            AND r.n_words BETWEEN 5 AND 100000) AS keep,
           CASE WHEN q.quality < CAST(0.8 AS DOUBLE) THEN 'low_quality'
                WHEN r.repetitive THEN 'repetitive'
                WHEN r.n_words < 5 OR r.n_words > 100000 THEN 'length'
                ELSE NULL END AS reject_reason
    FROM q JOIN r ON q.doc_id = r.doc_id
    """,
)
def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final keep/reject decision a corpus pipeline publishes — the
    C4/Gopher-style composite filter fusing the banded quality score
    (doc_quality), the repetition reject flags (doc_repetition), and a
    length band, with a first-failing-rule reject_reason (rule order
    fixed, so reasons are engine-exact). Composes the registered signal
    queries rather than reimplementing them — exactly how the signals
    would be reused from published signal tables in production.

    Scale: both inputs aggregate on doc_id, so the final equi-join is
    co-partitioned on the same key Catalyst already hashed — one logical
    shuffle pipeline end to end. (Docs with <2 words are absent from the
    repetition table and drop out of the inner join: they are rejected
    upstream by the extraction length filter.)"""
    q = _REGISTRY["doc_quality"].fn(spark, sf_dir) \
        .select("doc_id", "quality")
    r = _REGISTRY["doc_repetition"].fn(spark, sf_dir) \
        .select("doc_id", "n_words", "repetitive")
    keep = F.expr("quality >= CAST(0.8 AS DOUBLE) AND NOT repetitive"
                  " AND n_words BETWEEN 5 AND 100000")
    reason = F.expr(
        "CASE WHEN quality < CAST(0.8 AS DOUBLE) THEN 'low_quality'"
        " WHEN repetitive THEN 'repetitive'"
        " WHEN n_words < 5 OR n_words > 100000 THEN 'length'"
        " ELSE NULL END")
    return (q.join(r, "doc_id")
            .select("doc_id", "quality", "repetitive", "n_words",
                    keep.alias("keep"), reason.alias("reject_reason")))


# --- unigram LM surprisal (CCNet-style quality signal) -----------------------
# CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
# Datasets from Web Crawl Data") ranks web documents by language-model
# perplexity. The relational twin: fit a unigram LM on the corpus itself
# (one word-count aggregation), keep the top-VOCAB_K vocabulary, and score
# every document by mean per-token surprisal. Transcendental log() is NOT
# engine-portable (libm differs between the JVM and DuckDB), so surprisal
# is measured in INTEGER bits: ilog2(n) = length(bin(n)) - 1, giving
# bits(w) = ilog2(total) - ilog2(count(w)) — a floor-of-log2 approximation
# of -log2 p(w) that is exact integer arithmetic on both engines. OOV
# tokens get the worst-case ilog2(total) + 1 = length(bin(total)) bits.

LM_VOCAB_K = 24  # < corpus vocab at every SF, so the OOV path is exercised


@register(
    "lm_surprisal",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
    c AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
    v AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT {LM_VOCAB_K}),
    b AS (SELECT tk.doc_id,
                 CASE WHEN v.tok IS NULL THEN length(bin(t.total))
                      ELSE length(bin(t.total))
                           - length(bin(CAST(v.cnt AS BIGINT))) END AS bits,
                 CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM tk CROSS JOIN t LEFT JOIN v ON v.tok = tk.tok)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(bits) AS BIGINT) AS total_bits,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(bits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_bits
    FROM b GROUP BY doc_id
    """,
)
def lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-token unigram surprisal in integer bits — the CCNet
    perplexity quality signal, engine-exact (module comment above; no
    libm log anywhere). Low mean_bits = repetitive high-frequency prose,
    high mean_bits = rare-token (or OOV-heavy, n_oov) text; a corpus
    pipeline keeps the middle band.

    Scale shape: (1) word-count groupBy with map-side partial agg —
    vocab-sized output; (2) top-K vocabulary via sort-limit, which Spark
    plans as TakeOrderedAndProject (per-partition partial top-K, no
    global sort); (3) the LM itself is vocab-bounded so the score join
    BROADCASTs it — the corpus-side explode never shuffles for the join;
    (4) one final groupBy(doc_id) whose input Spark partial-aggregates
    map-side. At 10^12 docs the fit would run on a fixed sample (the LM
    is a model, not an exact statistic) — here it is exact so the oracle
    can replay it."""
    docs = tbl(spark, sf_dir, "documents")
    tk = explode_ne(docs, ["doc_id"], F.split("text", " "), "tok")
    c = tk.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = c.agg(F.sum("cnt").cast("bigint").alias("total"))
    vocab = c.orderBy(F.desc("cnt"), F.asc("tok")).limit(LM_VOCAB_K)
    bits = F.expr(
        "CASE WHEN cnt IS NULL THEN length(bin(total))"
        " ELSE length(bin(total)) - length(bin(CAST(cnt AS BIGINT))) END")
    b = (tk.crossJoin(F.broadcast(total))
         .join(F.broadcast(vocab), "tok", "left")
         .select("doc_id", bits.alias("bits"),
                 F.expr("CASE WHEN cnt IS NULL THEN 1 ELSE 0 END")
                 .alias("oov")))
    return b.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tok"),
        F.sum("bits").cast("bigint").alias("total_bits"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        (F.sum("bits").cast("double") / F.count("*").cast("double"))
        .alias("mean_bits"))


# --- domain-level reputation gate -------------------------------------------
# C4/RefinedWeb curate at the DOMAIN level as well as the document level:
# a host whose pages are short or heavily self-duplicated is down-weighted
# wholesale. Domains come from the same synthesized URL column as
# url_canonicalize (the documents table has no url); doc_id % 7 hosts give
# each domain a distinct doc population, so per-domain means genuinely
# differ and the gate splits them non-trivially.


@register(
    "domain_gate",
    oracle=f"""
    WITH u AS (SELECT doc_id, text,
                      lower('www.example' || CAST(doc_id % 7 AS VARCHAR)
                            || '.com') AS domain
               FROM documents),
    s AS (SELECT domain,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT)
                   AS sum_len,
                 CAST(COUNT(DISTINCT sha256(text)) AS BIGINT)
                   AS n_distinct
          FROM u GROUP BY domain),
    g AS (SELECT CAST(SUM(sum_len) AS DOUBLE)
                   / CAST(SUM(n_docs) AS DOUBLE) AS global_mean
          FROM s),
    d AS (SELECT s.domain, s.n_docs,
                 CAST(s.sum_len AS DOUBLE) / CAST(s.n_docs AS DOUBLE)
                   AS mean_len,
                 CAST(s.n_docs - s.n_distinct AS DOUBLE)
                   / CAST(s.n_docs AS DOUBLE) AS dup_frac,
                 g.global_mean
          FROM s CROSS JOIN g)
    SELECT u.doc_id, u.domain, d.n_docs, d.mean_len, d.dup_frac,
           (d.mean_len >= d.global_mean
            AND d.dup_frac <= CAST(0.5 AS DOUBLE)) AS keep
    FROM u JOIN d ON d.domain = u.domain
    """,
)
def domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-reputation gating: aggregate per-domain doc count, exact
    mean text length, and exact-duplicate fraction (1 − distinct
    sha256 / n), then keep a doc iff its domain's mean length clears the
    corpus-wide mean AND its self-duplication is ≤ 0.5. The C4-style
    wholesale domain filter, with the reputation table as a first-class
    intermediate.

    Scale: one groupBy(domain) over the corpus (map-side combine; the
    distinct-sha count rewrites to a two-level agg), a 1-row global
    reduce, and the verdicts re-join docs BY BROADCAST — the domain
    table is bounded by the web's host count (~10^8, a few GB of
    (domain, bool): broadcastable; beyond that the join key is already
    the agg key, so it co-partitions). Skewed domains (one host = 10%
    of the crawl) are safe: aggregation states are constant-size, no
    pair expansion exists."""
    docs = tbl(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id", "text",
        F.lower(F.concat(F.lit("www.example"),
                         (F.col("doc_id") % 7).cast("string"),
                         F.lit(".com"))).alias("domain"))
    s = u.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text").cast("bigint")).cast("bigint")
        .alias("sum_len"),
        F.countDistinct(F.sha2("text", 256)).cast("bigint")
        .alias("n_distinct"))
    g = s.agg((F.sum("sum_len").cast("double")
               / F.sum("n_docs").cast("double")).alias("global_mean"))
    d = (s.crossJoin(F.broadcast(g))
         .select("domain", "n_docs",
                 (F.col("sum_len").cast("double")
                  / F.col("n_docs").cast("double")).alias("mean_len"),
                 ((F.col("n_docs") - F.col("n_distinct")).cast("double")
                  / F.col("n_docs").cast("double")).alias("dup_frac"),
                 "global_mean"))
    keep = F.expr("mean_len >= global_mean"
                  " AND dup_frac <= CAST(0.5 AS DOUBLE)")
    return (u.select("doc_id", "domain")
            .join(F.broadcast(d), "domain")
            .select("doc_id", "domain", "n_docs", "mean_len", "dup_frac",
                    keep.alias("keep")))


# --- bloom-prefiltered decontamination (scale path of split_contamination) --

# Bit-space size M: fpp only — NEVER correctness (the prefilter admits no
# false negative; false positives die in the exact verify join below).
# fpp ~= 1 - exp(-n_distinct_train_grams / M) for the one-hash filter.
BLOOM_M = 1 << 22


@register(
    "decontam_bloom",
    # identical output to split_contamination by construction -> shares its
    # oracle string verbatim (the bloom admits no false negative; its false
    # positives are removed by the same exact semi-join)
    oracle=REGISTRY["split_contamination"].oracle,
)
def decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_contamination with a Bloom prefilter on the train-gram side:
    train grams hash into a {BLOOM_M}-slot bit space (one-hash Bloom
    filter — k=1 keeps the membership test a single broadcast hash-join
    probe; Spark 4.1 does not expose bloom_filter_agg/might_contain in
    the public registry, and a k-hash filter would need k probes for the
    same asymptotics), the OCCUPIED slots are distinct-ed into a bitmap
    table that is <= {BLOOM_M} rows NO MATTER how large the train split
    is — the fixed-size-sketch property that makes this a Bloom filter
    rather than a gram set — and test grams are prefiltered by a
    broadcast semi-join against that bitmap BEFORE any shuffle; only the
    surviving candidates pay the exact semi-join that computes the
    final counts.

    Why this is the 100-TB shape: in a decontamination pass the
    overwhelming majority of test grams are clean, so the exact-join
    variant shuffles ~all test grams against the train-gram table. The
    bloom costs one broadcast of a bounded slot table (~{BLOOM_M} x 8 B
    worst case, independent of corpus size) and cuts the shuffled volume
    to (true hits + fpp x clean) rows, while the exact verify keeps the
    result bit-identical to the exact operator (same DuckDB oracle)."""
    out, caches = _decontam_bloom_build(spark, sf_dir)
    res = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return res


def _decontam_bloom_build(spark: SparkSession, sf_dir: str):
    """Plan builder (pre-checkpoint, so tests can assert its physical
    shape); returns (out, persisted_frames)."""
    docs = tbl(spark, sf_dir, "documents")
    h = F.substring(
        F.sha2(F.concat(F.lit("split#"), F.col("doc_id").cast("string")),
               256), 1, 1)
    s = docs.select(
        "doc_id", "text",
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
        .alias("split"))
    sig = (s.withColumn("w", F.split("text", " "))
           .filter(F.size("w") >= CONTAM_N)
           .select("doc_id", "split",
                   F.expr(_spark_shingles(CONTAM_N)).alias("grams"))
           .persist())  # train distinct + bloom build + test explode + join
    # persisted: BOTH the bloom build and the exact verify consume the
    # distinct train-gram table — without the cache its explode+distinct
    # exchange (the op's dominant shuffle) runs twice
    train_g = (sig.filter(F.col("split") == "train")
               .select(F.explode("grams").alias("g")).distinct().persist())
    slot = F.pmod(F.xxhash64("g"), F.lit(BLOOM_M))
    # occupied bloom slots: bounded at BLOOM_M rows by construction
    # (slot values live in [0, M)), distinct-ed map-side first
    bloom = train_g.select(slot.alias("slot")).distinct()
    test_ex = (sig.filter(F.col("split") == "test")
               .select("doc_id", F.explode("grams").alias("g")))
    test_cand = (test_ex.withColumn("slot", slot)
                 .join(F.broadcast(bloom), "slot", "left_semi")
                 .select("doc_id", "g"))
    hits = (test_cand.join(train_g, "g")
            .groupBy("doc_id").agg(F.count("*").alias("n_contam")))
    out = (sig.filter(F.col("split") == "test")
           .select("doc_id",
                   F.size("grams").cast("bigint").alias("n_grams"))
           .join(hits, "doc_id", "left")
           .select(
               "doc_id", "n_grams",
               F.coalesce("n_contam", F.lit(0)).cast("bigint")
               .alias("n_contam"),
               (F.coalesce("n_contam", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double")).alias("contam_frac")))
    return out, [sig, train_g]


# --- importance sampling (DSIR-style data selection) ------------------------

DSIR_B = 4096  # hashed-feature buckets (3 sha256 hex nibbles, exactly 16^3)

# bucket id from the first 3 nibbles of sha256(word) — engine-identical
# (the dedup_simhash_sql nibble-parse idiom; Spark's conv() has no DuckDB
# twin). {h} = the sha256 hex column/expr, {f} = instr/strpos per dialect.
_HEXD = "0123456789abcdef"


def _bucket3(sha: str) -> str:
    return (f"(instr('{_HEXD}', substring({sha}, 1, 1)) - 1) * 256"
            f" + (instr('{_HEXD}', substring({sha}, 2, 1)) - 1) * 16"
            f" + (instr('{_HEXD}', substring({sha}, 3, 1)) - 1)")


def _duck_bucket3(sha: str) -> str:
    return (f"(instr('{_HEXD}', substr({sha}, 1, 1)) - 1) * 256"
            f" + (instr('{_HEXD}', substr({sha}, 2, 1)) - 1) * 16"
            f" + (instr('{_HEXD}', substr({sha}, 3, 1)) - 1)")


@register(
    "importance_sample",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents),
    bk AS (SELECT doc_id, {_duck_bucket3('sha256(w)')} AS b FROM tk),
    tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t FROM bk
            WHERE doc_id % 7 = 0 GROUP BY b),
    rawc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r FROM bk GROUP BY b),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt FROM tgt),
    rot AS (SELECT CAST(SUM(r) AS BIGINT) AS rr FROM rawc),
    sc AS (SELECT bk.doc_id,
                  CAST(length(bin(COALESCE(tgt.t, 0) + 1))
                       - length(bin(rawc.r + 1))
                       + length(bin(rot.rr)) - length(bin(tot.tt))
                       AS BIGINT) AS bits
           FROM bk
           JOIN rawc USING (b)
           LEFT JOIN tgt USING (b)
           CROSS JOIN tot CROSS JOIN rot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(bits) AS BIGINT) AS llr_bits,
           (SUM(bits) > 0) AS selected
    FROM sc GROUP BY doc_id
    """,
)
def importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance sampling (Xie et al. 2023, public method):
    score every raw document by the log-likelihood ratio of a hashed
    bag-of-words model fit on a TARGET domain sample (here the
    deterministic doc_id % 7 = 0 subset standing in for the curated
    corpus) vs the raw pool, and select documents that look more
    target-like than raw-like. Words hash into {DSIR_B} buckets; the
    log2s are integer bit lengths (`length(bin(x))` — the lm_surprisal
    idiom), so no libm log crosses the engine boundary:
    llr_bits = sum_w [bits(t_b+1) - bits(r_b+1)] + n_tok*(bits(R)-bits(T))
    — the normalization constants folded in exactly.

    Scale shape: TWO corpus passes total, statically guaranteed. Raw and
    target bucket counts come from ONE groupBy(b) with a conditional
    count (at most {DSIR_B} groups, map-side partials collapse any
    corpus to {DSIR_B} rows per task), and the grand totals are folded
    into that same bounded frame by an unpartitioned window — safe here
    and ONLY here because the window input is <= {DSIR_B} rows by
    construction, independent of corpus size (the earlier four-branch
    form re-ran the tokenize+sha2 scan per stats branch: 5 corpus
    scans). The enriched stats re-join the token stream by ONE
    BROADCAST hash join, and the only corpus-sized shuffle is the final
    groupBy(doc_id) with map-side partial SUM. No pair expansion, no
    corpus-sized window, no driver collect."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    tk = explode_ne(docs, ["doc_id"], F.split("text", " "), "w")
    bk = tk.select("doc_id",
                   F.expr(_bucket3("sha2(w, 256)")).alias("b"))
    stats = bk.groupBy("b").agg(
        F.count("*").cast("bigint").alias("r"),
        F.count_if(F.col("doc_id") % 7 == 0).cast("bigint").alias("t"))
    wall = Window.partitionBy()  # <= DSIR_B rows: bounded by construction
    stats = stats.select(
        "b", "r", "t",
        F.sum("r").over(wall).cast("bigint").alias("rr"),
        F.sum("t").over(wall).cast("bigint").alias("tt"))
    bits = F.expr(
        "CAST(length(bin(t + 1)) - length(bin(r + 1))"
        " + length(bin(rr)) - length(bin(tt)) AS BIGINT)")
    sc = (bk.join(F.broadcast(stats), "b")
          .select("doc_id", bits.alias("bits")))
    return (sc.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_tok"),
                 F.sum("bits").cast("bigint").alias("llr_bits"),
                 (F.sum("bits") > 0).alias("selected")))


# --- intra-document line dedup (RefinedWeb line-wise filtering) --------------
# RefinedWeb (Penedo et al. 2023) removes DUPLICATED LINES WITHIN a
# document (nav menus, sidebars, share buttons repeated by the template
# engine) before any corpus-level pass — dedup_paragraph's corpus-wide
# discipline cannot express this (it keeps the FIRST carrier corpus-wide;
# here every doc keeps its own first copy). Fixture prose has no line
# structure, so repetition is injected deterministically (the _INJECT /
# dedup_paragraph banner discipline): a 6-word sidebar line (5 variants
# keyed by doc_id % 5) is prepended 1 + doc_id % 3 times, then the word
# stream chunks into fixed LINE_W-word "lines" — docs with doc_id % 3 > 0
# carry genuine intra-doc duplicates, the rest are control rows.

LINE_W = 6  # words per line (== sidebar length, so each copy is one line)

_SPARK_LINE_RAW = (
    "concat(repeat(concat('sidebar home about contact privacy v',"
    " CAST(doc_id % 5 AS STRING), ' '), CAST(1 + doc_id % 3 AS INT)), text)")
_DUCK_LINE_RAW = (
    "repeat('sidebar home about contact privacy v'"
    " || CAST(doc_id % 5 AS VARCHAR) || ' ',"
    " CAST(1 + doc_id % 3 AS INT)) || text")


@register(
    "line_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split({_DUCK_LINE_RAW}, ' ') AS w
               FROM documents),
    l AS (SELECT doc_id,
                 list_transform(
                   range(0, CAST(ceil(len(w) / {LINE_W}.0) AS INT)),
                   i -> array_to_string(
                     w[i * {LINE_W} + 1 : i * {LINE_W} + {LINE_W}], ' '))
                   AS lines
          FROM w),
    k AS (SELECT doc_id, lines,
                 list_filter(lines,
                             (x, i) -> list_position(lines, x) = i) AS kept
          FROM l)
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           array_to_string(kept, ' ') AS clean_text
    FROM k
    """,
)
def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicate-line removal (RefinedWeb line-wise
    filtering): chunk each doc into fixed {LINE_W}-word lines, keep only
    the FIRST occurrence of each distinct line WITHIN the doc, reassemble
    in original order. Complements dedup_paragraph (corpus-wide first
    occurrence) and doc_repetition (signals only, no removal).

    Scale: a pure narrow projection — split / transform / filter-with-
    index / array_join are all per-row higher-order functions inside
    whole-stage codegen; ZERO shuffles, zero joins, no window, perfectly
    data-parallel at any corpus size (plan-asserted like pii_scrub).
    The first-occurrence test is array_position(lines, x) == i + 1 —
    O(lines²) per doc in the worst case, bounded by document length,
    never by corpus size."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    w = docs.select(
        "doc_id", F.split(F.expr(_SPARK_LINE_RAW), " ").alias("w"))
    lines = F.expr(
        f"transform(sequence(0,"
        f" CAST(ceil(size(w) / {LINE_W}.0) AS INT) - 1),"
        f" i -> concat_ws(' ', slice(w, i * {LINE_W} + 1, {LINE_W})))")
    out = w.select("doc_id", lines.alias("lines")).select(
        "doc_id",
        F.size("lines").cast("bigint").alias("n_lines"),
        F.expr("filter(lines,"
               " (x, i) -> array_position(lines, x) = i + 1)").alias("kept"))
    return out.select(
        "doc_id", "n_lines",
        F.size("kept").cast("bigint").alias("n_kept"),
        F.array_join("kept", " ").alias("clean_text"))


# --- CCNet perplexity bucketing (head / middle / tail) -----------------------
# CCNet (Wenzek et al. 2020) splits each language's corpus into three
# equal-mass perplexity buckets — head (most fluent), middle, tail — by
# computing cutoffs ON A SAMPLE and then assigning every document with a
# narrow comparison. lm_surprisal supplies the per-doc score (mean
# unigram surprisal in integer bits, already oracle-exact); this op adds
# the bucketing itself.

CCNET_SAMPLE = 240  # cutoff-fit sample size (fixed => bounded at any SF)


@register(
    "ccnet_bucket",
    oracle=f"""
    WITH surp AS ({{SURP}}),
    samp AS (SELECT doc_id, mean_bits FROM surp
             ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id
             LIMIT {CCNET_SAMPLE}),
    r AS (SELECT mean_bits,
                 ROW_NUMBER() OVER (ORDER BY mean_bits, doc_id) AS rn,
                 COUNT(*) OVER () AS cnt
          FROM samp),
    c AS (SELECT MAX(CASE WHEN rn * 3 <= cnt THEN mean_bits END) AS c1,
                 MAX(CASE WHEN rn * 3 <= 2 * cnt THEN mean_bits END) AS c2
          FROM r)
    SELECT s.doc_id, s.mean_bits,
           CASE WHEN s.mean_bits <= c.c1 THEN 'head'
                WHEN s.mean_bits <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM surp s CROSS JOIN c
    """.replace("{SURP}", REGISTRY["lm_surprisal"].oracle.strip()),
)
def ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing: tertile cutoffs are
    fit on a deterministic {CCNET_SAMPLE}-doc sample (ordered by
    sha256(doc_id) — a content-independent pseudo-random draw both
    engines replay exactly), then every document is assigned by
    comparing its mean_bits against the two cutoff VALUES. Composes the
    registered lm_surprisal signal, as quality_gate composes its gates.

    Scale: the sample is a sort-limit — Spark plans TakeOrderedAndProject
    (per-partition partial top-K, no global sort) — so the ONLY
    unpartitioned window runs over <= {CCNET_SAMPLE} rows by construction
    (the importance_sample bounded-frame idiom). The two cutoff scalars
    reduce to ONE row, broadcast onto the corpus-sized frame; bucket
    assignment itself is a narrow CASE. This is exactly how CCNet scales:
    the cutoff fit is O(sample), assignment is embarrassingly parallel.
    Tie-safety: rn * 3 <= cnt is pure integer arithmetic, and bucket
    predicates compare against cutoff VALUES, so equal-scoring docs land
    in the same bucket on both engines regardless of order."""
    surp = REGISTRY["lm_surprisal"].fn(spark, sf_dir)
    samp = (surp.select("doc_id", "mean_bits")
            .orderBy(F.sha2(F.col("doc_id").cast("string"), 256), "doc_id")
            .limit(CCNET_SAMPLE))
    wall = Window.partitionBy()  # <= CCNET_SAMPLE rows by construction
    r = samp.select(
        "mean_bits",
        F.row_number().over(wall.orderBy("mean_bits", "doc_id")).alias("rn"),
        F.count("*").over(wall).alias("cnt"))
    c = r.agg(
        F.max(F.when(F.col("rn") * 3 <= F.col("cnt"),
                     F.col("mean_bits"))).alias("c1"),
        F.max(F.when(F.col("rn") * 3 <= 2 * F.col("cnt"),
                     F.col("mean_bits"))).alias("c2"))
    return (surp.crossJoin(F.broadcast(c))
            .select("doc_id", "mean_bits",
                    F.when(F.col("mean_bits") <= F.col("c1"), "head")
                    .when(F.col("mean_bits") <= F.col("c2"), "middle")
                    .otherwise("tail").alias("bucket")))


# --- source-mixture weighting (temperature sampling across sources) ----------
# Multi-source training corpora are not sampled at natural proportions:
# GPT-3 / PaLM / LLaMA all re-weight sources by a temperature
# p_i ∝ (n_i / N)^alpha with alpha < 1, up-sampling small curated
# sources and down-sampling the bulk crawl. The documents table's
# `source` column is exactly that grouping.

MIX_ALPHA = 0.5  # alpha = 1/2 => sqrt — bit-identical in both engines
                 # (pow with non-integer exponents is libm territory;
                 # sqrt is an IEEE 754 correctly-rounded primitive)


@register(
    "source_mix",
    oracle="""
    WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    t AS (SELECT source, n_docs,
                 CAST(SUM(n_docs) OVER () AS BIGINT) AS total,
                 sqrt(CAST(n_docs AS DOUBLE)
                      / CAST(SUM(n_docs) OVER () AS DOUBLE)) AS w_raw
          FROM s),
    z AS (SELECT source, n_docs, total, w_raw,
                 SUM(w_raw) OVER (ORDER BY source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS z
          FROM t)
    SELECT source, n_docs,
           w_raw / z AS mix_weight,
           (w_raw / z) / (CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE))
             AS repeat_factor
    FROM z
    """,
)
def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixture: per-source sampling weight
    p_i = (n_i/N)^{MIX_ALPHA} / Z and the resulting repeat factor
    p_i / (n_i/N) — >1 means the source is up-sampled (seen more than
    once per epoch of the mixture), <1 down-sampled. alpha is fixed at
    1/2 so the power is sqrt, an IEEE-correctly-rounded primitive both
    engines compute bit-identically; the normalizer Z sums the per-source
    weights in explicit source order (an ORDERED window over the bounded
    per-source frame), so the float addition sequence — and hence the
    last ulp — is engine-independent.

    Scale: ONE groupBy(source) with map-side partial counts collapses
    any corpus to n_sources rows per task; every window after that runs
    on the n_sources-row frame (bounded by construction, the
    importance_sample idiom). Per-doc materialization of the mixture is
    a broadcast join away and deliberately not done here — the weights
    table IS the product (it feeds the training sampler's config)."""
    docs = tbl(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"))
    wall = Window.partitionBy()  # <= n_sources rows by construction
    t = s.select(
        "source", "n_docs",
        F.sum("n_docs").over(wall).cast("bigint").alias("total"))
    t = t.withColumn(
        "w_raw",
        F.sqrt(F.col("n_docs").cast("double")
               / F.col("total").cast("double")))
    z = t.withColumn(
        "z", F.sum("w_raw").over(
            wall.orderBy("source")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)))
    return z.select(
        "source", "n_docs",
        (F.col("w_raw") / F.col("z")).alias("mix_weight"),
        ((F.col("w_raw") / F.col("z"))
         / (F.col("n_docs").cast("double")
            / F.col("total").cast("double"))).alias("repeat_factor"))


# --- link graph: in-degree + one exact PageRank step -------------------------
# Web-corpus curation uses LINK-GRAPH authority (Common Crawl publishes
# harmonic-centrality/PageRank rankings; quality pipelines join them as
# a per-page signal). The fixture documents carry no hrefs, so the edge
# list is synthesized deterministically from doc_id (the _INJECT
# discipline): doc d emits 1 + d % 4 out-links, link j targeting
# (d*31 + j*17 + 7) mod n_docs — a dense pseudo-random digraph both
# engines replay exactly.
#
# The authority column is ONE PageRank power-iteration step,
# r(d) = sum over in-edges (src -> d) of 1 / out_degree(src), computed
# EXACTLY: out-degrees lie in {1,2,3,4}, so contributions are summed as
# integers scaled by lcm(1..4) = 12 (w = 12 / outdeg in {12,6,4,3}) and
# divided back once at the end — no float accumulation order anywhere.

LINK_LCM = 12  # lcm of the possible out-degrees {1,2,3,4}


@register(
    "link_graph",
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    e AS (SELECT doc_id AS src,
                 CAST(1 + doc_id % 4 AS BIGINT) AS out_degree,
                 unnest(list_transform(
                   range(0, CAST(1 + doc_id % 4 AS INT)),
                   j -> (doc_id * 31 + j * 17 + 7) % n.n)) AS dst
          FROM documents CROSS JOIN n),
    ind AS (SELECT dst,
                   CAST(COUNT(*) AS BIGINT) AS in_degree,
                   CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src,
                   CAST(SUM({LINK_LCM} / out_degree) AS BIGINT) AS units
            FROM e GROUP BY dst)
    SELECT d.doc_id,
           CAST(1 + d.doc_id % 4 AS BIGINT) AS out_degree,
           COALESCE(i.in_degree, 0) AS in_degree,
           COALESCE(i.n_src, 0) AS n_src,
           CAST(COALESCE(i.units, 0) AS DOUBLE) / {LINK_LCM}.0 AS authority
    FROM documents d LEFT JOIN ind i ON i.dst = d.doc_id
    """,
)
def link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph authority signals per page: out-degree, in-degree,
    distinct inlinking sources, and one exact PageRank power-iteration
    step (authority = sum of 1/out_degree(src) over in-edges, computed
    in integer {LINK_LCM}ths so no float accumulation order crosses the
    engine boundary — the lm_surprisal no-libm discipline applied to
    graph rank).

    Scale: the edge explode is bounded ×4 per doc; in-degree/units are
    ONE groupBy(dst) with map-side partial SUM/COUNT (a hub page with
    10^9 inlinks collapses to one partial per task — the hot-key shape
    groupBy handles and a window would not), and COUNT(DISTINCT src)
    plans as Spark's two-level partial-distinct expansion. The corpus
    size reaches the plan as a 1-row broadcast (the lm_surprisal total
    idiom), and the final enrichment is a doc_id-keyed left join. At
    real scale src/dst are xxhash64(url) keys from an href-extraction
    kernel pass; nothing about the aggregation changes."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.count("*").cast("bigint").alias("n"))
    e = (docs.crossJoin(F.broadcast(n))
         .select(F.col("doc_id").alias("src"),
                 (1 + F.col("doc_id") % 4).cast("bigint").alias("out_degree"),
                 F.explode(F.expr(
                     "transform(sequence(0, CAST(doc_id % 4 AS INT)),"
                     " j -> (doc_id * 31 + j * 17 + 7) % n)")).alias("dst")))
    ind = e.groupBy("dst").agg(
        F.count("*").cast("bigint").alias("in_degree"),
        F.countDistinct("src").cast("bigint").alias("n_src"),
        F.sum(F.lit(LINK_LCM) / F.col("out_degree")).cast("bigint")
        .alias("units"))
    return (docs.join(ind, docs.doc_id == ind.dst, "left")
            .select(
                "doc_id",
                (1 + F.col("doc_id") % 4).cast("bigint").alias("out_degree"),
                F.coalesce("in_degree", F.lit(0)).cast("bigint")
                .alias("in_degree"),
                F.coalesce("n_src", F.lit(0)).cast("bigint").alias("n_src"),
                (F.coalesce("units", F.lit(0)).cast("double")
                 / F.lit(float(LINK_LCM))).alias("authority")))


LINK_RANK_ITERS = 3  # unrolled power iterations (rank units: 12^k)


@register(
    "link_rank",
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    e AS (SELECT doc_id AS src,
                 CAST({LINK_LCM} / (1 + doc_id % 4) AS BIGINT) AS w,
                 unnest(list_transform(
                   range(0, CAST(1 + doc_id % 4 AS INT)),
                   j -> (doc_id * 31 + j * 17 + 7) % n.n)) AS dst
          FROM documents CROSS JOIN n),
    r1 AS (SELECT e.dst AS doc_id, CAST(SUM(e.w) AS BIGINT) AS u
           FROM e GROUP BY e.dst),
    r2 AS (SELECT e.dst AS doc_id, CAST(SUM(r1.u * e.w) AS BIGINT) AS u
           FROM e JOIN r1 ON r1.doc_id = e.src GROUP BY e.dst),
    r3 AS (SELECT e.dst AS doc_id, CAST(SUM(r2.u * e.w) AS BIGINT) AS u
           FROM e JOIN r2 ON r2.doc_id = e.src GROUP BY e.dst)
    SELECT d.doc_id,
           CAST(COALESCE(r3.u, 0) AS BIGINT) AS rank_units,
           CAST(COALESCE(r3.u, 0) AS DOUBLE)
             / {LINK_LCM}.0 / {LINK_LCM}.0 / {LINK_LCM}.0 AS rank
    FROM documents d LEFT JOIN r3 ON r3.doc_id = d.doc_id
    """,
)
def link_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank ({LINK_RANK_ITERS} power iterations, no
    damping) over the synthesized link graph, EXACT end to end: iteration
    k's ranks are integers in units of {LINK_LCM}^k (each edge multiplies
    by the integer {LINK_LCM}/out_degree), divided back to a double once
    at the very end — iterative graph rank with zero float accumulation,
    so the DuckDB oracle replays it bit-for-bit. The uniform start vector
    (1 per page) makes iteration 1 identical to link_graph's authority
    column scaled by {LINK_LCM}.

    Scale: the canonical Spark iterative-graph shape — a LOOP of
    (join ranks to edges on src) + (groupBy dst with map-side partial
    SUM), one bounded shuffle pair per iteration, the edge list reused
    across iterations (a real job would persist it; ~K·|E| total traffic
    for K iterations). No corpus-sized window, no driver collect; hub
    in-degree collapses map-side exactly as in link_graph. Unit growth is
    the exactness price: units stay < 2^63 while n·{LINK_LCM}^k·d_max
    does — production would switch to doubles after verifying a prefix
    exactly."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.count("*").cast("bigint").alias("n"))
    e = (docs.crossJoin(F.broadcast(n))
         .select(F.col("doc_id").alias("src"),
                 (F.lit(LINK_LCM) / (1 + F.col("doc_id") % 4))
                 .cast("bigint").alias("w"),
                 F.explode(F.expr(
                     "transform(sequence(0, CAST(doc_id % 4 AS INT)),"
                     " j -> (doc_id * 31 + j * 17 + 7) % n)")).alias("dst")))
    ranks = e.groupBy("dst").agg(
        F.sum("w").cast("bigint").alias("u")).withColumnRenamed("dst", "rid")
    for _ in range(LINK_RANK_ITERS - 1):
        ranks = (e.join(ranks, e.src == ranks.rid)
                 .groupBy("dst")
                 .agg(F.sum(F.col("u") * F.col("w")).cast("bigint")
                      .alias("u"))
                 .withColumnRenamed("dst", "rid"))
    # divide back in three successive steps — the same IEEE operation
    # sequence as the oracle's /12.0/12.0/12.0 (one /1728.0 could round
    # differently in the last ulp)
    return (docs.join(ranks, docs.doc_id == ranks.rid, "left")
            .select("doc_id",
                    F.coalesce("u", F.lit(0)).cast("bigint")
                    .alias("rank_units"),
                    (F.coalesce("u", F.lit(0)).cast("double")
                     / F.lit(LINK_LCM) / F.lit(LINK_LCM) / F.lit(LINK_LCM))
                    .alias("rank")))
