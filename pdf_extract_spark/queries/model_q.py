"""Model-fit-backed curation ops: the corpus-preparation stages that fit a
small model ON the corpus and immediately apply it back — the pattern behind
FineWeb-Edu-style classifier gating, tokenizer training, and SemDeDup's
clustering stage. Three families:

- ``nb_classify``: a multinomial Naive-Bayes language classifier fit on a
  deterministic labeled subset of the corpus (hashed bag-of-words features,
  integer-bit log-probabilities) and applied to every document — the
  model-based quality/topic gate generalizing the reference's per-document
  routing decision (/root/reference/modules/routers.py decides each
  document's path from its content; here the decision function is *fit from
  the corpus itself* and applied in one distributed pass).
- ``bpe_pair_counts`` / ``bpe_train`` / ``bpe_encode``: byte-pair-encoding
  tokenizer training (Sennrich et al. 2016, public method) — the corpus is
  collapsed to its word-frequency table ONCE, and every merge iteration
  runs on that bounded vocab table, collecting exactly one argmax row per
  merge to the driver (a model fit, the SQ8-codebook / IVF-index
  discipline, vectors_q.py).
- ``kmeans_embed``: two unrolled Lloyd iterations over quantized
  embeddings — the fitted-centroid model that dedup_semantic (SemDeDup
  clustering) and the IVF index treat as an external artifact, here
  actually trained: per iteration one narrow assignment pass against
  broadcast literal centroids plus one bounded K×d partial aggregation.

Parity contract (queries/__init__.py): identical aliases both engines,
BIGINT for every integer output, integer-only cross-engine arithmetic
except where both sides evaluate the identical IEEE-double expression
shape on identical operand bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import explode_ne, register, tbl
from .pipeline_q import _bucket3, _duck_bucket3

# --- Naive-Bayes language classifier ---------------------------------------
# Fit on the deterministic labeled subset doc_id % 3 == 0 (the "annotated
# seed set" a production pipeline gets from human labels or a teacher
# model — FineWeb-Edu's LLM-scored seed docs), predict every document.
# Features: words hashed into NB_B buckets (the DSIR _bucket3 idiom —
# 3 sha256 hex nibbles, engine-identical). Log-probabilities are integer
# bit lengths (the lm_surprisal `length(bin(x))` idiom), so no libm log
# crosses the engine boundary:
#
#   score(d, c) = sum_w bits(n[c, b(w)] + 1)            (Laplace numerator)
#               - n_tok(d) * bits(N[c] + NB_B)          (denominator)
#               + bits(D[c])                            (class prior)
#
# argmax over classes, ties to the lexicographically smallest lang, via
# the fixed-width-string MIN (the winnow_fingerprint HashAggregate-argmin
# idiom): key = lpad(NB_OFF - score, NB_W, '0') || class.

NB_B = 4096       # hashed-feature buckets (16^3)
NB_OFF = 100_000_000  # argmax string-encoding offset; must exceed any
#                   reachable |score| (n_tok x max bucket bits) or the
#                   NB_W-digit lpad field TRUNCATES (Spark lpad truncates
#                   long inputs!) and corrupts the argmax — sized for
#                   million-token documents, far past the fixture
NB_W = 9          # fixed key width: len(str(NB_OFF - score)) <= NB_W


@register(
    "nb_classify",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang,
                       unnest(string_split(text, ' ')) AS w
                FROM documents),
    bk AS (SELECT doc_id, lang, {_duck_bucket3('sha256(w)')} AS b FROM tk),
    stats AS (SELECT lang AS c, b, CAST(COUNT(*) AS BIGINT) AS n
              FROM bk WHERE doc_id % 3 = 0 GROUP BY lang, b),
    cls AS (SELECT c, CAST(SUM(n) AS BIGINT) AS nc FROM stats GROUP BY c),
    pri AS (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS dc
            FROM documents WHERE doc_id % 3 = 0 GROUP BY lang),
    sc AS (SELECT bk.doc_id,
                  bk.lang,
                  cls.c,
                  CAST(COUNT(*) AS BIGINT) AS n_tok,
                  CAST(SUM(length(bin(COALESCE(stats.n, 0) + 1))) AS BIGINT)
                      AS s1
           FROM bk
           CROSS JOIN cls
           LEFT JOIN stats ON stats.c = cls.c AND stats.b = bk.b
           GROUP BY bk.doc_id, bk.lang, cls.c),
    scored AS (SELECT sc.doc_id, sc.lang, sc.n_tok, sc.c,
                      sc.s1
                      - sc.n_tok * length(bin(cls.nc + {NB_B}))
                      + length(bin(pri.dc)) AS score
               FROM sc JOIN cls ON cls.c = sc.c JOIN pri ON pri.c = sc.c),
    pick AS (SELECT doc_id, lang, n_tok,
                    MIN(lpad(CAST({NB_OFF} - score AS VARCHAR), {NB_W}, '0')
                        || c) AS k
             FROM scored GROUP BY doc_id, lang, n_tok)
    SELECT doc_id,
           lang,
           n_tok,
           substr(k, {NB_W + 1}) AS pred_lang,
           CAST({NB_OFF} - CAST(substr(k, 1, {NB_W}) AS BIGINT) AS BIGINT)
               AS pred_bits,
           (doc_id % 3 = 0) AS is_train,
           (substr(k, {NB_W + 1}) = lang) AS correct
    FROM pick
    """,
)
def nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes language classifier, fit in-corpus and
    applied corpus-wide (reference parity: the content-conditional routing
    of /root/reference/modules/routers.py, generalized to a classifier the
    pipeline fits from its own labeled seed subset — the FineWeb-Edu
    model-based-curation pattern). Train set: doc_id % 3 == 0 with its
    `lang` label; features: words hashed to {NB_B} buckets; scores:
    integer-bit Laplace log-probabilities (see module comment) so both
    engines do pure int64 arithmetic.

    Scale shape: the FIT is one groupBy(lang, b) — at most C·{NB_B} rows,
    map-side partials collapse any corpus to that bound per task — plus a
    C-row prior count; the class-level constants (C rows) come to the
    driver as the fitted model's scalar half (the codebook discipline).
    The PREDICT pass pivots the bucket stats into ONE broadcast
    map(b -> {{class: n}}) — so the token stream joins ONCE with no ×C
    row expansion — and reduces through a SINGLE map-side-combined
    groupBy(doc_id) carrying C parallel SUM columns; the per-doc argmax
    is F.least over C fixed-width string keys (no struct buffers, no
    sort, no window). The oracle keeps the equivalent relational ×C +
    double-groupBy form — same integer arithmetic, value-identical — and
    plans/corpus.classify_docs is this shape's production twin (measured
    2.7× over the ×C form at 300k pages)."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tk = explode_ne(docs, ["doc_id", "lang"], F.split("text", " "), "w")
    bk = tk.select("doc_id", "lang",
                   F.expr(_bucket3("sha2(w, 256)")).alias("b"))
    stats = (bk.filter(F.col("doc_id") % 3 == 0)
             .groupBy(F.col("lang").alias("c"), "b")
             .agg(F.count("*").cast("bigint").alias("n")))
    cls = (stats.groupBy("c")
           .agg(F.sum("n").cast("bigint").alias("nc")))
    pri = (docs.filter(F.col("doc_id") % 3 == 0)
           .groupBy(F.col("lang").alias("c"))
           .agg(F.count("*").cast("bigint").alias("dc")))
    consts = {r["c"]: (int(r["nc"]), int(r["dc"]))
              for r in cls.join(pri, "c").collect()}
    classes = sorted(consts)
    bmap = (stats.groupBy("b")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("c", "n"))).alias("m")))
    j = bk.join(F.broadcast(bmap), "b", "left")
    s_cols = [
        F.sum(F.length(F.bin(
            F.coalesce(F.element_at("m", F.lit(c)), F.lit(0)) + F.lit(1))))
        .cast("bigint").alias(f"_s_{i}")
        for i, c in enumerate(classes)]
    agg = (j.groupBy("doc_id", "lang")
           .agg(F.count("*").cast("bigint").alias("n_tok"), *s_cols))
    score = {}
    for i, c in enumerate(classes):
        nc, dc = consts[c]
        score[c] = (F.col(f"_s_{i}")
                    - F.col("n_tok") * F.lit((nc + NB_B).bit_length())
                    + F.lit(dc.bit_length()))
    keys = [F.concat(F.lpad((F.lit(NB_OFF) - score[c]).cast("string"),
                            NB_W, "0"), F.lit(c)) for c in classes]
    k = F.least(*keys) if len(keys) > 1 else keys[0]
    return (agg.withColumn("k", k)
            .select(
                "doc_id", "lang", "n_tok",
                F.expr(f"substr(k, {NB_W + 1})").alias("pred_lang"),
                (F.lit(NB_OFF)
                 - F.expr(f"CAST(substr(k, 1, {NB_W}) AS BIGINT)"))
                .cast("bigint").alias("pred_bits"),
                (F.col("doc_id") % 3 == 0).alias("is_train"),
                (F.expr(f"substr(k, {NB_W + 1})") == F.col("lang"))
                .alias("correct")))


# --- BPE tokenizer training -------------------------------------------------
# Sennrich et al. 2016 (public method). The scale discipline: the corpus is
# collapsed to its word-frequency table ONCE (one groupBy(w) — at 100 TB
# the vocab is millions of rows vs trillions of tokens), every merge
# iteration runs on that bounded table, and the only driver traffic is the
# single argmax (pair, count) row per merge — the fitted model, cached per
# sf_dir like the SQ8 codebook (vectors_q.py).
#
# A word is encoded as its token list in one string:
#   s = '|' + join(tokens, '||') + '|'        (every token wrapped |t|)
# so merging pair (a, b) is ONE literal replace:
#   replace(s, '|a||b|', '|ab|')
# replace() scans left-to-right over non-overlapping matches in both
# engines, which is exactly BPE's greedy single-pass merge ('a a a a' with
# pair (a,a) -> [aa, aa]; the middle overlap is skipped). '|' cannot occur
# inside a token: the word stream is filtered to ^[a-z]+$ (Java∩RE2) and
# merged tokens are concatenations of those alphabets.

BPE_K = 8  # merges learned (unrolled in the oracle CTE chain)

# pair list from an encoded word: toks = split(substr(s, 2, len-2), '||'),
# pairs = [toks[i] || '>' || toks[i+1]]. DuckDB range(1, n) is exclusive
# (empty for single-token words); the Spark side needs an explicit CASE
# because sequence(1, 0) yields a DESCENDING [1, 0], not [].
_DUCK_PAIRS = ("list_transform(range(1, len(t)),"
               " i -> t[i] || '>' || t[i + 1])")
_SPARK_PAIRS = ("CASE WHEN size(t) > 1 THEN"
                " transform(sequence(1, size(t) - 1),"
                "  i -> concat(element_at(t, i), '>', element_at(t, i + 1)))"
                " ELSE CAST(array() AS ARRAY<STRING>) END")

_DUCK_ENC = ("'|' || array_to_string(list_transform("
             "range(1, length(w) + 1), i -> substr(w, i, 1)), '||') || '|'")
_SPARK_ENC = ("concat('|', array_join(transform("
              "sequence(1, length(w)), i -> substr(w, i, 1)), '||'), '|')")

_DUCK_WORDS = ("SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM"
               " (SELECT unnest(string_split(text, ' ')) AS w FROM documents)"
               " WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w")


def _duck_bpe_chain(k: int) -> str:
    """CTE chain wf -> s0 -> (p1, s1) -> ... -> (pk, sk): p{i} is merge i's
    argmax (cnt DESC, pair ASC — total order) and s{i} the vocab with it
    applied. Generated from BPE_K so a constant change cannot desync the
    oracle from the Spark loop (r3 ADVICE discipline)."""
    parts = [f"wf AS MATERIALIZED ({_DUCK_WORDS})",
             f"s0 AS MATERIALIZED (SELECT w, {_DUCK_ENC} AS s, f FROM wf)"]
    for i in range(1, k + 1):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt"
            f" FROM (SELECT unnest({_DUCK_PAIRS}) AS pair, f"
            f"       FROM (SELECT string_split(substr(s, 2, length(s) - 2), '||') AS t, f"
            f"             FROM s{i - 1}))"
            f" GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1)")
        pat = (f"'|' || (SELECT string_split(pair, '>')[1] FROM p{i})"
               f" || '||' || (SELECT string_split(pair, '>')[2] FROM p{i})"
               f" || '|'")
        rep = f"'|' || (SELECT replace(pair, '>', '') FROM p{i}) || '|'"
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT w, replace(s, {pat}, {rep}) AS s, f"
            f" FROM s{i - 1})")
    return "WITH " + ",\n    ".join(parts)


_BPE_CACHE: dict[str, list[tuple[int, str, int]]] = {}


def _bpe_fit(spark: SparkSession, sf_dir: str) -> list[tuple[int, str, int]]:
    """Learn BPE_K merges; returns [(rank, 'a>b', cnt)]. One corpus pass
    (the vocab groupBy, persisted), then BPE_K bounded vocab passes with a
    1-row collect each. Cached per sf_dir (the SQ8-codebook discipline:
    refitting an identical model per invocation is wasted work and skews
    benches)."""
    if sf_dir in _BPE_CACHE:
        return _BPE_CACHE[sf_dir]
    docs = tbl(spark, sf_dir, "documents").select("text")
    words = explode_ne(docs, [], F.split("text", " "), "w")
    wf = (words.filter(F.col("w").rlike("^[a-z]+$"))
          .groupBy("w").agg(F.count("*").cast("bigint").alias("f")))
    cur = wf.select("w", F.expr(_SPARK_ENC).alias("s"), "f").persist()
    cur.count()  # materialize: the corpus scan happens exactly once
    merges: list[tuple[int, str, int]] = []
    try:
        for rank in range(1, BPE_K + 1):
            best = (cur
                    .select(F.expr("split(substr(s, 2, length(s) - 2), '\\\\|\\\\|')")
                            .alias("t"), "f")
                    .select(F.explode(F.expr(_SPARK_PAIRS)).alias("pair"), "f")
                    .groupBy("pair").agg(F.sum("f").cast("bigint").alias("cnt"))
                    .orderBy(F.col("cnt").desc(), "pair")
                    .first())
            if best is None:  # fewer mergeable pairs than BPE_K — the
                # oracle chain's empty-p{i} scalar subqueries would go
                # NULL and silently desync; fail loudly instead
                raise ValueError(
                    f"corpus exhausted after {rank - 1} merges; "
                    f"BPE_K={BPE_K} needs a larger corpus")
            pair, cnt = best["pair"], int(best["cnt"])
            a, b = pair.split(">")
            merges.append((rank, pair, cnt))
            nxt = (cur.select(
                "w",
                F.expr(f"replace(s, '|{a}||{b}|', '|{a}{b}|')").alias("s"),
                "f").persist())
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    _BPE_CACHE[sf_dir] = merges
    return merges


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH wf AS ({_DUCK_WORDS}),
    s0 AS (SELECT {_DUCK_ENC} AS s, f FROM wf),
    pc AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
           FROM (SELECT unnest({_DUCK_PAIRS}) AS pair, f
                 FROM (SELECT string_split(substr(s, 2, length(s) - 2), '||') AS t, f
                       FROM s0))
           GROUP BY pair)
    SELECT pair, cnt, rank FROM
      (SELECT pair, cnt,
              CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT)
                  AS rank
       FROM pc)
    WHERE rank <= 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies (BPE iteration 0),
    top 50 under the (cnt DESC, pair ASC) total order. Scale shape: ONE
    corpus scan collapsed by groupBy(w) map-side partials into the vocab
    table; the pair explode and count run on |vocab| rows; the top-50 is
    orderBy+limit (TakeOrderedAndProject — per-partition heaps, never a
    global sort) and the rank window sorts only the 50 survivors."""
    docs = tbl(spark, sf_dir, "documents").select("text")
    words = explode_ne(docs, [], F.split("text", " "), "w")
    wf = (words.filter(F.col("w").rlike("^[a-z]+$"))
          .groupBy("w").agg(F.count("*").cast("bigint").alias("f")))
    pairs = (wf.select(F.expr(_SPARK_ENC).alias("s"), "f")
             .select(F.expr("split(substr(s, 2, length(s) - 2), '\\\\|\\\\|')").alias("t"),
                     "f")
             .select(F.explode(F.expr(_SPARK_PAIRS)).alias("pair"), "f"))
    pc = (pairs.groupBy("pair")
          .agg(F.sum("f").cast("bigint").alias("cnt"))
          .orderBy(F.col("cnt").desc(), "pair").limit(50))
    w = Window.orderBy(F.col("cnt").desc(), "pair")  # 50 rows: bounded
    return pc.select("pair", "cnt",
                     F.row_number().over(w).cast("bigint").alias("rank"))


@register(
    "bpe_train",
    oracle=(_duck_bpe_chain(BPE_K) + "\n    "
            + "\n    UNION ALL ".join(
                f"SELECT CAST({i} AS BIGINT) AS rank, pair AS merge, cnt"
                f" FROM p{i}" for i in range(1, BPE_K + 1))),
)
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training: the {BPE_K} highest-count merges, learned
    greedily (see _bpe_fit). Output is the fitted model itself — rank,
    merge pair 'a>b', and the pair's weighted count at selection time —
    value-exact against the unrolled DuckDB CTE chain recomputing every
    iteration relationally."""
    merges = _bpe_fit(spark, sf_dir)
    return spark.createDataFrame(
        [(r, p, c) for r, p, c in merges],
        "rank bigint, merge string, cnt bigint")


@register(
    "bpe_encode",
    oracle=(_duck_bpe_chain(BPE_K) + f""",
    enc AS (SELECT w,
                   CAST(len(string_split(substr(s, 2, length(s) - 2), '||')) AS BIGINT)
                       AS n_pieces
            FROM s{BPE_K}),
    cw AS (SELECT doc_id, w FROM
             (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
           WHERE regexp_matches(w, '^[a-z]+$'))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(enc.n_pieces) AS BIGINT) AS n_tokens,
           CAST(SUM(length(cw.w)) AS BIGINT) AS n_chars
    FROM cw JOIN enc USING (w)
    GROUP BY doc_id
    """),
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the fitted BPE merges to every document: per-doc word, BPE
    token, and char counts — the fit→transform composition a tokenizer
    deployment runs. Scale shape: the merge chain (a fixed pipeline of
    {BPE_K} narrow replaces) is applied ONCE to the distinct-word table,
    which then broadcast-joins back to the corpus token stream (vocab is
    bounded; the corpus side never shuffles for the join) and reduces by
    one groupBy(doc_id) with map-side partials."""
    merges = _bpe_fit(spark, sf_dir)
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    cw = (explode_ne(docs, ["doc_id"], F.split("text", " "), "w")
          .filter(F.col("w").rlike("^[a-z]+$")))
    vocab = cw.select("w").distinct()
    expr = _SPARK_ENC
    for _, pair, _cnt in merges:
        a, b = pair.split(">")
        expr = f"replace({expr}, '|{a}||{b}|', '|{a}{b}|')"
    enc = (vocab.select("w", F.expr(expr).alias("s"))
           .select("w",
                   F.expr("CAST(size(split(substr(s, 2, length(s) - 2),"
                          " '\\\\|\\\\|')) AS BIGINT)").alias("n_pieces")))
    return (cw.join(F.broadcast(enc), "w")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_words"),
                 F.sum("n_pieces").cast("bigint").alias("n_tokens"),
                 F.sum(F.length("w")).cast("bigint").alias("n_chars")))


# --- distributed Lloyd's k-means over quantized embeddings ------------------
# The fitted-centroid model that dedup_semantic (SemDeDup's clustering
# stage) and the IVF coarse quantizer treat as an external artifact, here
# actually trained: KM_ITERS unrolled Lloyd iterations. Embeddings are
# quantized to integers (q_i = floor(x_i * KM_Q + 0.5) — floor, not
# round(): round-half semantics differ between engines, floor(x + 0.5) is
# IEEE-identical in both) so centroid updates are ORDER-INSENSITIVE int64
# sums; centroid means s/n and the squared-distance folds are then the
# same IEEE-double expression shape on identical operand bits in both
# engines (the _spark_l2/_duck_l2 discipline, vectors_q.py).

KM_K = 8        # clusters (seeds: the KM_K lowest vec_ids)
KM_Q = 64.0     # quantization scale
KM_ITERS = 2    # DESCRIPTIVE ONLY: assignment passes in the hand-unrolled
#                 pair (Spark a1→update→a2 / oracle cl0→a1→cl1→a2). The
#                 two sides are unrolled in lockstep BY HAND — changing
#                 this constant alone changes neither; extend both (add
#                 an update+assign round to each) or generate both from
#                 a shared loop if deeper unrolls are ever needed.

_DUCK_QUANT = ("list_transform(embedding, x -> CAST(floor("
               f"CAST(x AS DOUBLE) * {KM_Q} + 0.5) AS BIGINT))")

from .vectors_q import EMB_DIM  # noqa: E402  (shared dim constant)


def _duck_km_dists(q: str, cl: str) -> str:
    term = (f"(CAST({q}[i] AS DOUBLE) - {cl}[j][i])"
            f" * (CAST({q}[i] AS DOUBLE) - {cl}[j][i])")
    return (f"list_transform(range(1, {KM_K + 1}), j -> "
            f"list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> {term})))")


def _duck_km_assign(q: str, cl: str) -> str:
    d = _duck_km_dists(q, cl)
    return (f"CAST(list_position({d}, list_aggregate({d}, 'min')) - 1"
            f" AS BIGINT)")


_DUCK_KMEANS = f"""
    WITH q AS MATERIALIZED (SELECT vec_id, {_DUCK_QUANT} AS q
                            FROM embeddings),
    cl0 AS MATERIALIZED (SELECT list(list_transform(q, x ->
                                CAST(x AS DOUBLE)) ORDER BY vec_id) AS cl
                         FROM q WHERE vec_id < {KM_K}),
    a1 AS MATERIALIZED (SELECT vec_id, q,
                               {_duck_km_assign('q', 'cl0.cl')} AS c1
                        FROM q CROSS JOIN cl0),
    sums AS (SELECT c1, dims.i,
                    CAST(SUM(q[dims.i]) AS BIGINT) AS s,
                    CAST(COUNT(*) AS BIGINT) AS n
             FROM a1 CROSS JOIN (SELECT CAST(range AS INT) AS i
                                 FROM range(1, {EMB_DIM + 1})) dims
             GROUP BY c1, dims.i),
    cm AS (SELECT c1 AS j,
                  list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY i)
                      AS cd
           FROM sums GROUP BY c1),
    cl1 AS MATERIALIZED (SELECT list(COALESCE(cm.cd, cl0.cl[js.j + 1])
                                     ORDER BY js.j) AS cl
                         FROM (SELECT CAST(range AS BIGINT) AS j
                               FROM range(0, {KM_K})) js
                         LEFT JOIN cm ON cm.j = js.j
                         CROSS JOIN cl0)
    SELECT a1.vec_id, a1.c1,
           {_duck_km_assign('a1.q', 'cl1.cl')} AS c2,
           (a1.c1 <> {_duck_km_assign('a1.q', 'cl1.cl')}) AS moved
    FROM a1 CROSS JOIN cl1
"""


def _km_assign_col(qcol, cents: list[list[float]]):
    """Argmin-distance assignment against literal centroids: an UNROLLED
    array of KM_K ordered folds (zip_with + aggregate — the bit-exact
    _spark_l2 shape) and array_position(min) for the first-minimum
    tie-break (ties go to the lowest cluster id in both engines)."""
    def d_to(c):
        cl = F.array(*[F.lit(float(v)) for v in c])
        sq = F.zip_with(qcol, cl,
                        lambda x, y: (x.cast("double") - y)
                        * (x.cast("double") - y))
        return F.aggregate(sq, F.lit(0.0).cast("double"),
                           lambda acc, v: acc + v)
    dists = F.array(*[d_to(c) for c in cents])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("bigint")


@register("kmeans_embed", oracle=_DUCK_KMEANS)
def kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means over quantized embeddings
    (reference parity: the centroid model behind tools.py's IVF index
    build, trained distributed instead of assumed). Seeds: the {KM_K}
    lowest vec_ids' quantized vectors; iteration = narrow assignment
    against BROADCAST LITERAL centroids (K·d doubles in the plan — the
    MLlib KMeans shape) + one bounded K×d partial aggregation; empty
    clusters keep their previous centroid.

    Scale shape: per iteration the corpus-sized work is ONE narrow
    projection (no join, no shuffle — centroids ride in the closure) and
    ONE groupBy whose map-side partials collapse every task's output to
    K×d rows; driver state is K×d integers (the fitted model — the
    SQ8-codebook discipline). The only corpus-sized exchange in the whole
    op is the posexplode groupBy's K×d-row shuffle. Iterations are
    unrolled at {KM_ITERS} for the oracle; a production fit loops to
    convergence with the same per-iteration plan."""
    out, caches = _kmeans_build(spark, sf_dir)
    res = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return res


_KM_CACHE: dict[str, tuple[list[list[float]], list[list[float]]]] = {}


def _kmeans_fit(spark: SparkSession, sf_dir: str,
                qd: DataFrame) -> tuple[list[list[float]], list[list[float]]]:
    """(seed_centroids, updated_centroids), cached per sf_dir — the fitted
    model (the SQ8-codebook / _bpe_fit discipline: a shared session must
    not re-run the two collect jobs per invocation)."""
    if sf_dir in _KM_CACHE:
        return _KM_CACHE[sf_dir]
    seeds = (qd.filter(F.col("vec_id") < KM_K)
             .orderBy("vec_id").collect())
    c0 = [[float(v) for v in r["q"]] for r in seeds]
    srows = (qd.withColumn("c1", _km_assign_col(F.col("q"), c0))
             .select("c1", F.posexplode("q").alias("i", "v"))
             .groupBy("c1", "i")
             .agg(F.sum("v").cast("bigint").alias("s"),
                  F.count("*").cast("bigint").alias("n"))
             .collect())
    sums: dict[int, list[int]] = {}
    cnts: dict[int, int] = {}
    for r in srows:
        sums.setdefault(int(r["c1"]), [0] * EMB_DIM)[int(r["i"])] = int(r["s"])
        cnts[int(r["c1"])] = int(r["n"])
    c1c = [([s / cnts[j] for s in sums[j]]  # exact: int64 / int64 in IEEE
            if j in cnts else c0[j])
           for j in range(KM_K)]
    _KM_CACHE[sf_dir] = (c0, c1c)
    return c0, c1c


def _kmeans_build(spark: SparkSession, sf_dir: str):
    """Plan builder (pre-checkpoint, so tests can assert the final
    assignment pass is a narrow projection — zero exchanges); returns
    (out, persisted_frames)."""
    emb = tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qd = (emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(KM_Q) + F.lit(0.5))
            .cast("bigint")).alias("q"))
        .persist())
    c0, c1c = _kmeans_fit(spark, sf_dir, qd)
    out = (qd.withColumn("c1", _km_assign_col(F.col("q"), c0))
           .withColumn("c2", _km_assign_col(F.col("q"), c1c))
           .withColumn("moved", F.col("c1") != F.col("c2"))
           .select("vec_id", "c1", "c2", "moved"))
    return out, [qd]
