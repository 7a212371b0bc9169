"""Streaming incremental near-dedup: a NEW crawl snapshot streams against
the RETAINED corpus — the Structured Streaming twin of
queries/dedup_q.dedup_incremental (same cross-side discipline: old×old
and new×new pairs are never generated) and the streaming face of the
fused job's near-dup pass (plans/corpus.near_dup_pairs).

Shape (all per-micro-batch, NO cross-batch state needed — that is the
point, and the test asserts it):

1. The retained corpus is sketched ONCE offline (`retained_sketch`):
   a band table (b, band_key → old_ids, MAX_BUCKET-capped) and a
   signature table (old_id → distinct shingle set). In production both
   are persisted tables refreshed per retention cycle; every micro-batch
   probes them as the STATIC side of a stream-static equi-join — which
   Structured Streaming executes STATELESSLY, so by construction no
   old×old candidate can exist and state does not grow with the
   retained-corpus size (the round-1 streaming-dedup failure mode).
2. Each micro-batch of new docs builds its MinHash band keys (xxhash64
   permutations over hashed word shingles — the plans/corpus.py
   production-hash discipline, never gram strings) and LEFT-joins the
   band table, keeping no-candidate docs.
3. The Jaccard verify + best-match election runs per NEW doc inside
   ``applyInPandasWithState`` — used here as a per-batch grouping
   operator: every candidate row for a new doc lands in the same batch
   (its bands were computed there), so the group function NEVER calls
   ``state.update`` and the state store stays at zero rows across any
   number of batches (asserted from query progress in tests). Duplicate
   (new, old) candidates from multiple agreeing bands are deduped inside
   the group.

Cross-batch NEW×NEW dedup stays composable upstream: chain
``stateful.stream_dedup`` (watermark-bounded exact, or the fixed-size
bloom variant) before this operator — separation the batch twin gets
from its exact-pass-then-near-pass staging.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.dedup_q import MAX_BUCKET, N_BANDS, N_PERM

SHINGLE_N = 3
JACCARD_T = 0.5

OUT_SCHEMA = ("url string, keep boolean, n_dups long, "
              "best_jaccard double, dup_of string")
# required by the API; never written — zero state rows is the contract
STATE_SCHEMA = "unused long"

_MH_TERMS = ", ".join(
    f"array_min(transform(gh, g -> xxhash64({j}, g)))" for j in range(N_PERM))


def _signatures(docs: DataFrame, idc: str) -> DataFrame:
    """(idc, gh, mh): sorted distinct hashed word shingles + MinHash
    signature. Word-hash-combine, no gram strings (corpus.py:_shingle_sets
    rationale); docs shorter than SHINGLE_N words get gh = [] and a NULL
    mh (they cannot near-dup — the caller keeps them unconditionally)."""
    whs = ", ".join(f"element_at(wh, i + {j + 1})" for j in range(SHINGLE_N))
    gh = (f"CASE WHEN size(wh) >= {SHINGLE_N} THEN "
          f"array_sort(array_distinct(transform("
          f"sequence(0, size(wh) - {SHINGLE_N}), i -> xxhash64({whs}))))"
          f" ELSE array() END")
    return (docs
            .withColumn("wh", F.expr(
                "transform(split(text, ' '), x -> xxhash64(x))"))
            .select(idc, F.expr(gh).alias("gh"))
            .withColumn("mh", F.when(
                F.size("gh") > 0, F.expr(f"array({_MH_TERMS})"))))


def _bands(sig: DataFrame, idc: str, carry: tuple[str, ...] = ()) -> DataFrame:
    """One row per (doc, band). `carry` columns ride along — the stream
    side carries its shingle set so the verify never has to join back to
    its own streaming lineage (a stream-stream self-join needs watermarks
    this operator has no business requiring); the ×N_BANDS duplication is
    bounded and is the same payload the batch twin's verify join ships."""
    return (sig.filter(F.col("mh").isNotNull())
            .select(idc, *carry,
                    F.explode(F.sequence(
                        F.lit(0), F.lit(N_BANDS - 1))).alias("b"),
                    F.expr("concat(element_at(mh, 2 * b + 1), ':',"
                           " element_at(mh, 2 * b + 2))").alias("band_key")))


def retained_sketch(retained: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(band_table, sig_table) for the static side. band_table buckets
    are MAX_BUCKET-capped BEFORE any stream ever probes them — a
    degenerate band key (boilerplate corpus) is dropped at build time,
    so no micro-batch can trigger an O(bucket²)-ish blow-up. Both tables
    are plain DataFrames: persist() them in-session or write them as
    tables for cross-snapshot reuse."""
    sig = _signatures(retained.select("url", "text"), "url")
    bands = _bands(sig, "url")
    band_table = (bands.groupBy("b", "band_key")
                  .agg(F.array_sort(F.collect_list("url")).alias("old_ids"))
                  .filter(F.size("old_ids") <= MAX_BUCKET))
    return band_table, sig.select(F.col("url").alias("old_id"),
                                  F.col("gh").alias("o_gh"))


def _verify_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-NEW-doc verify + best-match election. Never touches `state`:
    all of a doc's candidates are batch-local (stream-static join), so
    the state store must stay empty — bounded-state-by-construction."""
    url = key[0]
    n_gh: set | None = None
    cands: dict[str, object] = {}
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            if n_gh is None:
                n_gh = set(row["gh"]) if row["gh"] is not None else set()
            old_id = row["old_id"]
            if old_id is not None and old_id not in cands:
                cands[old_id] = row["o_gh"]
    dups = []
    for old_id, o_gh in cands.items():
        if o_gh is None:
            continue
        o = set(o_gh)
        inter = len(n_gh & o)
        union = len(n_gh) + len(o) - inter
        if union and inter / union >= JACCARD_T:
            dups.append((inter / union, old_id))
    if dups:
        # tie-break: highest jaccard, then LOWEST old_id (batch-twin rule)
        best_j = max(j for j, _ in dups)
        best_old = min(o for j, o in dups if j == best_j)
        yield pd.DataFrame({"url": [url], "keep": [False],
                            "n_dups": [len(dups)], "best_jaccard": [best_j],
                            "dup_of": [best_old]})
    else:
        yield pd.DataFrame({"url": [url], "keep": [True], "n_dups": [0],
                            "best_jaccard": [None], "dup_of": [None]})


def stream_dedup_incremental(new_stream: DataFrame, band_table: DataFrame,
                             sig_table: DataFrame) -> DataFrame:
    """streaming (url, text) → one row per new doc with the batch twin's
    output contract (keep, n_dups, best_jaccard, dup_of). Candidates come
    from two stateless stream-static joins (bands, then old signatures);
    the only grouped operator keeps zero state rows."""
    sig = _signatures(new_stream.select("url", "text"), "url")
    probe = (_bands(sig, "url", carry=("gh",))
             .join(band_table, ["b", "band_key"], "left")
             .select("url", "gh", F.explode_outer("old_ids").alias("old_id"))
             .join(sig_table, "old_id", "left"))
    # no-band docs (< SHINGLE_N words) never reach `probe`; union them in
    # as candidate-less rows so every new doc gets its verdict row
    no_band = sig.filter(F.col("mh").isNull()).select(
        "url", "gh", F.lit(None).cast("string").alias("old_id"),
        F.lit(None).cast("array<long>").alias("o_gh"))
    enriched = probe.unionByName(no_band)
    return (enriched.groupBy("url")
            .applyInPandasWithState(
                _verify_fn,
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
