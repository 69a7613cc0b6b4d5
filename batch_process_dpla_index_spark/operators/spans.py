"""Substring-level duplicate-span detection (exact-substring dedup).

The document-level dedup family (`operators/dedup.py`) removes whole
near-duplicate documents; this module finds *duplicated passages inside
otherwise-unique documents* — the "exact substring deduplication" step
of LLM corpus curation (boilerplate headers, license blocks, quoted
chain text). Extends the reference's per-record scoring surface
(MqReports.scala:22-88 is per-document; this is per-span) with the
span-level operator a training-data pipeline runs before tokenization.

Algorithm (suffix-array-free, shuffle-friendly):

1. Slide a stride-1 window of ``k`` tokens over every document and
   fingerprint each window with the engine-portable 60-bit ``h60``
   digest. Hashing is what keeps the shuffle narrow: the exploded
   frame carries (doc_id, pos, gram_hash) = ~24 bytes per token
   instead of the k-token gram text (~8k× heavier at k=16) — at
   100 TB the shuffle volume is a fraction of the corpus, not a
   multiple of it.
2. A gram duplicated across ``min_docs`` distinct documents marks all
   its windows. One map-side-combined aggregate on gram_hash, then an
   equi-join back to the positions frame on the same key (AQE keeps
   the pair co-partitioned, so the join reuses the aggregate's
   exchange).
3. Per document, merge overlapping/adjacent marked windows into
   maximal spans with one gaps-and-islands window: all intervals are
   [pos, pos+k), equal length, so a new island starts exactly when
   ``pos > lag(pos) + k`` — no running cummax needed.

Collision note: two distinct grams sharing an h60 value would merge
their posting lists; at 2^60 the birthday bound keeps the expected
number of colliding *pairs* below 1 until ~10^9 distinct grams per
comparison domain, and a collision can only add a false span, never
drop a true one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.functions.text import h60, tokens


def gram_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Stride-1 k-token window fingerprints: (id, pos, gram_hash).

    Documents shorter than ``k`` tokens emit no windows (a sub-k text
    cannot contain a k-token duplicated span; the guard also keeps
    ``sequence(0, size-k)`` from going negative-descending).
    """
    # Materialize the token array ONCE, then build the (pos, hash)
    # pairs INSIDE a transform and explode the 16-byte structs.
    # Exploding positions first and slicing after would copy the whole
    # token array into every generated row (quadratic bytes per doc —
    # measured 14× slower at sf0.1); and the slice/hash must reference
    # the materialized column, not the tokens() expression, because
    # interpreted HOF lambdas don't CSE (same lesson as the shingle
    # pipeline, BASELINE.md round-2 notes).
    tok = tokens(F.col(text_col))
    wins = F.when(
        F.size(F.col("__tok")) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("__tok")) - k),
            lambda i: F.struct(
                i.alias("pos"),
                h60(F.concat_ws(" ", F.slice(F.col("__tok"), i + 1, k))).alias(
                    "gram_hash"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram_hash:bigint>>"))
    return (
        docs.select(F.col(id_col), tok.alias("__tok"))
        .select(id_col, F.explode(wins).alias("__w"))
        .select(id_col, F.col("__w.pos").alias("pos"), F.col("__w.gram_hash").alias("gram_hash"))
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (id_col, span_start, span_end, span_tokens): token offsets
    [span_start, span_end) of every maximal run of k-token windows
    whose gram appears in >= ``min_docs`` distinct documents.

    Plan shape at 100 TB: one explode scan, one aggregate + one
    co-partitioned equi-join on gram_hash, one per-document window.
    No all-pairs step anywhere — cost is linear in corpus tokens.

    The window frame feeds both the duplicated-gram aggregate and the
    join back, so it is persisted (the `_with_cached_deps` discipline
    — callers release via ``unpersist_deps`` after materializing);
    without it the tokenize+hash explode runs twice (~1.8× measured).
    """
    from pyspark import StorageLevel

    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    w = gram_windows(docs, id_col, text_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dup_grams = (
        w.groupBy("gram_hash")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("gram_hash")
    )
    marked = w.join(dup_grams, "gram_hash").select(id_col, "pos")

    order = Window.partitionBy(id_col).orderBy("pos")
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = marked.withColumn(
        "__new",
        F.when(
            F.lag("pos").over(order).isNull()
            | (F.col("pos") > F.lag("pos").over(order) + k),
            1,
        ).otherwise(0),
    ).withColumn("__island", F.sum("__new").over(run))

    result = (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("bigint")
            .alias("span_tokens"),
        )
    )
    return _with_cached_deps(result, [w])
