"""Batch text retrieval: BM25 ranking over the tokenized corpus.

The reference's output feeds an Elasticsearch index whose analyzer
(lowercase + asciifolding + shingles,
index-settings-and-mappings-necropolis.json:4-33) exists to serve
ranked search. This operator answers the same class of query
batch-side, Spark-first: classic Okapi BM25 with the engine's own
normalize/tokenize tier (so scores are reproducible in the ANSI-SQL
oracle).

Plan shape at 100 TB: the corpus explodes to (doc, term) ONCE and is
immediately filtered to the query's terms through a broadcast hash
join (query terms: tens of literals) — the surviving frame is tiny
(docs containing any query term × matched terms) and carries doc
length with it, so no join back to a corpus-wide lengths table is
ever needed. Document frequency and average doc length are
single-row/small broadcast aggregates. The only shuffle after the
term filter is the tiny per-(doc, term) tf aggregation; the final
top-k is a TakeOrdered merge, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.functions.text import normalize, tokens


def bm25_topk(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a free-text query under Okapi BM25.

    idf uses the standard Robertson–Sparck Jones form
    ln(1 + (N - df + 0.5)/(df + 0.5)); doc length is the token count
    under the engine tokenizer. Ties broken by id for determinism.
    """
    from batch_process_dpla_index_spark.operators.relational import (
        _arrow_local_frame,
    )

    q_terms = [t for t in query.lower().split() if t]
    q_df = _arrow_local_frame(
        docs.sparkSession,
        [(t,) for t in sorted(set(q_terms))],
        "term string",
    )

    # Doc length rides along through the explode so the scored frame
    # never joins back to a corpus-wide lengths table — after the
    # broadcast term filter, every surviving row already carries dl.
    # tokens(col) directly (NOT tokens(normalize(col))): tokens already
    # normalizes, the double pass cost a full-text regex scan, and the
    # engine tokenizer must be THE tokenizer everywhere — the oracle's
    # _DOC_TOK_CTE replays tokens(text), so a divergent path here would
    # shift dl/avgdl and every score with it.
    with_dl = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__tok")
    ).select("id", F.size("__tok").cast("double").alias("dl"), "__tok")
    # persist: with_dl feeds corpus_stats AND tf, tf feeds df_t AND the
    # scoring join — unpersisted, the corpus tokenize+explode lineage
    # executes once per consumer (tfidf_top_terms pays 1 for the same
    # shape; callers release via unpersist_deps)
    with_dl = with_dl.persist()
    corpus_stats = with_dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        with_dl.select("id", "dl", F.explode("__tok").alias("term"))
        .join(F.broadcast(q_df), "term")
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("id").alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(
        scored.groupBy("id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k),
        [with_dl, tf],
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the keyword/fingerprint
    extraction stage of corpus analysis (and the classic sparse
    retrieval weight, tf · ln(N/df)).

    Returns (id, term, tf, df, tfidf, rnk) for each document's top-k
    terms; ties rank by ROUNDED score then term (ascending), so two
    mathematically-equal scores reached through different (tf, df)
    pairs — e.g. 2·ln(N/5) vs 1·ln(N/25) when N=125 — order
    identically in every engine regardless of last-ulp float drift.

    Plan shape at 100 TB: one (doc, term) tf aggregate and one
    term-keyed df aggregate over it (both map-side combined; the df
    frame is vocabulary-sized and joins back under AQE's choice), a
    broadcast 1-row N, then a per-doc ranking window whose partitions
    are single documents' term lists. No Python anywhere.
    """
    # `tf` feeds BOTH the df aggregate and the scoring join; persist it
    # so the corpus explode+aggregate runs once (callers release via
    # unpersist_deps)
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .persist()
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = docs.agg(F.count("*").cast("bigint").alias("__n"))
    from pyspark.sql.window import Window

    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    from batch_process_dpla_index_spark.operators.dedup import _with_cached_deps

    result = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "term", "tf", "df", "tfidf", "rnk")
    )
    return _with_cached_deps(result, [tf])


def rank_candidates(df: DataFrame, score_col: str, id_col: str) -> DataFrame:
    """Add a dense 1-based ``rank`` to a BOUNDED candidate list.

    Contract: ``df`` is a retriever's top-k output (tens to hundreds
    of rows), NOT a corpus — the un-partitioned row_number window here
    is a single-partition sort over ≤k rows by construction, the same
    bounded-collect class as the query matrix in similarity.py.
    Ranking orders by the ROUNDED score (every retriever in this repo
    emits round(score, 6)) then id, so two engines reaching equal
    scores through different float paths rank identically.
    """
    from pyspark.sql.window import Window

    # bounded contract: callers pass ≤k candidate rows (the retriever
    # already cut off), so one partition is fine; one_bucket silences
    # the WindowExec warning without changing that (functions/windows.py)
    from batch_process_dpla_index_spark.functions.windows import one_bucket

    w = Window.partitionBy(one_bucket(F.col(id_col))).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    candidates: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k_const: int = 60,
    limit: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of retriever candidate lists (hybrid
    search: BM25 ∪ dense ANN is the canonical pair).

    score(d) = Σ_lists 1/(k_const + rank_list(d)) — the standard RRF
    with k=60 (Cormack/Clarke/Büttcher 2009). Rank-based, so the
    retrievers' incomparable score scales never need calibration.

    Scale shape: inputs are bounded top-k lists (see
    :func:`rank_candidates`), so the union + fused aggregate handle
    Σ|lists| ≈ hundreds of rows regardless of corpus size — the
    expensive part of hybrid search is the retrievers, which keep
    their own scale paths (broadcast-term BM25, ANN tiers). The fuse
    itself is one tiny hash aggregate + a TakeOrdered.

    Returns (id, rrf_score, n_lists) — n_lists = how many retrievers
    surfaced the doc (the agreement signal).
    """
    from functools import reduce

    parts = [
        c.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(rank_col).cast("long").alias("__rank"),
        )
        for c in candidates
    ]
    u = reduce(DataFrame.unionByName, parts)
    return (
        u.groupBy("id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k_const)) + F.col("__rank"))),
                6,
            ).alias("rrf_score"),
            F.count("*").cast("int").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col("id").asc())
        .limit(limit)
    )
