"""DuckDB oracle SQL — one ANSI-SQL equivalent per entry in queries.py.

The driver runs each Spark query AND its oracle on the same parquet
tables (pre-registered DuckDB views: region nation customer supplier
part orders lineitem events documents embeddings) and compares
row-count + schema + order-insensitive value hash. Column names and
types are aligned 1:1 with the Spark results.

The probabilistic-looking operators (MinHash-LSH, SimHash, hyperplane
LSH) are in fact fully deterministic — their hash seeds derive from
md5 via the engine-portable ``h60`` digest — so their oracles are
*generated* here from the same Python constants the Spark operators
use (permutation params, stopword lists, hyperplane components),
giving exact value-level verification of the whole pipeline, not just
row counts.

Float policy: every aggregate is rounded in BOTH engines (sums to 2
decimals, means/scores to 6); per-row float math (cosine, ratios) is
expressed as an identical strict left-to-right double fold in both
engines, so values are bit-identical before rounding.
"""

from __future__ import annotations

from batch_process_dpla_index_spark.functions.text import LANG_ORDER, STOPWORDS
from batch_process_dpla_index_spark.operators.dedup import _MERSENNE, _perm_params
from batch_process_dpla_index_spark.operators.similarity import _h60_py, _h60_unit

# --- shared SQL fragments --------------------------------------------------

#: normalized text: lowercase, trim, collapse whitespace (functions.text.normalize)
def _nrm(col: str) -> str:
    # collapse THEN trim (functions.text.normalize order): trim-first
    # left boundary tabs/newlines to become boundary spaces, and
    # string_split then grew empty tokens in both engines
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


#: whitespace tokens with the empty-string guard (functions.text.tokens)
def _tok(nrm: str) -> str:
    return f"CASE WHEN {nrm} = '' THEN []::VARCHAR[] ELSE string_split({nrm}, ' ') END"


#: the engine-portable 60-bit digest (functions.text.h60)
def _h60(col: str) -> str:
    return f"CAST(concat('0x', substring(md5({col}), 1, 15)) AS BIGINT)"


#: word n-gram shingles incl. short-doc and empty-doc conventions
def _shingles(tok: str, n: int) -> str:
    return f"""CASE
        WHEN len({tok}) = 0 THEN []::VARCHAR[]
        WHEN len({tok}) <= {n} THEN [array_to_string({tok}, ' ')]
        ELSE list_transform(range(0, len({tok}) - {n} + 1),
                            i -> array_to_string(({tok})[i+1:i+{n}], ' '))
    END"""


#: strict left-fold double dot product (functions.vectors.dot)
def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def _stop_hits(tok: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tok}, t -> list_contains([{words}], t)))"


_DOC_TOK_CTE = f"""doc_tok AS (
    SELECT doc_id, lang, source, n_chars, text, {_tok("nrm")} AS tok
    FROM (SELECT *, {_nrm("text")} AS nrm FROM documents)
)"""


# --- relational core -------------------------------------------------------

ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLE_TOP_ORDERS = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC
LIMIT 10
"""

ORACLE_REGION_REVENUE = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""

ORACLE_SEGMENT_WITH_F_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY c_mktsegment
"""

ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_nationkey, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""

ORACLE_BRAND_REVENUE = """
SELECT p_brand,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

ORACLE_PRIORITY_BY_MONTH = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY order_month, o_orderpriority
"""

ORACLE_SCALAR_SUITE = """
SELECT c_custkey,
       split_part(c_name, '#', -1) AS cust_num,
       CAST(length(c_name) AS BIGINT) AS name_len,
       substring(c_name, 1, 8) AS abbrev,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_tag,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_bucket,
       round(sqrt(abs(c_acctbal)), 6) AS bal_mag
FROM customer
"""

ORACLE_UNION_ENTITIES = """
SELECT kind, count(*) AS n_rows, min(entity_key) AS min_key, max(entity_key) AS max_key
FROM (
    SELECT c_custkey AS entity_key, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS kind FROM supplier
    UNION ALL
    SELECT p_partkey AS entity_key, 'part' AS kind FROM part
)
GROUP BY kind
"""

ORACLE_DISTINCT_PARTS_PER_FLAG = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""

ORACLE_ROLLUP_FLAGS = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# --- windows over events ---------------------------------------------------

ORACLE_LATEST_EVENTS_PER_USER = """
SELECT user_id, event_id, rn
FROM (
    SELECT user_id, event_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS INTEGER) AS rn
    FROM events
)
WHERE rn <= 3
"""

ORACLE_ROLLING_USER_VALUE = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS rolling_value,
       round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta_prev
FROM events
"""

ORACLE_HOURLY_EVENT_COUNTS = """
SELECT epoch_us(date_trunc('hour', ts)) AS win_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY win_start, event_type
"""

ORACLE_SLIDING_EVENT_COUNTS = """
SELECT epoch_us(ws) AS win_start, count(*) AS n_events
FROM (
    SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR, date_trunc('hour', ts)]) AS ws
    FROM events
)
GROUP BY ws
"""

# Session semantics: an event joins the previous session iff it is
# STRICTLY closer than the gap (Spark's session end bound is exclusive);
# session_end = last event + gap.
ORACLE_USER_SESSIONS = """
WITH ordered AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), marked AS (
    SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
    FROM ordered
), grouped AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS grp
    FROM marked
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start,
       epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM grouped
GROUP BY user_id, grp
"""

ORACLE_PROPS_BY_TYPE = """
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(avg(k), 6) AS avg_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
"""

# --- dedup / text ----------------------------------------------------------

ORACLE_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
"""

ORACLE_KEEP_FIRST = """
SELECT doc_id, source, lang, n_chars
FROM (
    SELECT doc_id, source, lang, n_chars,
           row_number() OVER (PARTITION BY source, lang ORDER BY n_chars, doc_id) AS rn
    FROM documents
)
WHERE rn = 1
"""

ORACLE_FINGERPRINT_CLUSTERS = f"""
WITH {_DOC_TOK_CTE}
SELECT md5(array_to_string(list_sort(list_distinct(tok)), ' ')) AS fp,
       count(*) AS n_docs,
       min(doc_id) AS first_doc
FROM doc_tok
GROUP BY fp
"""

# Independent implementation of the asciifolding tier: DuckDB's
# strip_accents (ICU diacritic removal) vs our translate() map — the
# two agree byte-for-byte on the folded subset (functions/text.py
# _FOLD_FROM), and ligatures/strokes pass through in both.
ORACLE_FINGERPRINT_FOLDED = f"""
WITH dec AS (
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 'Café Résumé '
             WHEN 1 THEN 'Cafe Resume '
             WHEN 2 THEN 'Naïve Façade '
             ELSE 'Naive Facade ' END || text AS dtext
    FROM documents
), f AS (
    SELECT doc_id,
           {_nrm("strip_accents(dtext)")} AS fnrm,
           {_nrm("dtext")} AS rnrm
    FROM dec
)
SELECT doc_id,
       substr(fnrm, 1, 80) AS folded_head,
       md5(array_to_string(list_sort(list_distinct({_tok("fnrm")})), ' ')) AS fp_folded,
       CAST(md5(array_to_string(list_sort(list_distinct({_tok("fnrm")})), ' '))
            <> md5(array_to_string(list_sort(list_distinct({_tok("rnrm")})), ' ')) AS INT)
           AS folding_changed
FROM f
"""

ORACLE_TEXT_STATS = f"""
WITH {_DOC_TOK_CTE}, m AS (
    SELECT doc_id,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS mtl,
           CASE WHEN length({_nrm("text")}) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace({_nrm("text")}, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                     / CAST(length({_nrm("text")}) AS DOUBLE)
           END AS pr,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST({_stop_hits("tok", "en")} AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS swr
    FROM doc_tok
)
SELECT doc_id,
       n_tokens,
       round(mtl, 6) AS mean_tok_len,
       round(pr, 6) AS punct_ratio,
       round(swr, 6) AS stopword_ratio,
       round(((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN swr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 6) AS quality
FROM m
"""


def _language_id_oracle() -> str:
    votes = ",\n           ".join(
        f"{_stop_hits('tok', lang)} AS v_{lang}" for lang in LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"v_{lang}" for lang in LANG_ORDER) + ")"
    cases = "\n            ".join(
        f"WHEN best > 0 AND v_{lang} = best THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"""
WITH {_DOC_TOK_CTE}, votes AS (
    SELECT lang,
           {votes}
    FROM doc_tok
), scored AS (
    SELECT lang, {best} AS best, * FROM votes
)
SELECT lang,
       CASE {cases}
            ELSE 'und' END AS lang_guess,
       count(*) AS n_docs
FROM scored
GROUP BY lang, lang_guess
"""


ORACLE_LANGUAGE_ID = _language_id_oracle()

ORACLE_ROLLING_HASH = f"""
WITH {_DOC_TOK_CTE}
SELECT doc_id,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT), list_transform(tok, t -> {_h60("t")} % 1000000007)),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
FROM doc_tok
"""

ORACLE_DOC_PRESENCE_SCORES = f"""
WITH {_DOC_TOK_CTE}, flagged AS (
    SELECT source,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0 ELSE 1 END AS has_text,
           CASE WHEN len(tok) >= 50 THEN 1 ELSE 0 END AS is_long,
           CASE WHEN text IS NOT NULL AND (text LIKE '%spark%' OR text LIKE '%query%' OR text LIKE '%data%')
                THEN 1 ELSE 0 END AS mentions_engine,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_english,
           1 AS cnt
    FROM doc_tok
)
SELECT source,
       round(avg(has_text), 6) AS has_text_score,
       round(avg(is_long), 6) AS is_long_score,
       round(avg(mentions_engine), 6) AS mentions_engine_score,
       round(avg(is_english), 6) AS is_english_score,
       CAST(sum(cnt) AS BIGINT) AS n_docs
FROM flagged
GROUP BY source
"""


def _jaccard_oracle(n: int = 3, threshold: float = 0.4, max_posting: int = 1000) -> str:
    # the hot-posting-list defuse is part of the operator's semantics
    # (dedup.py: shingles with doc frequency > max_posting are dropped
    # BEFORE the self-join), so the oracle must mirror it — identical
    # at small fixtures, required for parity once any shingle's df
    # exceeds the cap
    return f"""
WITH {_DOC_TOK_CTE}, sets AS (
    SELECT doc_id, list_distinct({_shingles("tok", n)}) AS sh
    FROM doc_tok
), all_posts AS (
    SELECT doc_id AS id, len(sh) AS sz, unnest(sh) AS shingle FROM sets
), posts AS (
    SELECT * FROM all_posts
    WHERE shingle NOT IN (
        SELECT shingle FROM all_posts GROUP BY shingle
        HAVING count(*) > {max_posting})
), inter AS (
    SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b, count(*) AS n_common
    FROM posts a JOIN posts b USING (shingle)
    WHERE a.id < b.id
    GROUP BY a.id, b.id, a.sz, b.sz
)
SELECT id_a, id_b,
       round(CAST(n_common AS DOUBLE) / CAST(sz_a + sz_b - n_common AS DOUBLE), 6) AS jaccard
FROM inter
WHERE CAST(n_common AS DOUBLE) / CAST(sz_a + sz_b - n_common AS DOUBLE) >= {threshold}
"""


ORACLE_JACCARD_PAIRS = _jaccard_oracle(3, 0.4)


def _minhash_oracle(
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
) -> str:
    rows = num_perm // bands
    perms = _perm_params(num_perm)
    sig_terms = ", ".join(
        f"list_min(list_transform(base, h -> ({a} * h + {b}) % {_MERSENNE}))"
        for a, b in perms
    )
    band_rows = ",\n        ".join(
        f"({i}, md5(array_to_string(sig[{i * rows + 1}:{i * rows + rows}], ',')))"
        for i in range(bands)
    )
    return f"""
WITH {_DOC_TOK_CTE}, sets AS (
    SELECT doc_id AS id, list_distinct({_shingles("tok", n)}) AS sh
    FROM doc_tok
), sigs AS (
    SELECT id, sh, [{sig_terms}] AS sig
    FROM (SELECT id, sh, list_transform(sh, s -> {_h60("s")} % {_MERSENNE}) AS base FROM sets)
), buckets AS (
    SELECT id, band, key
    FROM sigs, LATERAL (VALUES
        {band_rows}
    ) AS b(band, key)
), ok_buckets AS (
    SELECT band, key FROM buckets GROUP BY band, key HAVING count(*) <= {max_bucket}
), pruned AS (
    SELECT b.* FROM buckets b JOIN ok_buckets USING (band, key)
), cand AS (
    SELECT DISTINCT x.id AS id_a, y.id AS id_b
    FROM pruned x JOIN pruned y USING (band, key)
    WHERE x.id < y.id
)
SELECT id_a, id_b,
       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6) AS jaccard
FROM cand
JOIN sets sa ON sa.id = id_a
JOIN sets sb ON sb.id = id_b
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= {threshold}
"""


ORACLE_MINHASH_LSH_PAIRS = _minhash_oracle()


def _fuzzy_decontaminate_oracle(
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
) -> str:
    """Banding replay of fuzzy_decontaminate: same shingle/h60/affine/
    band geometry as _minhash_oracle, corpus (doc_id % 10 != 0) banded
    against benchmark (doc_id % 10 = 0), max_bucket pruning on CORPUS
    buckets only, exact-Jaccard verification."""
    rows = num_perm // bands
    perms = _perm_params(num_perm)
    sig_terms = ", ".join(
        f"list_min(list_transform(base, h -> ({a} * h + {b}) % {_MERSENNE}))"
        for a, b in perms
    )
    band_rows = ",\n        ".join(
        f"({i}, md5(array_to_string(sig[{i * rows + 1}:{i * rows + rows}], ',')))"
        for i in range(bands)
    )
    return f"""
WITH {_DOC_TOK_CTE}, sets AS (
    SELECT * FROM (
        SELECT doc_id AS id, doc_id % 10 = 0 AS is_bench,
               list_distinct({_shingles("tok", n)}) AS sh
        FROM doc_tok
    ) WHERE len(sh) > 0
), sigs AS (
    SELECT id, is_bench, sh, [{sig_terms}] AS sig
    FROM (SELECT id, is_bench, sh, list_transform(sh, s -> {_h60("s")} % {_MERSENNE}) AS base FROM sets)
), buckets AS (
    SELECT id, is_bench, band, key
    FROM sigs, LATERAL (VALUES
        {band_rows}
    ) AS b(band, key)
), ok_buckets AS (
    SELECT band, key FROM buckets WHERE NOT is_bench
    GROUP BY band, key HAVING count(*) <= {max_bucket}
), cpr AS (
    SELECT b.id, b.band, b.key FROM buckets b
    JOIN ok_buckets USING (band, key) WHERE NOT b.is_bench
), cand AS (
    SELECT DISTINCT c.id AS id, b.id AS bid
    FROM cpr c
    JOIN (SELECT id, band, key FROM buckets WHERE is_bench) b
      USING (band, key)
)
SELECT cand.id AS doc_id, cand.bid AS bench_id,
       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6) AS jaccard
FROM cand
JOIN sets sa ON sa.id = cand.id
JOIN sets sb ON sb.id = cand.bid
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= {threshold}
ORDER BY doc_id, bench_id
"""


ORACLE_FUZZY_DECONTAMINATE = _fuzzy_decontaminate_oracle()


def _incremental_dedup_oracle(
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
) -> str:
    rows = num_perm // bands
    perms = _perm_params(num_perm)
    sig_terms = ", ".join(
        f"list_min(list_transform(base, h -> ({a} * h + {b}) % {_MERSENNE}))"
        for a, b in perms
    )
    band_rows = ",\n        ".join(
        f"({i}, md5(array_to_string(sig[{i * rows + 1}:{i * rows + rows}], ',')))"
        for i in range(bands)
    )
    return f"""
WITH {_DOC_TOK_CTE}, sets AS (
    SELECT doc_id AS id, doc_id % 10 = 7 AS is_new, list_distinct({_shingles("tok", n)}) AS sh
    FROM doc_tok
), sigs AS (
    SELECT id, is_new, sh, [{sig_terms}] AS sig
    FROM (SELECT id, is_new, sh, list_transform(sh, s -> {_h60("s")} % {_MERSENNE}) AS base FROM sets)
), buckets AS (
    SELECT id, is_new, band, key
    FROM sigs, LATERAL (VALUES
        {band_rows}
    ) AS b(band, key)
), ok_corp AS (
    SELECT band, key FROM buckets WHERE NOT is_new
    GROUP BY band, key HAVING count(*) <= {max_bucket}
), corp_pruned AS (
    SELECT b.* FROM buckets b JOIN ok_corp USING (band, key) WHERE NOT b.is_new
), cand AS (
    SELECT DISTINCT x.id AS new_id, y.id AS dup_of
    FROM (SELECT * FROM buckets WHERE is_new) x
    JOIN corp_pruned y USING (band, key)
), scored AS (
    SELECT new_id, dup_of,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS j
    FROM cand
    JOIN sets sa ON sa.id = new_id
    JOIN sets sb ON sb.id = dup_of
)
SELECT new_id, dup_of, round(j, 6) AS jaccard
FROM (
    SELECT *, row_number() OVER (PARTITION BY new_id ORDER BY j DESC, dup_of ASC) AS rn
    FROM scored WHERE j >= {threshold}
)
WHERE rn = 1
"""


ORACLE_INCREMENTAL_DEDUP = _incremental_dedup_oracle()


def _bm25_oracle(query: str, k: int = 20, k1: float = 1.2, b: float = 0.75) -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(query.lower().split())))
    return f"""
WITH {_DOC_TOK_CTE}, lengths AS (
    SELECT doc_id AS id, CAST(len(tok) AS DOUBLE) AS dl FROM doc_tok
), stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lengths
), tf AS (
    SELECT doc_id AS id, term, CAST(count(*) AS DOUBLE) AS tf
    FROM (SELECT doc_id, unnest(tok) AS term FROM doc_tok)
    WHERE term IN ({terms})
    GROUP BY doc_id, term
), dft AS (
    SELECT term, CAST(count(DISTINCT id) AS DOUBLE) AS df FROM tf GROUP BY term
)
SELECT id AS doc_id,
       round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * {k1 + 1.0}) / (tf + {k1} * ({1.0 - b} + {b} * dl / avgdl))), 6) AS score
FROM tf
JOIN dft USING (term)
JOIN lengths USING (id)
CROSS JOIN stats
GROUP BY id
ORDER BY score DESC, id ASC
LIMIT {k}
"""


ORACLE_BM25_SEARCH = _bm25_oracle("spark query join fast")


def _rrf_oracle(
    query: str,
    q_vec_id: int = 7,
    n_cand: int = 50,
    k_const: int = 60,
    limit: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """RRF twin of queries.q_rrf_fusion: the BM25 CTE stack (top
    n_cand, ranked on the ROUNDED score like the engine), the dense
    cosine top-n_cand around the pinned query embedding, then
    1/(k+rank) summed per doc."""
    terms = ", ".join(f"'{t}'" for t in sorted(set(query.lower().split())))
    return f"""
WITH {_DOC_TOK_CTE}, lengths AS (
    SELECT doc_id AS id, CAST(len(tok) AS DOUBLE) AS dl FROM doc_tok
), stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lengths
), tf AS (
    SELECT doc_id AS id, term, CAST(count(*) AS DOUBLE) AS tf
    FROM (SELECT doc_id, unnest(tok) AS term FROM doc_tok)
    WHERE term IN ({terms})
    GROUP BY doc_id, term
), dft AS (
    SELECT term, CAST(count(DISTINCT id) AS DOUBLE) AS df FROM tf GROUP BY term
), bm25 AS (
    SELECT id,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * (tf * {k1 + 1.0}) / (tf + {k1} * ({1.0 - b} + {b} * dl / avgdl))), 6) AS score
    FROM tf
    JOIN dft USING (term)
    JOIN lengths USING (id)
    CROSS JOIN stats
    GROUP BY id
    ORDER BY score DESC, id ASC
    LIMIT {n_cand}
), sparse_ranked AS (
    SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS rnk FROM bm25
), e AS (
    SELECT vec_id, embedding, sqrt({_dot("embedding", "embedding")}) AS nrm
    FROM embeddings
), dense AS (
    SELECT c.vec_id AS id,
           round(CASE WHEN q.nrm * c.nrm = 0 THEN NULL
                      ELSE {_dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
                 END, 6) AS score
    FROM e c JOIN e q ON q.vec_id = {q_vec_id} AND c.vec_id <> {q_vec_id}
    ORDER BY score DESC NULLS LAST, id ASC
    LIMIT {n_cand}
), dense_ranked AS (
    SELECT id, row_number() OVER (ORDER BY score DESC NULLS LAST, id ASC) AS rnk FROM dense
), fused AS (
    SELECT id, round(sum(CAST(1.0 AS DOUBLE) / ({k_const} + rnk)), 6) AS rrf_score,
           CAST(count(*) AS INTEGER) AS n_lists
    FROM (SELECT * FROM sparse_ranked UNION ALL SELECT * FROM dense_ranked)
    GROUP BY id
)
SELECT id AS doc_id, rrf_score, n_lists
FROM fused
ORDER BY rrf_score DESC, id ASC
LIMIT {limit}
"""


ORACLE_RRF_FUSION = _rrf_oracle("spark query join fast")


def _boilerplate_oracle(w: int = 8, min_docs: int = 2) -> str:
    return f"""
WITH {_DOC_TOK_CTE}, c AS (
    SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS n
    FROM doc_tok WHERE len(tok) > 0
), segs AS (
    SELECT doc_id, array_to_string(tok[i*{w}+1 : i*{w}+{w}], ' ') AS seg
    FROM c, UNNEST(range((n + {w - 1}) // {w})) AS t(i)
), bp AS (
    SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= {min_docs}
)
SELECT s.doc_id,
       count(*) AS n_segments,
       count(b.seg) AS n_boilerplate,
       round(count(b.seg) * 1.0 / count(*), 6) AS boilerplate_ratio
FROM segs s LEFT JOIN bp b ON s.seg = b.seg
GROUP BY s.doc_id
"""


ORACLE_BOILERPLATE_STATS = _boilerplate_oracle()


ORACLE_EVENT_RANK_SUITE = """
SELECT event_id, user_id,
       dense_rank() OVER w AS value_dense_rank,
       round(percent_rank() OVER w, 6) AS value_pct_rank,
       ntile(4) OVER w AS value_quartile,
       round(lead(value, 1) OVER w, 6) AS next_lower_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
"""


def _simhash_oracle(bits: int = 60, max_hamming: int = 3) -> str:
    nbands = max_hamming + 1
    width = bits // nbands
    bit_terms = "\n         + ".join(
        f"(CASE WHEN 2 * len(list_filter(hashed, h -> (h >> {j}) & 1 = 1)) >= len(hashed) "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    band_rows = ",\n        ".join(
        f"({i}, (sh >> {i * width}) & {(1 << width) - 1})" for i in range(nbands)
    )
    return f"""
WITH {_DOC_TOK_CTE}, hashed AS (
    SELECT doc_id AS id, list_transform(tok, t -> {_h60("t")}) AS hashed
    FROM doc_tok
), sims AS (
    SELECT id, {bit_terms} AS sh
    FROM hashed
), exploded AS (
    SELECT id, sh, band, val
    FROM sims, LATERAL (VALUES
        {band_rows}
    ) AS b(band, val)
), cand AS (
    SELECT DISTINCT x.id AS id_a, x.sh AS sh_a, y.id AS id_b, y.sh AS sh_b
    FROM exploded x JOIN exploded y USING (band, val)
    WHERE x.id < y.id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


ORACLE_SIMHASH_PAIRS = _simhash_oracle()

# --- similarity ------------------------------------------------------------

ORACLE_COSINE_TOPK = f"""
WITH e AS (
    SELECT vec_id, embedding, sqrt({_dot("embedding", "embedding")}) AS nrm
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CASE WHEN q.nrm * c.nrm = 0 THEN NULL
                ELSE {_dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) END AS score
    FROM e q JOIN e c ON q.vec_id < 25 AND q.vec_id <> c.vec_id
), ranked AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC NULLS LAST, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(score, 6) AS score, CAST(rnk AS INTEGER) AS rank
FROM ranked
WHERE rnk <= 5
"""


def _lsh_ann_oracle(
    dim: int = 64, k: int = 5, n_planes: int = 8, n_tables: int = 4
) -> str:
    def plane_sql(t: int, j: int) -> str:
        comps = ", ".join(
            repr(_h60_unit(f"hp:{t}:{j}:{d}"))
            for d in range(dim)
        )
        return f"[{comps}]"

    bucket_selects = []
    for t in range(n_tables):
        terms = " + ".join(
            f"(CASE WHEN {_dot('embedding', plane_sql(t, j))} >= 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j in range(n_planes)
        )
        bucket_selects.append(
            f"SELECT vec_id AS id, {t} AS tbl, {terms} AS bucket FROM embeddings"
        )
    buckets = "\n    UNION ALL\n    ".join(bucket_selects)
    return f"""
WITH buckets AS (
    {buckets}
), cand AS (
    SELECT DISTINCT x.id AS query_id, y.id AS neighbor_id
    FROM buckets x JOIN buckets y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.id <> y.id
), e AS (
    SELECT vec_id, embedding, sqrt({_dot("embedding", "embedding")}) AS nrm
    FROM embeddings
), scored AS (
    SELECT cand.query_id, cand.neighbor_id,
           CASE WHEN q.nrm * c.nrm = 0 THEN NULL
                ELSE {_dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) END AS score
    FROM cand
    JOIN e q ON q.vec_id = cand.query_id
    JOIN e c ON c.vec_id = cand.neighbor_id
), ranked AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC NULLS LAST, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(score, 6) AS score, CAST(rnk AS INTEGER) AS rank
FROM ranked
WHERE rnk <= {k}
"""


ORACLE_LSH_ANN_TOPK = _lsh_ann_oracle()


# --- DPLA nested-pipeline parity (closed-form from model/fixtures.py) ------

#: rights URI by doc_id % 7 (fixtures.rights_uri)
_RIGHTS_CASE = """CASE doc_id % 7
    WHEN 1 THEN 'http://rightsstatements.org/vocab/NoC-US/1.0/'
    WHEN 2 THEN 'http://creativecommons.org/publicdomain/zero/1.0/'
    WHEN 3 THEN 'http://creativecommons.org/licenses/by/4.0/'
    WHEN 4 THEN 'http://creativecommons.org/licenses/by-sa/4.0/'
    WHEN 5 THEN 'http://rightsstatements.org/vocab/InC/1.0/'
    WHEN 6 THEN 'http://rightsstatements.org/vocab/InC/1.0/'
    ELSE NULL END"""

#: the 16 MQ flags, in closed form from the fixture modulo rules
_MQ_FLAGS = f"""
    CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS title,
    CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END AS description,
    CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS creator,
    CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS "type",
    CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS "language",
    CASE WHEN doc_id % 6 = 0 THEN 0 ELSE 1 END AS spatial,
    CASE WHEN doc_id % 8 = 0 THEN 0 ELSE 1 END AS subject,
    CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 1 END AS collection,
    CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 1 END AS "date",
    CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS standardizedRights,
    CASE WHEN doc_id % 7 IN (1, 2, 3, 4) THEN 1 ELSE 0 END AS openRights,
    -- preview: the flatten reshape rebuilds `object` as struct(...) over a
    -- possibly-NULL input, and Spark's struct of null fields is NON-null
    -- (the reference's Scala edmWebResource at ParquetDump.scala:106-113
    -- behaves identically), so MQ's "object is null" never fires
    -- post-flatten. Faithful parity: flag is constant 1.
    1 AS preview,
    CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS iiifManifest,
    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS mediaMaster,
    CASE WHEN doc_id % 3 = 0 AND doc_id % 4 <> 0 THEN 0 ELSE 1 END AS mediaAccess
"""

_MQ_SCORE_SELECT = """
       round(avg(title), 6) AS title,
       round(avg(description), 6) AS description,
       round(avg(creator), 6) AS creator,
       round(avg("type"), 6) AS "type",
       round(avg("language"), 6) AS "language",
       round(avg(spatial), 6) AS spatial,
       round(avg(subject), 6) AS subject,
       round(avg(collection), 6) AS collection,
       round(avg("date"), 6) AS "date",
       round(avg(standardizedRights), 6) AS standardizedRights,
       round(avg(preview), 6) AS preview,
       round(avg(iiifManifest), 6) AS iiifManifest,
       round(avg(mediaMaster), 6) AS mediaMaster,
       round(avg(mediaAccess), 6) AS mediaAccess,
       round(avg(openRights), 6) AS openRights,
       round(avg(wikimediaReady), 6) AS wikimediaReady,
       CAST(count(*) AS BIGINT) AS count
"""

_MQ_FLAGGED_CTE = f"""flagged AS (
    SELECT source AS provider,
           source || '-dp' || CAST(doc_id % 3 AS VARCHAR) AS dataProvider,
           {_MQ_FLAGS}
    FROM documents
), ready AS (
    SELECT *, CASE WHEN mediaAccess = 1 AND openRights = 1 THEN 1 ELSE 0 END AS wikimediaReady
    FROM flagged
)"""

ORACLE_MQ_PROVIDER_SCORES = f"""
WITH {_MQ_FLAGGED_CTE}
SELECT provider, {_MQ_SCORE_SELECT}
FROM ready GROUP BY provider
"""

ORACLE_MQ_CONTRIBUTOR_SCORES = f"""
WITH {_MQ_FLAGGED_CTE}
SELECT dataProvider, provider, {_MQ_SCORE_SELECT}
FROM ready GROUP BY dataProvider, provider
"""


def _flat_leaves_oracle(repaired: bool) -> str:
    """Expected flat leaves. repaired=True models the typed nulls the
    SchemaRepair path injects (isReferencedBy, collection.isShownAt,
    place.exactMatch)."""
    place0 = (
        "NULL" if repaired
        else "CASE WHEN doc_id % 6 = 0 THEN NULL ELSE 'city' || CAST(doc_id % 10 AS VARCHAR) END"
    )
    coll0 = (
        "NULL" if repaired
        else "CASE WHEN doc_id % 9 = 0 THEN NULL ELSE 'http://coll/coll' || CAST(doc_id % 4 AS VARCHAR) END"
    )
    hasview0 = (
        "NULL" if repaired
        else ("CASE WHEN doc_id % 2 = 0 THEN NULL "
              "ELSE 'http://example.org/item/' || CAST(doc_id AS VARCHAR) || '#ref' END")
    )
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS id,
       'http://dp.la/api/items/' || CAST(doc_id AS VARCHAR) AS uri,
       {_RIGHTS_CASE} AS rights,
       source AS provider_name,
       'http://dp.la/agent/' || source AS provider_uri,
       source || '-dp' || CAST(doc_id % 3 AS VARCHAR) AS dataprovider_name,
       CASE WHEN doc_id % 3 = 0 THEN NULL
            ELSE 'http://iiif.io/m/' || CAST(doc_id AS VARCHAR) END AS iiif,
       CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS INTEGER) AS n_title,
       CASE WHEN doc_id % 5 = 0 THEN NULL ELSE substring(text, 1, 20) END AS title0,
       CASE WHEN doc_id % 3 = 0 THEN NULL
            ELSE 'http://dp.la/agent/creator' || CAST(doc_id % 7 AS VARCHAR) END AS creator0_uri,
       CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang0,
       {place0} AS place0_exact,
       {coll0} AS coll0_shownat,
       'rel-' || CAST(doc_id % 6 AS VARCHAR) AS rel0,
       CASE WHEN doc_id % 4 = 0 THEN 'text/html' ELSE NULL END AS media0_format,
       {hasview0} AS hasview0_ref,
       -- struct() over a NULL input yields a non-null all-null-fields
       -- struct in Spark (see the preview-flag note above): never missing.
       0 AS object_missing
FROM documents
"""


ORACLE_FLATTEN_ITEMS = _flat_leaves_oracle(repaired=False)
ORACLE_REPAIR_FLATTEN = _flat_leaves_oracle(repaired=True)

ORACLE_SCHEMA_ALIGN = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_lang,
       CAST(0 AS BIGINT) AS n_source,
       CAST(0 AS BIGINT) AS n_quality,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
"""

ORACLE_SITEMAP_URLS = f"""
WITH n AS (SELECT CAST(ceil(count(*) / 100.0) AS BIGINT) AS n FROM documents)
SELECT CAST(doc_id AS VARCHAR) AS id,
       'https://dp.la/item/' || CAST(doc_id AS VARCHAR) AS url,
       CAST({_h60("CAST(doc_id AS VARCHAR)")} % n.n AS INTEGER) AS part
FROM documents, n
"""

# --- multimodal binary columns ---------------------------------------------

_BLOB_CTE = r"""b AS (
    SELECT doc_id,
           CASE doc_id % 4
               WHEN 0 THEN '\x89PNG'::BLOB
               WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
               WHEN 2 THEN 'GIF8'::BLOB
               ELSE ''::BLOB
           END || encode(coalesce(text, '')) AS blob
    FROM documents
)"""

ORACLE_MULTIMODAL_META = f"""
WITH {_BLOB_CTE}
SELECT doc_id,
       CAST(octet_length(blob) AS BIGINT) AS byte_len,
       upper(substring(hex(blob), 1, 8)) AS magic,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
            WHEN 2 THEN 'gif' ELSE 'unknown' END AS kind
FROM b
"""

ORACLE_MULTIMODAL_DECODE = f"""
WITH {_BLOB_CTE}
SELECT doc_id,
       CAST(64 + octet_length(blob) % 512 AS INTEGER) AS width,
       CAST(64 + (7 * octet_length(blob)) % 512 AS INTEGER) AS height,
       CAST((64 + octet_length(blob) % 512)
            * (64 + (7 * octet_length(blob)) % 512) AS BIGINT) AS n_pixels
FROM b
"""

# Aspect-preserving resize replay: fake dims are closed-form in the
# byte length, then IEEE double division + floor — bit-deterministic
# cross-engine for integer operands; the emitted scale is round-6 per
# the scalar convention
ORACLE_MULTIMODAL_RESIZE = f"""
WITH {_BLOB_CTE}, dims AS (
    SELECT doc_id,
           64 + octet_length(blob) % 512 AS sw,
           64 + (7 * octet_length(blob)) % 512 AS sh
    FROM b
), scaled AS (
    SELECT doc_id, sw, sh,
           least(224.0 / sw, 224.0 / sh) AS scale
    FROM dims
)
SELECT doc_id,
       CAST(sw AS INTEGER) AS src_width,
       CAST(sh AS INTEGER) AS src_height,
       CAST(floor(sw * scale) AS INTEGER) AS width,
       CAST(floor(sh * scale) AS INTEGER) AS height,
       round(scale, 6) AS scale
FROM scaled
"""

def _image_near_dup_oracle(bits: int = 60, max_hamming: int = 3) -> str:
    """Perceptual near-dup replay: the codec-free blockhash contract
    (multimodal._fake_phash — byte i → block floor(i*bits/n), bit k set
    iff block_sum*n > total*block_count, ALL integer arithmetic) then
    the same pigeonhole banding as the simhash oracle. Byte values come
    off hex(blob) via nibble lookups — ANSI-portable, no blob
    subscripting."""
    nbands = max_hamming + 1
    width = bits // nbands
    band_rows = ",\n        ".join(
        f"({i}, (ph >> {i * width}) & {(1 << width) - 1})" for i in range(nbands)
    )
    nib = "strpos('0123456789ABCDEF', substr(h, CAST(2 * i + {off} AS INTEGER), 1)) - 1"
    return rf"""
WITH {_BLOB_CTE}, v AS (
    SELECT doc_id + 1000000000 AS doc_id,
           '\xFF\xD8\xFF\xE0'::BLOB || encode(coalesce(text, '')) AS blob
    FROM documents WHERE doc_id % 5 = 0
), corpus AS (
    SELECT doc_id, blob FROM b UNION ALL SELECT doc_id, blob FROM v
), hx AS (
    SELECT doc_id, octet_length(blob) AS n, upper(hex(blob)) AS h FROM corpus
), per AS (
    SELECT doc_id, n,
           (i * {bits}) // n AS blk,
           CAST(16 * ({nib.format(off=1)})
              + ({nib.format(off=2)}) AS BIGINT) AS v
    FROM hx, UNNEST(range(n)) AS t(i)
), blocks AS (
    SELECT doc_id, n, blk, sum(v) AS bsum, count(*) AS bcnt
    FROM per GROUP BY doc_id, n, blk
), tot AS (
    SELECT doc_id, sum(bsum) AS total FROM blocks GROUP BY doc_id
), sig0 AS (
    SELECT bl.doc_id,
           CAST(sum(CASE WHEN bl.bsum * bl.n > t.total * bl.bcnt
                         THEN CAST(1 AS BIGINT) << CAST(bl.blk AS INTEGER)
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
    FROM blocks bl JOIN tot t USING (doc_id)
    GROUP BY bl.doc_id
), sims AS (
    SELECT corpus.doc_id AS id, CAST(coalesce(s.ph, 0) AS BIGINT) AS ph
    FROM corpus LEFT JOIN sig0 s USING (doc_id)
), exploded AS (
    SELECT id, ph, band, val
    FROM sims, LATERAL (VALUES
        {band_rows}
    ) AS bb(band, val)
), cand AS (
    SELECT DISTINCT x.id AS id_a, x.ph AS ph_a, y.id AS id_b, y.ph AS ph_b
    FROM exploded x JOIN exploded y USING (band, val)
    WHERE x.id < y.id
)
SELECT id_a, id_b, CAST(bit_count(xor(ph_a, ph_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(ph_a, ph_b)) <= {max_hamming}
"""


ORACLE_IMAGE_NEAR_DUP = _image_near_dup_oracle()

def _video_near_dup_oracle(
    frame_size: int = 64,
    bits: int = 60,
    min_shared: int = 2,
    max_postings: int = 64,
) -> str:
    """Frame-fingerprint near-dup replay (multimodal.video_near_dup,
    stride=1): per full frame_size-byte window, the blockhash contract
    with constant window length (blk = (j*bits)//frame_size over the
    within-frame offset j) — then distinct (id, ph), the posting cap,
    and the shared-frame pair count. Same nibble-lookup byte decode as
    the image oracle."""
    nib = "strpos('0123456789ABCDEF', substr(h, CAST(2 * i + {off} AS INTEGER), 1)) - 1"
    return rf"""
WITH {_BLOB_CTE}, v AS (
    SELECT doc_id + 1000000000 AS doc_id,
           '\xFF\xD8\xFF\xE0'::BLOB || encode(coalesce(text, '')) AS blob
    FROM documents WHERE doc_id % 5 = 0
), corpus AS (
    SELECT doc_id, blob FROM b UNION ALL SELECT doc_id, blob FROM v
), hx AS (
    SELECT doc_id, octet_length(blob) AS n, upper(hex(blob)) AS h FROM corpus
), per AS (
    SELECT doc_id,
           i // {frame_size} AS frame,
           ((i % {frame_size}) * {bits}) // {frame_size} AS blk,
           CAST(16 * ({nib.format(off=1)})
              + ({nib.format(off=2)}) AS BIGINT) AS v
    FROM hx, UNNEST(range((n // {frame_size}) * {frame_size})) AS t(i)
), blocks AS (
    SELECT doc_id, frame, blk, sum(v) AS bsum, count(*) AS bcnt
    FROM per GROUP BY doc_id, frame, blk
), tot AS (
    SELECT doc_id, frame, sum(bsum) AS total FROM blocks GROUP BY doc_id, frame
), sig AS (
    SELECT bl.doc_id, bl.frame,
           CAST(sum(CASE WHEN bl.bsum * {frame_size} > t.total * bl.bcnt
                         THEN CAST(1 AS BIGINT) << CAST(bl.blk AS INTEGER)
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
    FROM blocks bl JOIN tot t USING (doc_id, frame)
    GROUP BY bl.doc_id, bl.frame
), uniq AS (
    SELECT DISTINCT doc_id AS id, ph FROM sig
), keep AS (
    SELECT ph FROM uniq GROUP BY ph HAVING count(*) <= {max_postings}
), s AS (
    SELECT id, ph FROM uniq JOIN keep USING (ph)
)
SELECT x.id AS id_a, y.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM s x JOIN s y USING (ph)
WHERE x.id < y.id
GROUP BY x.id, y.id
HAVING count(*) >= {min_shared}
"""


ORACLE_VIDEO_NEAR_DUP = _video_near_dup_oracle()


def _survivors_oracle(pairs_sql: str, corpus_ids_sql: str) -> str:
    """Survivors replay shared by the three perceptual modalities
    (image/audio/video): pair chain → undirected edges → recursive
    transitive closure → min-label clusters → keep representatives +
    unpaired ids. ONE definition of the scaffolding (round-14 review:
    three hand-copies could drift). ``corpus_ids_sql`` must enumerate
    exactly the ids the pairs CTE's corpus holds — the pair oracles
    build their corpora internally, so the id rule is stated twice by
    construction; keep the two in sync when a twin condition changes."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS MATERIALIZED (
    -- MATERIALIZED: reach references edges per recursion round; an
    -- inlined edges would re-run the whole signature chain each round
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
),
clusters AS (
    SELECT node, min(lab) AS cluster FROM reach GROUP BY node
),
corpus_ids AS ({corpus_ids_sql})
SELECT c.doc_id
FROM corpus_ids c LEFT JOIN clusters cl ON cl.node = c.doc_id
WHERE cl.node IS NULL OR cl.node = cl.cluster
"""


_IMAGE_CORPUS_IDS = """
    SELECT doc_id FROM documents
    UNION ALL
    SELECT doc_id + 1000000000 AS doc_id FROM documents WHERE doc_id % 5 = 0
"""

_AUDIO_CORPUS_IDS = """
    SELECT doc_id FROM documents
    UNION ALL
    SELECT doc_id + 1000000000 AS doc_id FROM documents
    WHERE doc_id % 5 = 0
      AND octet_length(encode(coalesce(text, ''))) % 2 = 0
"""


# Full video-dedup pipeline (queries.q_video_dedup_survivors):
# shot-fingerprint pairs through the shared survivors scaffolding
# (corpus = base docs + the re-containered jpg variants).
ORACLE_VIDEO_DEDUP_SURVIVORS = _survivors_oracle(
    _video_near_dup_oracle(), _IMAGE_CORPUS_IDS
)



def _audio_pcm_oracle() -> str:
    """Waveform-stats replay (multimodal.audio_pcm_stats): signed LE
    int16 samples reconstructed from nibble pairs (u = lo + 256*hi,
    sign-extend at 32768), trailing odd byte ignored; peak /
    zero-crossings integer-exact, RMS = round(sqrt(exact-int64
    sum-of-squares as DOUBLE / n), 6) — one IEEE division + sqrt on
    both engines."""
    nib = "strpos('0123456789ABCDEF', substr(h, CAST(2 * i + {off} AS INTEGER), 1)) - 1"
    return f"""
WITH {_BLOB_CTE}, hx AS (
    SELECT doc_id, octet_length(blob) AS n, upper(hex(blob)) AS h FROM b
), bytes AS (
    SELECT doc_id, i,
           CAST(16 * ({nib.format(off=1)})
              + ({nib.format(off=2)}) AS BIGINT) AS v
    FROM hx, UNNEST(range(2 * (n // 2))) AS t(i)
), samp0 AS (
    SELECT doc_id, i // 2 AS j,
           sum(CASE WHEN i % 2 = 0 THEN v ELSE 256 * v END) AS u
    FROM bytes GROUP BY doc_id, i // 2
), samp AS (
    SELECT doc_id, j, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
    FROM samp0
), lagged AS (
    SELECT doc_id, s,
           lag(s) OVER (PARTITION BY doc_id ORDER BY j) AS prev
    FROM samp
), agg AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(max(abs(s)) AS INTEGER) AS peak,
           CAST(count(CASE WHEN prev IS NOT NULL
                           AND ((s >= 0) <> (prev >= 0)) THEN 1 END)
                AS BIGINT) AS zero_crossings,
           round(sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)), 6) AS rms
    FROM lagged GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(coalesce(a.n_samples, 0) AS BIGINT) AS n_samples,
       CAST(coalesce(a.peak, 0) AS INTEGER) AS peak,
       CAST(coalesce(a.zero_crossings, 0) AS BIGINT) AS zero_crossings,
       coalesce(a.rms, 0.0) AS rms
FROM b LEFT JOIN agg a USING (doc_id)
"""


ORACLE_AUDIO_PCM_STATS = _audio_pcm_oracle()


def _audio_near_dup_oracle(bits: int = 60, max_hamming: int = 3) -> str:
    """Audio energy-envelope near-dup replay (multimodal.audio_phash →
    audio_near_dup): signed LE int16 decode (the audio_pcm_stats nibble
    arithmetic, trailing odd byte ignored), blockhash over ABSOLUTE
    amplitudes with blk = (j*bits)//n_samples, then BRUTE-FORCE
    all-pairs Hamming — deliberately NOT the banded prefilter, so a
    hash-match against the engine's banded plan directly proves the
    pigeonhole banding lossless on this corpus. Twins: even-length
    clips with doc_id%5==0 reappear under id+1e9 with one trailing pad
    byte (identical samples → hamming 0)."""
    nib = "strpos('0123456789ABCDEF', substr(h, CAST(2 * i + {off} AS INTEGER), 1)) - 1"
    return rf"""
WITH base AS (
    SELECT doc_id, encode(coalesce(text, '')) AS blob FROM documents
), twins AS (
    SELECT doc_id + 1000000000 AS doc_id, blob || '\x00'::BLOB AS blob
    FROM base WHERE doc_id % 5 = 0 AND octet_length(blob) % 2 = 0
), corpus AS (
    SELECT doc_id, blob FROM base UNION ALL SELECT doc_id, blob FROM twins
), hx AS (
    SELECT doc_id, octet_length(blob) AS nb, upper(hex(blob)) AS h FROM corpus
), bytes AS (
    SELECT doc_id, i,
           CAST(16 * ({nib.format(off=1)})
              + ({nib.format(off=2)}) AS BIGINT) AS v
    FROM hx, UNNEST(range(2 * (nb // 2))) AS t(i)
), samp0 AS (
    SELECT doc_id, i // 2 AS j,
           sum(CASE WHEN i % 2 = 0 THEN v ELSE 256 * v END) AS u
    FROM bytes GROUP BY doc_id, i // 2
), samp AS (
    SELECT doc_id, j,
           abs(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS a
    FROM samp0
), nn AS (
    SELECT doc_id, count(*) AS n FROM samp GROUP BY doc_id
), per AS (
    SELECT s.doc_id, nn.n, (s.j * {bits}) // nn.n AS blk, s.a
    FROM samp s JOIN nn USING (doc_id)
), blocks AS (
    SELECT doc_id, n, blk, sum(a) AS bsum, count(*) AS bcnt
    FROM per GROUP BY doc_id, n, blk
), tot AS (
    SELECT doc_id, sum(bsum) AS total FROM blocks GROUP BY doc_id
), sig0 AS (
    SELECT bl.doc_id,
           CAST(sum(CASE WHEN bl.bsum * bl.n > t.total * bl.bcnt
                         THEN CAST(1 AS BIGINT) << CAST(bl.blk AS INTEGER)
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
    FROM blocks bl JOIN tot t USING (doc_id)
    GROUP BY bl.doc_id
), sig AS (
    SELECT corpus.doc_id AS id, CAST(coalesce(s.ph, 0) AS BIGINT) AS ph
    FROM corpus LEFT JOIN sig0 s USING (doc_id)
)
SELECT x.id AS id_a, y.id AS id_b,
       CAST(bit_count(xor(x.ph, y.ph)) AS INTEGER) AS hamming
FROM sig x JOIN sig y ON x.id < y.id
WHERE bit_count(xor(x.ph, y.ph)) <= {max_hamming}
"""


ORACLE_AUDIO_NEAR_DUP = _audio_near_dup_oracle()


# Full audio-dedup pipeline (queries.q_audio_dedup_survivors):
# envelope pairs through the shared survivors scaffolding (corpus =
# base docs + the even-length pad-byte twins).
ORACLE_AUDIO_DEDUP_SURVIVORS = _survivors_oracle(
    _audio_near_dup_oracle(), _AUDIO_CORPUS_IDS
)





# Full image-dedup pipeline (queries.q_image_dedup_survivors): the
# perceptual pair chain, then the shared transitive-closure survivors
# scaffolding.
ORACLE_IMAGE_DEDUP_SURVIVORS = _survivors_oracle(
    _image_near_dup_oracle(), _IMAGE_CORPUS_IDS
)

ORACLE_MULTIMODAL_FRAMES = f"""
WITH {_BLOB_CTE}
SELECT doc_id,
       CAST(frame_no AS INTEGER) AS frame_no,
       CAST(frame_no * 256 AS BIGINT) AS "offset"
FROM (SELECT doc_id, unnest(range(0, octet_length(blob) // 256, 4)) AS frame_no FROM b)
"""


def _embedding_near_dup_oracle(
    dim: int = 64, threshold: float = 0.3, n_planes: int = 8, n_tables: int = 4
) -> str:
    def plane_sql(t: int, j: int) -> str:
        comps = ", ".join(
            repr(_h60_unit(f"hp:{t}:{j}:{d}"))
            for d in range(dim)
        )
        return f"[{comps}]"

    bucket_selects = []
    for t in range(n_tables):
        terms = " + ".join(
            f"(CASE WHEN {_dot('embedding', plane_sql(t, j))} >= 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j in range(n_planes)
        )
        bucket_selects.append(
            f"SELECT vec_id AS id, {t} AS tbl, {terms} AS bucket FROM embeddings"
        )
    buckets = "\n    UNION ALL\n    ".join(bucket_selects)
    return f"""
WITH buckets AS (
    {buckets}
), cand AS (
    SELECT DISTINCT x.id AS id_a, y.id AS id_b
    FROM buckets x JOIN buckets y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.id < y.id
), e AS (
    SELECT vec_id, embedding, sqrt({_dot("embedding", "embedding")}) AS nrm
    FROM embeddings
), scored AS (
    SELECT cand.id_a, cand.id_b,
           CASE WHEN a.nrm * b.nrm = 0 THEN NULL
                ELSE {_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) END AS score
    FROM cand
    JOIN e a ON a.vec_id = cand.id_a
    JOIN e b ON b.vec_id = cand.id_b
)
SELECT id_a, id_b, round(score, 6) AS score
FROM scored WHERE score >= {threshold}
"""


ORACLE_EMBEDDING_NEAR_DUP = _embedding_near_dup_oracle()

ORACLE_PROPS_FROM_JSON = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS parsed_ok
FROM events
"""

ORACLE_UDTF_SENTENCES = """
WITH p AS (
    SELECT doc_id, string_split(text, '. ') AS parts
    FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS sent_no,
       parts[i] AS sentence
FROM p, LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i) t
"""

ORACLE_PIVOT_STATUS = """
SELECT c_mktsegment,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

# DuckDB dayofweek/dow is 0=Sunday; Spark's dayofweek is 1=Sunday.
ORACLE_EVENT_CALENDAR = """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hod,
       count(*) AS n_events
FROM events
GROUP BY dow, hod
"""

ORACLE_VALUE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(stddev_pop(value), 6) AS sd,
       round(corr(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS corr_vk
FROM events
GROUP BY event_type
"""

# DuckDB has no width_bucket — spell out its definition:
# 0 below lo, n+1 at/above hi, else floor((v-lo)/width)+1.
ORACLE_PRICE_HISTOGRAM = """
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                 WHEN o_totalprice >= 600000.0 THEN 13
                 ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1
            END AS BIGINT) AS bucket,
       count(*) AS n_orders
FROM orders
GROUP BY bucket
"""

# Independent-algorithm oracle: DuckDB's native ASOF JOIN (binary
# search per key) vs our union+window carry — same semantics, totally
# different execution.
ORACLE_ASOF_PURCHASES = """
SELECT l.event_id, l.user_id,
       r.purchase_value, r.purchase_ts
FROM events l
ASOF LEFT JOIN (
    -- max() per (user, ts): same duplicate-timestamp winner as the
    -- engine's largest-value-struct tie rule (native ASOF has no
    -- defined tie order)
    SELECT user_id, ts, max(round(value, 6)) AS purchase_value,
           epoch_us(ts) AS purchase_ts
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
) r ON l.user_id = r.user_id AND l.ts >= r.ts
"""

_SAMPLE_BUCKET = _h60("'sample:' || CAST(doc_id AS VARCHAR)") + " % 10000"
_SPLIT_BUCKET = _h60("'split:' || CAST(doc_id AS VARCHAR)") + " % 10000"

ORACLE_HASH_SAMPLE_SPLIT = f"""
WITH sampled AS (
    SELECT doc_id, source FROM documents WHERE {_SAMPLE_BUCKET} < 5000
), split AS (
    SELECT source,
           CASE WHEN {_SPLIT_BUCKET} < 2000 THEN 'val' ELSE 'train' END AS split,
           doc_id
    FROM sampled
)
SELECT source, split, count(*) AS n_docs, min(doc_id) AS min_doc
FROM split GROUP BY source, split
"""

ORACLE_TRAINING_PREP = f"""
WITH {_DOC_TOK_CTE}, m AS (
    SELECT doc_id, source, text,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS mtl,
           CASE WHEN length({_nrm("text")}) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace({_nrm("text")}, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                     / CAST(length({_nrm("text")}) AS DOUBLE)
           END AS pr,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST({_stop_hits("tok", "en")} AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS swr
    FROM doc_tok
), q AS (
    SELECT doc_id, source, text FROM m
    WHERE ((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN swr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0 >= 0.75
), surv AS (
    SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)
), kept AS (
    SELECT q.* FROM q JOIN surv USING (doc_id)
), samp AS (
    SELECT * FROM kept WHERE {_SAMPLE_BUCKET} < 8000
)
SELECT source, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM samp GROUP BY source
"""

ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLE_PII_REDACTION = r"""
WITH dirty AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   ELSE '' END AS d
    FROM documents
), clean AS (
    SELECT doc_id, d,
           regexp_replace(regexp_replace(regexp_replace(d,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\b[0-9][0-9 \-]{6,}[0-9]\b', '<NUMBER>', 'g') AS c
    FROM dirty
)
SELECT doc_id,
       CAST(length(d) AS BIGINT) AS dirty_len,
       CAST(length(c) AS BIGINT) AS clean_len,
       CAST(CASE WHEN c <> d THEN 1 ELSE 0 END AS INTEGER) AS was_redacted,
       CAST(length(c) - length(replace(c, '<EMAIL>', '')) AS INTEGER) AS email_chars
FROM clean
"""

ORACLE_REPETITION_STATS = f"""
WITH {_DOC_TOK_CTE}, reps AS (
    SELECT source,
           CASE WHEN len({_shingles("tok", 2)}) <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct({_shingles("tok", 2)})) AS DOUBLE)
                           / CAST(len({_shingles("tok", 2)}) AS DOUBLE)
           END AS rep
    FROM doc_tok
)
SELECT source,
       round(avg(rep), 6) AS avg_repetition,
       round(max(rep), 6) AS max_repetition,
       count(*) AS n_docs
FROM reps GROUP BY source
"""

ORACLE_TOP_BIGRAMS = f"""
WITH {_DOC_TOK_CTE}
SELECT bigram, count(*) AS n
FROM (SELECT unnest({_shingles("tok", 2)}) AS bigram FROM doc_tok)
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""

ORACLE_SQL_SUPPLIER_SHARE = """
SELECT n.n_name AS nation,
       count(*) AS n_suppliers,
       round(sum(s.s_acctbal), 2) AS sum_acctbal,
       round(sum(s.s_acctbal) / (SELECT sum(s_acctbal) FROM supplier), 6) AS share
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

ORACLE_BPE_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(CASE WHEN trim(lower(text)) = '' THEN 0
                 ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS BIGINT)
           AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text),
            '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))
           AS BIGINT) AS n_bpe_tokens
FROM documents
"""

# Sequential left-to-right cumulative fold — identical float result in
# the pandas cumsum and the SQL running-sum window.
ORACLE_USER_CUMSUM = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS cum_value
FROM events
"""

# Per-user population z-score; zero-variance (incl. single-event) users
# yield NULL in both engines (pandas ddof=0 std == stddev_pop, NULLIF
# mirrors the std==0 guard).
ORACLE_USER_ZSCORE = """
SELECT event_id, user_id,
       round((value - avg(value) OVER w)
             / NULLIF(stddev_pop(value) OVER w, 0), 6) AS zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


def _ivf_oracle(
    dim: int = 64, k: int = 5, n_cells: int = 16, n_probe: int = 4
) -> str:
    def centroid_sql(c: int) -> str:
        comps = ", ".join(
            repr(_h60_unit(f"ivf:{c}:{d}"))
            for d in range(dim)
        )
        return f"[{comps}]"

    cell_selects = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id, embedding, {c} AS cell, "
        f"{_dot('embedding', centroid_sql(c))} AS d FROM embeddings"
        for c in range(n_cells)
    )
    return f"""
WITH dots AS (
    {cell_selects}
), ranked AS (
    SELECT vec_id, embedding, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell DESC) AS rnk
    FROM dots
), stored AS (
    SELECT vec_id AS neighbor_id, embedding AS c_vec, cell FROM ranked WHERE rnk = 1
), probing AS (
    SELECT vec_id AS query_id, embedding AS q_vec, cell FROM ranked WHERE rnk <= {n_probe}
), cand AS (
    SELECT query_id, q_vec, neighbor_id, c_vec
    FROM probing JOIN stored USING (cell)
    WHERE query_id <> neighbor_id
), scored AS (
    SELECT query_id, neighbor_id,
           CASE WHEN sqrt({_dot("q_vec", "q_vec")}) * sqrt({_dot("c_vec", "c_vec")}) = 0 THEN NULL
                ELSE {_dot("q_vec", "c_vec")}
                     / (sqrt({_dot("q_vec", "q_vec")}) * sqrt({_dot("c_vec", "c_vec")})) END AS score
    FROM cand
), topk AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC NULLS LAST, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(score, 6) AS score, CAST(rnk AS INTEGER) AS rank
FROM topk WHERE rnk <= {k}
"""


ORACLE_IVF_TOPK = _ivf_oracle()


def _cell_occupancy_oracle(dim: int = 64, n_cells: int = 16) -> str:
    """Rows-per-cell occupancy of the pseudo-random IVF quantizer —
    the same unrolled rank-1 assignment as `_ivf_oracle` (dot DESC,
    cell DESC tie-break), then one GROUP BY and two |cells|-row
    window aggregates. All-integer counts; only `share` crosses
    engines as a float (round 6, the scalar convention)."""

    def centroid_sql(c: int) -> str:
        comps = ", ".join(
            repr(_h60_unit(f"ivf:{c}:{d}")) for d in range(dim)
        )
        return f"[{comps}]"

    cell_selects = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id, {c} AS cell, "
        f"{_dot('embedding', centroid_sql(c))} AS d FROM embeddings"
        for c in range(n_cells)
    )
    return f"""
WITH dots AS (
    {cell_selects}
), ranked AS (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell DESC) AS rnk
    FROM dots
), per AS (
    SELECT cell, COUNT(*) AS n_vecs FROM ranked WHERE rnk = 1 GROUP BY cell
)
SELECT CAST(cell AS INTEGER) AS cell, n_vecs,
       round(n_vecs * 1.0 / SUM(n_vecs) OVER (), 6) AS share,
       n_vecs > 2 * AVG(n_vecs) OVER () AS crowded
FROM per
"""


ORACLE_CELL_OCCUPANCY = _cell_occupancy_oracle()


def _incremental_semantic_oracle(
    dim: int = 64, n_cells: int = 16, n_probe: int = 2,
    threshold: float = 0.3,
) -> str:
    """Replays `similarity.incremental_semantic_dedup`: the pinned
    h60 centroid assignment (same cell_selects + d DESC, cell DESC
    ranking as `_ivf_oracle` — hash-proven), corpus slice stored at
    rank-1, batch slice probing ``n_probe`` cells, strict-fold cosine
    inside probed∩stored cell pairs, best match by (cos DESC, id ASC)."""
    def centroid_sql(c: int) -> str:
        comps = ", ".join(
            repr(_h60_unit(f"ivf:{c}:{d}")) for d in range(dim)
        )
        return f"[{comps}]"

    cell_selects = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id, embedding, {c} AS cell, "
        f"{_dot('embedding', centroid_sql(c))} AS d FROM embeddings"
        for c in range(n_cells)
    )
    cos = (
        f"CASE WHEN sqrt({_dot('q_vec', 'q_vec')}) * "
        f"sqrt({_dot('c_vec', 'c_vec')}) = 0 THEN NULL "
        f"ELSE {_dot('q_vec', 'c_vec')} / "
        f"(sqrt({_dot('q_vec', 'q_vec')}) * sqrt({_dot('c_vec', 'c_vec')})) END"
    )
    return f"""
WITH dots AS (
    {cell_selects}
), ranked AS (
    SELECT vec_id, embedding, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell DESC) AS rnk
    FROM dots
), stored AS (
    SELECT vec_id AS c_id, embedding AS c_vec, cell
    FROM ranked WHERE rnk = 1 AND vec_id % 10 <> 7
), assigned AS (
    SELECT vec_id AS q_id, embedding AS q_vec, cell, rnk
    FROM ranked WHERE vec_id % 10 = 7
), probing AS (
    SELECT q_id, q_vec, cell FROM assigned WHERE rnk <= {n_probe}
), base AS (
    SELECT q_id AS id, cell FROM assigned WHERE rnk = 1
), scored AS (
    SELECT q_id, c_id, {cos} AS cs
    FROM probing JOIN stored USING (cell) WHERE q_id <> c_id
), hits AS (
    SELECT q_id, c_id, cs,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cs DESC NULLS LAST, c_id ASC) AS rn
    FROM scored WHERE cs >= {threshold}
), agg AS (
    SELECT q_id, CAST(count(*) AS BIGINT) AS n_matches,
           max(CASE WHEN rn = 1 THEN c_id END) AS best_match_id,
           round(max(CASE WHEN rn = 1 THEN cs END), 6) AS best_score
    FROM hits GROUP BY q_id
)
SELECT b.id AS vec_id, CAST(b.cell AS INTEGER) AS cell,
       CAST(COALESCE(a.n_matches, 0) AS BIGINT) AS n_matches,
       COALESCE(a.n_matches, 0) = 0 AS is_new,
       a.best_match_id, a.best_score
FROM base b LEFT JOIN agg a ON a.q_id = b.id
"""


ORACLE_INCREMENTAL_SEMANTIC_DEDUP = _incremental_semantic_oracle()

# Recall@5 of the IVF path vs brute-force truth: the two sides are the
# EXACT oracle bodies of cosine_topk and ivf_topk (the
# lsh_quality_report composition pattern), so the intersection count
# is an exact integer and recall is one 6dp divide.
ORACLE_IVF_RECALL_REPORT = f"""
WITH truth AS ({ORACLE_COSINE_TOPK}),
approx AS ({_ivf_oracle()}),
hits AS (
    SELECT t.query_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
    FROM truth t
    LEFT JOIN (SELECT * FROM approx WHERE query_id < 25) a
      ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
)
SELECT query_id, n_hits, round(n_hits / 5.0, 6) AS recall_at_k
FROM hits ORDER BY query_id
"""


def _kmeans_cte_chain(k: int, n_iter: int, grid: int) -> str:
    """Shared CTE prefix replaying `clustering.kmeans_fit(init='hash',
    update_grid=grid)` exactly: unrolled Lloyd's iterations ending at
    centroid frame ``c{n_iter}`` (cell, pos, c). Used by the
    kmeans_cells and semdedup oracles."""
    h = _h60("CAST(vec_id AS VARCHAR)")
    parts = [
        "WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,"
        " CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),",
        f"""seeds AS (
    SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) - 1 AS cell
    FROM (SELECT vec_id, {h} AS h FROM embeddings ORDER BY h, vec_id LIMIT {k})
),
c0 AS (SELECT s.cell, v.pos, v.x AS c FROM seeds s JOIN v ON v.vec_id = s.vec_id),""",
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""a{i} AS (
    SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - c.c) * (v.x - c.c)), c.cell) AS rn
        FROM v JOIN c{i - 1} c USING (pos)
        GROUP BY v.vec_id, c.cell)
    WHERE rn = 1
),
u{i} AS (
    SELECT a.cell, v.pos,
           sum(CAST(floor(v.x * {grid}.0) AS BIGINT)) AS s, count(*) AS n
    FROM a{i} a JOIN v ON v.vec_id = a.vec_id
    GROUP BY a.cell, v.pos
),
c{i} AS (
    SELECT p.cell, p.pos,
           COALESCE(CAST(u.s AS DOUBLE) / CAST(u.n AS DOUBLE) / {grid}.0, p.c) AS c
    FROM c{i - 1} p LEFT JOIN u{i} u ON u.cell = p.cell AND u.pos = p.pos
),""")
    return "\n".join(parts)


def _kmeans_oracle(k: int = 8, n_iter: int = 3, grid: int = 10**6) -> str:
    """Unrolled Lloyd's replay — possible because the Spark side's
    centroid update aggregates integer micro-units (exact BIGINT sums,
    order-insensitive; `clustering.kmeans_fit(update_grid=...)`), so
    both engines compute bit-identical centroids at every iteration
    boundary: float32→double is exact, floor(x·grid) is deterministic,
    and (Σq / n) / grid divides exact integers below 2^53. Assignment
    distances are plain double math in both engines; argmin agrees
    unless two centroids tie within ~1 ulp (not the case on the
    fixtures). ``n_iter`` is unrolled as plain CTEs — no recursion."""
    parts = [_kmeans_cte_chain(k, n_iter, grid)]
    parts.append(f"""final AS (
    SELECT vec_id, cell, d2 FROM (
        SELECT v.vec_id, c.cell, sum((v.x - c.c) * (v.x - c.c)) AS d2,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - c.c) * (v.x - c.c)), c.cell) AS rn
        FROM v JOIN c{n_iter} c USING (pos)
        GROUP BY v.vec_id, c.cell)
    WHERE rn = 1
)
SELECT CAST(cell AS INTEGER) AS cell, count(*) AS n_vectors,
       round(avg(d2), 6) AS avg_dist2
FROM final GROUP BY cell""")
    return "\n".join(parts)


ORACLE_KMEANS_CELLS = _kmeans_oracle()


def _two_level_cte_chain(
    k_c: int = 4, k_f: int = 4, n_iter: int = 2, coarse_iter: int = 2,
    grid: int = 10**6,
) -> str:
    """Replays `clustering.kmeans_fit_two_level` +
    `kmeans_assign_two_level` as a composable CTE chain ending at
    ``final`` (vec_id, ccell, fine, d2 — each vector's global
    two-level assignment): the flat hash-seeded integer-grid coarse
    chain (shared `_kmeans_cte_chain`, bit-identical coarse
    centroids), the coarse pinning argmin (``ca``), per-coarse-cell
    hash seeding of the fine level (k_f smallest h60(id) per cell),
    unrolled fine Lloyd's with the same exact-BIGINT update
    (``f{n_iter}`` holds the fitted fine centroids), and the two-level
    inference argmin. Tie-breaks everywhere are (d2, cell) — the
    engine's numpy first-min, same accepted ~1-ulp convention as the
    flat oracle. Consumers append their own CTEs/SELECT (the
    two_level_kmeans and imi_topk oracles)."""
    h = _h60("CAST(e.vec_id AS VARCHAR)")
    parts = [_kmeans_cte_chain(k_c, coarse_iter, grid)]
    parts.append(f"""ca AS MATERIALIZED (
    SELECT vec_id, cell AS ccell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - c.c) * (v.x - c.c)), c.cell) AS rn
        FROM v JOIN c{coarse_iter} c USING (pos)
        GROUP BY v.vec_id, c.cell)
    WHERE rn = 1
),
fseeds AS (
    SELECT vec_id, ccell, rn - 1 AS fine FROM (
        SELECT ca.vec_id, ca.ccell,
               row_number() OVER (PARTITION BY ca.ccell
                   ORDER BY {h}, ca.vec_id) AS rn
        FROM ca JOIN embeddings e ON e.vec_id = ca.vec_id)
    WHERE rn <= {k_f}
),
f0 AS (
    SELECT s.ccell, s.fine, v.pos, v.x AS c
    FROM fseeds s JOIN v ON v.vec_id = s.vec_id
),""")
    for i in range(1, n_iter + 1):
        parts.append(f"""fa{i} AS (
    SELECT vec_id, ccell, fine FROM (
        SELECT v.vec_id, ca.ccell, f.fine,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - f.c) * (v.x - f.c)), f.fine) AS rn
        FROM v JOIN ca ON ca.vec_id = v.vec_id
        JOIN f{i - 1} f ON f.ccell = ca.ccell AND f.pos = v.pos
        GROUP BY v.vec_id, ca.ccell, f.fine)
    WHERE rn = 1
),
fu{i} AS (
    SELECT a.ccell, a.fine, v.pos,
           sum(CAST(floor(v.x * {grid}.0) AS BIGINT)) AS s, count(*) AS n
    FROM fa{i} a JOIN v ON v.vec_id = a.vec_id
    GROUP BY a.ccell, a.fine, v.pos
),
f{i} AS (
    SELECT p.ccell, p.fine, p.pos,
           COALESCE(CAST(u.s AS DOUBLE) / CAST(u.n AS DOUBLE) / {grid}.0, p.c) AS c
    FROM f{i - 1} p LEFT JOIN fu{i} u
        ON u.ccell = p.ccell AND u.fine = p.fine AND u.pos = p.pos
),""")
    parts.append(f"""sa AS (
    -- SERVE-side coarse assignment: restricted to cells that trained
    -- a fine codebook (engine's _two_level_model_arrays routing) —
    -- training pinning (ca) stays unrestricted, matching the engine's
    -- _assign_cells over the full coarse model
    SELECT vec_id, ccell FROM (
        SELECT v.vec_id, c.cell AS ccell,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - c.c) * (v.x - c.c)), c.cell) AS rn
        FROM v JOIN c{coarse_iter} c USING (pos)
        WHERE c.cell IN (SELECT DISTINCT ccell FROM f0)
        GROUP BY v.vec_id, c.cell)
    WHERE rn = 1
),
final AS (
    SELECT vec_id, ccell, fine, d2 FROM (
        SELECT v.vec_id, sa.ccell, f.fine,
               sum((v.x - f.c) * (v.x - f.c)) AS d2,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - f.c) * (v.x - f.c)), f.fine) AS rn
        FROM v JOIN sa ON sa.vec_id = v.vec_id
        JOIN f{n_iter} f ON f.ccell = sa.ccell AND f.pos = v.pos
        GROUP BY v.vec_id, sa.ccell, f.fine)
    WHERE rn = 1
)""")
    return "\n".join(parts)


def _two_level_kmeans_oracle(
    k_c: int = 4, k_f: int = 4, n_iter: int = 2, coarse_iter: int = 2,
    grid: int = 10**6,
) -> str:
    """Per-global-cell population + mean d² over the two-level chain
    (see `_two_level_cte_chain` for the full parity argument)."""
    return f"""{_two_level_cte_chain(k_c, k_f, n_iter, coarse_iter, grid)}
SELECT CAST(ccell * {k_f} + fine AS INTEGER) AS cell,
       CAST(ccell AS INTEGER) AS coarse_cell,
       count(*) AS n_vectors, round(avg(d2), 6) AS avg_dist2
FROM final GROUP BY 1, 2"""


ORACLE_TWO_LEVEL_KMEANS = _two_level_kmeans_oracle()


def _imi_topk_oracle(
    k_c: int = 4, k_f: int = 4, n_iter: int = 2, coarse_iter: int = 2,
    grid: int = 10**6, p_c: int = 2, p_f: int = 2, k: int = 5,
) -> str:
    """Replays `similarity.imi_topk`: the two-level chain stores each
    corpus vector in its global fine cell (``final``); each query
    ranks the COARSE centroids (d2 asc, ccell asc — the engine's
    stable argsort) and keeps p_c, then ranks the fine centroids
    WITHIN each probed coarse cell and keeps p_f, giving p_c·p_f
    probed global cells; candidates are stored∩probed cell pairs,
    scored with the strict-fold cosine and ranked score DESC /
    neighbor_id ASC — the `_ivf_oracle` serving conventions on top of
    the two-level quantizer."""
    return f"""{_two_level_cte_chain(k_c, k_f, n_iter, coarse_iter, grid)},
qpc AS (
    -- rank only coarse cells that TRAINED a fine codebook (the
    -- engine's trained-cell restriction, _two_level_model_arrays):
    -- an empty coarse cell keeps its seed centroid but has nothing
    -- to probe, and spending a probe slot on it would diverge the
    -- candidate sets cross-engine
    SELECT vec_id, ccell FROM (
        SELECT v.vec_id, c.cell AS ccell,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - c.c) * (v.x - c.c)), c.cell) AS rn
        FROM v JOIN c{coarse_iter} c USING (pos)
        WHERE c.cell IN (SELECT DISTINCT ccell FROM f0)
        GROUP BY v.vec_id, c.cell)
    WHERE rn <= {p_c}
),
qprobe AS (
    SELECT vec_id, ccell * {k_f} + fine AS cell FROM (
        SELECT v.vec_id, q.ccell, f.fine,
               row_number() OVER (PARTITION BY v.vec_id, q.ccell
                   ORDER BY sum((v.x - f.c) * (v.x - f.c)), f.fine) AS rn
        FROM v JOIN qpc q ON q.vec_id = v.vec_id
        JOIN f{n_iter} f ON f.ccell = q.ccell AND f.pos = v.pos
        GROUP BY v.vec_id, q.ccell, f.fine)
    WHERE rn <= {p_f}
),
stored AS (
    SELECT vec_id AS neighbor_id, ccell * {k_f} + fine AS cell FROM final
),
cand AS (
    SELECT q.vec_id AS query_id, s.neighbor_id
    FROM qprobe q JOIN stored s USING (cell)
    WHERE q.vec_id <> s.neighbor_id
),
scored AS (
    SELECT query_id, neighbor_id,
           CASE WHEN sqrt({_dot("eq.embedding", "eq.embedding")}) * sqrt({_dot("en.embedding", "en.embedding")}) = 0 THEN NULL
                ELSE {_dot("eq.embedding", "en.embedding")}
                     / (sqrt({_dot("eq.embedding", "eq.embedding")}) * sqrt({_dot("en.embedding", "en.embedding")})) END AS score
    FROM cand
    JOIN embeddings eq ON eq.vec_id = query_id
    JOIN embeddings en ON en.vec_id = neighbor_id
),
topk AS (
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC NULLS LAST, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(score, 6) AS score,
       CAST(rnk AS INTEGER) AS rank
FROM topk WHERE rnk <= {k}"""


ORACLE_IMI_TOPK = _imi_topk_oracle()

# Recall@5 of the IMI path vs brute-force truth — the same composition
# as ORACLE_IVF_RECALL_REPORT with the two-level serve oracle as the
# approx side: both CTE bodies are individually driver-provable, so
# the intersection count is an exact integer and recall one 6dp divide.
ORACLE_IMI_RECALL_REPORT = f"""
WITH truth AS ({ORACLE_COSINE_TOPK}),
approx AS ({ORACLE_IMI_TOPK}),
hits AS (
    SELECT t.query_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
    FROM truth t
    LEFT JOIN (SELECT * FROM approx WHERE query_id < 25) a
      ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
)
SELECT query_id, n_hits, round(n_hits / 5.0, 6) AS recall_at_k
FROM hits ORDER BY query_id
"""


def _cluster_silhouette_oracle(
    k: int = 8, n_iter: int = 3, grid: int = 10**6
) -> str:
    """Replays `clustering.cluster_silhouette` over the same unrolled
    Lloyd's chain as ORACLE_KMEANS_CELLS (bit-identical centroids via
    the integer-grid update): per (vector, cell) squared distance, the
    argmin cell with the (d2, cell) tie-break, b2 as the min over the
    OTHER cells, s = (b2−a2)/greatest(a2,b2) guarded to 0 on the
    degenerate both-zero case — the engine's np.where mirror. Means at
    6dp absorb the expanded-form-vs-fold ulp noise exactly as
    avg_dist2 does."""
    parts = [_kmeans_cte_chain(k, n_iter, grid)]
    parts.append(f"""alld AS (
    SELECT v.vec_id, c.cell, sum((v.x - c.c) * (v.x - c.c)) AS d2
    FROM v JOIN c{n_iter} c USING (pos)
    GROUP BY v.vec_id, c.cell
), assigned AS (
    SELECT vec_id, cell, d2 AS a2 FROM (
        SELECT vec_id, cell, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM alld)
    WHERE rn = 1
), nearest_other AS (
    SELECT a.vec_id, min(d.d2) AS b2
    FROM assigned a JOIN alld d
      ON d.vec_id = a.vec_id AND d.cell <> a.cell
    GROUP BY a.vec_id
), s AS (
    SELECT a.cell,
           CASE WHEN greatest(a.a2, o.b2) > 0
                THEN (o.b2 - a.a2) / greatest(a.a2, o.b2)
                ELSE 0.0 END AS sil,
           a.a2
    FROM assigned a JOIN nearest_other o ON o.vec_id = a.vec_id
)
SELECT CAST(cell AS INTEGER) AS cell, count(*) AS n_vectors,
       round(avg(sil), 6) AS mean_silhouette,
       round(avg(a2), 6) AS mean_own_dist2
FROM s GROUP BY cell""")
    return "\n".join(parts)


ORACLE_CLUSTER_SILHOUETTE = _cluster_silhouette_oracle()


# --- shared PQ oracle helpers: the pinned codebook literals and the
# distance expression with numpy's EXACT float association. numpy's
# pairwise summation reduces a length-8 axis as the 8-leaf tree
# ((t0+t1)+(t2+t3)) + ((t4+t5)+(t6+t7)) — writing the SQL in any other
# association (e.g. a left-to-right '+' chain) leaves ~1-ulp drift
# that can flip an unrounded argmin tie-break or top-k rank.


def _pq_book(j: int, c: int, d: int) -> float:
    return _h60_unit(f"pq:{j}:{c}:{d}")


def _pq_tree8(terms: list[str]) -> str:
    assert len(terms) == 8
    return (
        f"(({terms[0]} + {terms[1]}) + ({terms[2]} + {terms[3]})) + "
        f"(({terms[4]} + {terms[5]}) + ({terms[6]} + {terms[7]}))"
    )


def _pq_dist_expr(col: str, j: int, c: int, dsub: int = 8) -> str:
    terms = []
    for d in range(dsub):
        idx = j * dsub + d + 1  # 1-based list index
        b = repr(_pq_book(j, c, d))
        terms.append(
            f"((CAST({col}[{idx}] AS DOUBLE) - ({b}))"
            f" * (CAST({col}[{idx}] AS DOUBLE) - ({b})))"
        )
    return _pq_tree8(terms)


def _pq_encode_oracle(m: int = 8, k: int = 16, dsub: int = 8) -> str:
    """Replays PQ encoding against the same pinned h60-literal codebook
    `quantization.pq_pinned_codebooks` builds: for every (subspace j,
    code c) a distance expression over the 8 sliced components (in
    numpy's tree association — see `_pq_tree8`), argmin per (vec, j)
    with the lowest-code tie-break, codes assembled in subspace order
    as a ','-joined string (scalar — the driver's canonicalizer cannot
    hash list columns), recon_err = Σⱼ best distance (rounded 6 in
    both engines)."""
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id, {j} AS j, {c} AS c, "
        f"{_pq_dist_expr('embedding', j, c, dsub)} AS dist FROM embeddings"
        for j in range(m)
        for c in range(k)
    )
    return f"""
WITH dists AS (
    {selects}
), best AS (
    SELECT vec_id, j, c AS code, dist,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
    FROM dists
)
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), ',' ORDER BY j) AS codes_csv,
       round(sum(dist), 6) AS recon_err
FROM best WHERE rn = 1
GROUP BY vec_id
"""


ORACLE_PQ_ENCODE = _pq_encode_oracle()


def _pq_topk_oracle(
    m: int = 8, k_sub: int = 16, dsub: int = 8, k: int = 5, nq: int = 25
) -> str:
    """Replays the full ADC serve path of `quantization.pq_topk` over
    the pinned codebook: corpus encode-argmin (as in ORACLE_PQ_ENCODE),
    per-query subspace distance tables, and the gather-sum — with BOTH
    float reductions written as the exact 8-leaf TREE numpy's pairwise
    summation performs for length-8 axes (((t0+t1)+(t2+t3)) +
    ((t4+t5)+(t6+t7))), so raw distances are bit-identical and the
    raw-distance ranking (neighbor-id tie-break, the similarity-family
    convention) cannot flip cross-engine."""
    corpus_dists = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id, {j} AS j, {c} AS c, "
        f"{_pq_dist_expr('embedding', j, c, dsub)} AS dist FROM embeddings"
        for j in range(m)
        for c in range(k_sub)
    )
    qt_dists = "\n    UNION ALL\n    ".join(
        f"SELECT qid, {j} AS j, {c} AS c, "
        f"{_pq_dist_expr('embedding', j, c, dsub)} AS tdist FROM q"
        for j in range(m)
        for c in range(k_sub)
    )
    lsum = _pq_tree8([f"l[{i + 1}]" for i in range(m)])
    return f"""
WITH dists AS (
    {corpus_dists}
), best AS (
    SELECT vec_id, j, code FROM (
        SELECT vec_id, j, c AS code,
               row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
        FROM dists)
    WHERE rn = 1
), q AS (
    SELECT vec_id AS qid, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}
), qt AS (
    {qt_dists}
), pair AS (
    SELECT t.qid AS query_id, b.vec_id AS neighbor_id, t.j, t.tdist
    FROM best b JOIN qt t ON t.j = b.j AND t.c = b.code
    WHERE b.vec_id <> t.qid
), agg AS (
    SELECT query_id, neighbor_id, list(tdist ORDER BY j) AS l
    FROM pair GROUP BY query_id, neighbor_id
), scored AS (
    SELECT query_id, neighbor_id, {lsum} AS raw FROM agg
), ranked AS (
    SELECT query_id, neighbor_id, raw,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY raw ASC, neighbor_id ASC
           ) AS INTEGER) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(raw, 6) AS dist2, rnk
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rnk
"""


ORACLE_PQ_TOPK = _pq_topk_oracle()


def _ivf_pq_topk_oracle(
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    dsub: int = 8,
    k: int = 5,
    nq: int = 25,
    n_cells: int = 16,
    n_probe: int = 4,
) -> str:
    """Replays `quantization.ivf_pq_topk` by composing the two green
    chains: the `_ivf_oracle` cell ranking (dot vs `_h60_unit`
    centroid literals, dot desc / cell desc) picks each vector's
    storage cell and each query's ``n_probe`` probes, the
    `_pq_topk_oracle` encode-argmin + ADC gather (both reductions in
    numpy's 8-leaf pairwise tree) scores exactly the
    stored-cell ∩ probed-cell pairs. by_residual=False means the
    per-query tables are cell-independent — the composition is one
    extra equality join, nothing about the distance math changes."""
    from batch_process_dpla_index_spark.operators.similarity import _h60_unit

    def centroid_sql(c: int) -> str:
        comps = ", ".join(
            repr(_h60_unit(f"ivf:{c}:{d}")) for d in range(dim)
        )
        return f"[{comps}]"

    cell_selects = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id, {c} AS cell, "
        f"{_dot('embedding', centroid_sql(c))} AS d FROM embeddings"
        for c in range(n_cells)
    )
    corpus_dists = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id, {j} AS j, {c} AS c, "
        f"{_pq_dist_expr('embedding', j, c, dsub)} AS dist FROM embeddings"
        for j in range(m)
        for c in range(k_sub)
    )
    qt_dists = "\n    UNION ALL\n    ".join(
        f"SELECT qid, {j} AS j, {c} AS c, "
        f"{_pq_dist_expr('embedding', j, c, dsub)} AS tdist FROM q"
        for j in range(m)
        for c in range(k_sub)
    )
    lsum = _pq_tree8([f"l[{i + 1}]" for i in range(m)])
    return f"""
WITH dots AS (
    {cell_selects}
), celled AS (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell DESC) AS rnk
    FROM dots
), q AS (
    SELECT vec_id AS qid, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}
), stored_cell AS (
    SELECT vec_id, cell FROM celled WHERE rnk = 1
), probe AS (
    SELECT c.vec_id AS qid, c.cell
    FROM celled c JOIN q ON c.vec_id = q.qid
    WHERE c.rnk <= {n_probe}
), dists AS (
    {corpus_dists}
), best AS (
    SELECT vec_id, j, code FROM (
        SELECT vec_id, j, c AS code,
               row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
        FROM dists)
    WHERE rn = 1
), qt AS (
    {qt_dists}
), pair AS (
    SELECT t.qid AS query_id, b.vec_id AS neighbor_id, t.j, t.tdist
    FROM best b
    JOIN stored_cell sc ON sc.vec_id = b.vec_id
    JOIN probe p ON p.cell = sc.cell
    JOIN qt t ON t.qid = p.qid AND t.j = b.j AND t.c = b.code
    WHERE b.vec_id <> t.qid
), agg AS (
    SELECT query_id, neighbor_id, list(tdist ORDER BY j) AS l
    FROM pair GROUP BY query_id, neighbor_id
), scored AS (
    SELECT query_id, neighbor_id, {lsum} AS raw FROM agg
), ranked AS (
    SELECT query_id, neighbor_id, raw,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY raw ASC, neighbor_id ASC
           ) AS INTEGER) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(raw, 6) AS dist2, rnk
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rnk
"""


ORACLE_IVF_PQ_TOPK = _ivf_pq_topk_oracle()


def _semdedup_oracle(
    k: int = 8, n_iter: int = 3, grid: int = 10**6, threshold: float = 0.3
) -> str:
    """Replays `dedup.semdedup` end to end: the shared k-means CTE
    chain yields bit-identical cells (integer-grid update), the final
    assignment mirrors `kmeans_assign`'s argmin, and the within-cell
    pair stage uses the strict-fold cosine both engines evaluate
    identically."""
    # zero-norm guard (same CASE pattern as ORACLE_COSINE_TOPK): the
    # engine's try_divide yields NULL for a zero/empty embedding, and a
    # NULL never passes >= threshold. A raw divide relied on DuckDB
    # 1.0's 0.0/0.0 -> NULL; under ieee_floating_point_ops=true (newer
    # default) it is NaN, and NaN >= threshold is TRUE in DuckDB -- a
    # zero-norm vector would pair in the oracle but not the engine.
    norm_prod = (
        f"(sqrt({_dot('a.embedding', 'a.embedding')}) * "
        f"sqrt({_dot('b.embedding', 'b.embedding')}))"
    )
    cos = (
        f"(CASE WHEN {norm_prod} = 0 THEN NULL "
        f"ELSE ({_dot('a.embedding', 'b.embedding')}) / {norm_prod} END)"
    )
    return f"""{_kmeans_cte_chain(k, n_iter, grid)}
af AS (
    SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - c.c) * (v.x - c.c)), c.cell) AS rn
        FROM v JOIN c{n_iter} c USING (pos)
        GROUP BY v.vec_id, c.cell)
    WHERE rn = 1
),
av AS (
    SELECT f.vec_id AS id, f.cell, e.embedding
    FROM af f JOIN embeddings e ON e.vec_id = f.vec_id
),
close AS (
    SELECT a.id, CAST(count(*) AS BIGINT) AS n_close
    FROM av a JOIN av b ON a.cell = b.cell AND b.id < a.id
    WHERE {cos} >= {threshold}
    GROUP BY a.id
)
SELECT av.id AS vec_id, CAST(av.cell AS INTEGER) AS cell,
       CAST(COALESCE(close.n_close, 0) AS BIGINT) AS n_close,
       COALESCE(close.n_close, 0) = 0 AS kept
FROM av LEFT JOIN close ON close.id = av.id
"""


ORACLE_SEMDEDUP = _semdedup_oracle()


def _semantic_dedup_oracle(
    k: int = 32, n_iter: int = 3, grid: int = 10**6, threshold: float = 0.3
) -> str:
    """Replays `dedup.semantic_dedup` end to end: the shared k-means
    chain (bit-identical cells), the strict-fold Σ(x−c)² centroid
    distance (list_reduce — the same left association as the engine's
    F.aggregate fold, so the (d2, id) representative ranking can never
    flip cross-engine), within-cell cosine pairs, and the
    dedup_clusters transitive-closure pattern for the groups. The
    chain's WITH is promoted to WITH RECURSIVE for the reach CTE."""
    # zero-norm guard (same CASE pattern as ORACLE_COSINE_TOPK): the
    # engine's try_divide yields NULL for a zero/empty embedding, and a
    # NULL never passes >= threshold. A raw divide relied on DuckDB
    # 1.0's 0.0/0.0 -> NULL; under ieee_floating_point_ops=true (newer
    # default) it is NaN, and NaN >= threshold is TRUE in DuckDB -- a
    # zero-norm vector would pair in the oracle but not the engine.
    norm_prod = (
        f"(sqrt({_dot('a.embedding', 'a.embedding')}) * "
        f"sqrt({_dot('b.embedding', 'b.embedding')}))"
    )
    cos = (
        f"(CASE WHEN {norm_prod} = 0 THEN NULL "
        f"ELSE ({_dot('a.embedding', 'b.embedding')}) / {norm_prod} END)"
    )
    d2 = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(e.embedding, ct.cv), "
        "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))), "
        "(acc, x) -> acc + x)"
    )
    chain = _kmeans_cte_chain(k, n_iter, grid).replace(
        "WITH ", "WITH RECURSIVE ", 1
    )
    return f"""{chain}
af AS (
    SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY sum((v.x - c.c) * (v.x - c.c)), c.cell) AS rn
        FROM v JOIN c{n_iter} c USING (pos)
        GROUP BY v.vec_id, c.cell)
    WHERE rn = 1
),
cent AS (
    SELECT cell, list(c ORDER BY pos) AS cv FROM c{n_iter} GROUP BY cell
),
av AS MATERIALIZED (
    SELECT f.vec_id AS id, f.cell, e.embedding, {d2} AS d2
    FROM af f
    JOIN embeddings e ON e.vec_id = f.vec_id
    JOIN cent ct ON ct.cell = f.cell
),
p2 AS (
    SELECT a.id AS id_a, b.id AS id_b
    FROM av a JOIN av b ON a.cell = b.cell AND a.id < b.id
    WHERE {cos} >= {threshold}
),
-- MATERIALIZED is load-bearing: the recursive reach CTE references
-- edges every round, and an inlined edges would re-run the whole
-- k-means + pairwise-cosine chain per recursion step (measured 48 s
-- vs 2 s on the sf0.01 fixture)
edges AS MATERIALIZED (
    SELECT id_a AS src, id_b AS dst FROM p2
    UNION
    SELECT id_b AS src, id_a AS dst FROM p2
),
reach(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e2.src, r.lab FROM edges e2 JOIN reach r ON r.node = e2.dst
),
cc AS (
    SELECT node, min(lab) AS lab FROM reach GROUP BY node
),
g AS (
    SELECT av.id, av.cell, av.d2,
           COALESCE(cc.lab, av.id) AS group_id
    FROM av LEFT JOIN cc ON cc.node = av.id
),
sized AS (
    SELECT id, cell, d2, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT)
               AS group_size,
           row_number() OVER (PARTITION BY group_id
                              ORDER BY d2 ASC, id ASC) AS rn
    FROM g
)
SELECT id AS vec_id, CAST(cell AS INTEGER) AS cell, group_id, group_size,
       rn = 1 AS kept, round(d2, 6) AS d2_centroid
FROM sized
"""


ORACLE_SEMANTIC_DEDUP = _semantic_dedup_oracle()

# Per-source duplication datasheet: exact text dups (a doc whose text
# already appeared under a smaller doc_id, ANY source) + semantic
# near-dups (non-representative members of the SemDeDup groups —
# the full semantic chain composed as a CTE body, the established
# recall-composition pattern). Counts are all-integer; the two rates
# are round-6 scalars. SUMs are cast to BIGINT (DuckDB sums integers
# into HUGEINT, which the pandas hop would turn into objects).
ORACLE_DATASET_DUP_PROFILE = f"""
WITH RECURSIVE sem AS ({ORACLE_SEMANTIC_DEDUP}),
exact AS (
    SELECT doc_id, source,
           CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY text)
                THEN 1 ELSE 0 END AS is_exact
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(is_exact) AS BIGINT) AS n_exact_dup,
       round(AVG(CAST(is_exact AS DOUBLE)), 6) AS exact_dup_rate,
       CAST(SUM(CASE WHEN s.vec_id IS NOT NULL AND NOT s.kept
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sem_dup,
       round(AVG(CASE WHEN s.vec_id IS NOT NULL AND NOT s.kept
                      THEN 1.0 ELSE 0.0 END), 6) AS sem_dup_rate
FROM exact LEFT JOIN sem s ON exact.doc_id = s.vec_id
GROUP BY source
"""

# Target-vs-corpus unigram LMs, both add-1 smoothed; the log2
# subtraction form mirrors curation.dsir_weights term by term.
ORACLE_DSIR_WEIGHTS = """
WITH terms AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents WHERE trim(lower(text)) <> ''
), t_counts AS (
    SELECT term, CAST(count(*) AS BIGINT) AS tc
    FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents WHERE lang = 'en' AND trim(lower(text)) <> ''
    ) GROUP BY term
), c_counts AS (
    SELECT term, CAST(count(*) AS BIGINT) AS cc FROM terms GROUP BY term
), t_stats AS (
    SELECT CAST(sum(tc) AS BIGINT) AS tn, CAST(count(*) AS BIGINT) AS tv
    FROM t_counts
), c_stats AS (
    SELECT CAST(sum(cc) AS BIGINT) AS cn, CAST(count(*) AS BIGINT) AS cv
    FROM c_counts
)
SELECT t.doc_id, count(*) AS n_terms,
       round(avg((log2(COALESCE(tc, 0) + 1.0) - log2(tn + 1.0 * tv))
               - (log2(COALESCE(cc, 0) + 1.0) - log2(cn + 1.0 * cv))), 6)
           AS dsir_weight
FROM terms t
LEFT JOIN t_counts USING (term)
LEFT JOIN c_counts USING (term)
CROSS JOIN t_stats CROSS JOIN c_stats
GROUP BY t.doc_id
"""

# Rank on the ROUNDED score (term tie-break) — mathematically-equal
# scores from different (tf, df) pairs order identically everywhere.
ORACLE_TFIDF_TERMS = """
WITH tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents WHERE trim(lower(text)) <> ''
    ) GROUP BY doc_id, term
), df AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, tfidf, rnk FROM (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           round(CAST(tf.tf AS DOUBLE)
                 * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6)
               AS tfidf,
           CAST(row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(CAST(tf.tf AS DOUBLE)
                   * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6)
                   DESC, tf.term) AS INTEGER) AS rnk
    FROM tf JOIN df USING (term) CROSS JOIN n
) WHERE rnk <= 3
"""

# H = log2(n) − (Σ c·log2 c)/n over per-character counts, computed
# in-list exactly like the Spark expression (no explode).
ORACLE_CHAR_ENTROPY = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_e,
       CASE WHEN length(text) = 0 THEN NULL
            ELSE round(
                log2(CAST(length(text) AS DOUBLE))
                - list_reduce(
                    list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(
                            list_distinct(list_transform(
                                range(1, length(text) + 1), i -> text[i])),
                            d -> CAST(len(list_filter(
                                    list_transform(range(1, length(text) + 1),
                                                   i -> text[i]),
                                    c -> c = d)) AS DOUBLE)
                                 * log2(CAST(len(list_filter(
                                    list_transform(range(1, length(text) + 1),
                                                   i -> text[i]),
                                    c -> c = d)) AS DOUBLE)))),
                    (acc, x) -> acc + x)
                  / CAST(length(text) AS DOUBLE), 6)
       END AS entropy
FROM documents
"""

# Connected components = transitive closure (recursive CTE) + min label.
# The Spark side computes the same fixpoint by min-label propagation.
ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({_minhash_oracle()}),
edges AS MATERIALIZED (
    -- MATERIALIZED: reach references edges per recursion round; an
    -- inlined edges would re-run the whole pair chain each round
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, min(lab) AS cluster
FROM reach GROUP BY node
"""

# Representative pick per near-dup cluster (queries.q_dedup_representatives):
# same transitive closure, then longest member (n_chars DESC, doc_id ASC).
ORACLE_DEDUP_REPRESENTATIVES = f"""
WITH RECURSIVE pairs AS ({_minhash_oracle()}),
edges AS MATERIALIZED (
    -- MATERIALIZED: reach references edges per recursion round; an
    -- inlined edges would re-run the whole pair chain each round
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
),
clusters AS (
    SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node
),
sized AS (
    SELECT c.cluster, c.doc_id, d.n_chars,
           row_number() OVER (
               PARTITION BY c.cluster
               ORDER BY d.n_chars DESC NULLS LAST, c.doc_id ASC) AS rn,
           count(*) OVER (PARTITION BY c.cluster) AS n_members
    FROM clusters c JOIN documents d USING (doc_id)
)
SELECT cluster, doc_id AS rep_doc_id, n_chars,
       CAST(n_members AS BIGINT) AS n_members
FROM sized WHERE rn = 1
ORDER BY cluster
"""


# Sketch-quality evaluation: the exact-Jaccard truth CTE vs the
# MinHash-LSH candidate CTE (both reused verbatim from their own
# oracles), full-outer-joined into one TP/FP/FN row.
ORACLE_LSH_QUALITY_REPORT = f"""
WITH truth AS ({_jaccard_oracle(3, 0.5)}),
cand AS ({_minhash_oracle()}),
j AS (
    SELECT t.id_a AS t_a, c.id_a AS c_a
    FROM truth t FULL JOIN cand c
      ON t.id_a = c.id_a AND t.id_b = c.id_b
)
SELECT CAST(count(t_a) AS BIGINT) AS n_truth,
       CAST(count(c_a) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN t_a IS NOT NULL AND c_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN t_a IS NULL AND c_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN t_a IS NOT NULL AND c_a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CASE WHEN count(c_a) > 0 THEN round(
           sum(CASE WHEN t_a IS NOT NULL AND c_a IS NOT NULL THEN 1 ELSE 0 END)
           / CAST(count(c_a) AS DOUBLE), 6) END AS precision,
       CASE WHEN count(t_a) > 0 THEN round(
           sum(CASE WHEN t_a IS NOT NULL AND c_a IS NOT NULL THEN 1 ELSE 0 END)
           / CAST(count(t_a) AS DOUBLE), 6) END AS recall
FROM j
"""


def _random_projection_oracle(dim: int = 64, out_dim: int = 16) -> str:
    """JL projection replay: the same h60-unit plane literals Spark
    embeds driver-side, dotted sequentially (list_reduce == the
    engine's aggregate fold), then the per-output-dimension profile."""
    comps = []
    for j in range(out_dim):
        plane = ", ".join(repr(_h60_unit(f"rp:{j}:{d}")) for d in range(dim))
        comps.append(f"{_dot('embedding', f'[{plane}]')}")
    proj = ", ".join(comps)
    return f"""
WITH p AS (
    SELECT vec_id, [{proj}] AS proj
    FROM embeddings WHERE embedding IS NOT NULL
), ex AS (
    SELECT unnest(generate_series(1, len(proj))) - 1 AS pos,
           CAST(unnest(proj) AS DOUBLE) AS v
    FROM p
)
SELECT CAST(pos AS INTEGER) AS pos, CAST(count(*) AS BIGINT) AS n,
       round(avg(v), 6) AS mean_v,
       round(stddev_pop(v), 6) AS sd_v,
       round(min(v), 6) AS min_v,
       round(max(v), 6) AS max_v
FROM ex GROUP BY pos ORDER BY pos
"""


ORACLE_RANDOM_PROJECTION_PROFILE = _random_projection_oracle()

# Synchronous label propagation (operators/graph.py:
# label_propagation): 4 unrolled mode-label iterations over the
# co-purchase edges — all-integer counting, min-label ties, the
# pagerank MATERIALIZED-CTE unrolling pattern.
ORACLE_LABEL_PROPAGATION = """
WITH per AS (
    SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
pair AS (
    SELECT a.i AS ia, c.i AS ib
    FROM per a JOIN per c ON a.b = c.b AND a.i < c.i
    GROUP BY 1, 2 HAVING count(*) >= 2
),
eb AS MATERIALIZED (
    SELECT ia AS s, ib AS d FROM pair
    UNION
    SELECT ib AS s, ia AS d FROM pair
),
l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS community FROM eb),
n0 AS (SELECT e.d AS node, l.community, count(*) AS c FROM eb e JOIN l0 l ON l.node = e.s GROUP BY 1, 2),
l1 AS MATERIALIZED (SELECT node, community FROM (SELECT node, community, row_number() OVER (PARTITION BY node ORDER BY c DESC, community ASC) AS rn FROM n0) WHERE rn = 1),
n1 AS (SELECT e.d AS node, l.community, count(*) AS c FROM eb e JOIN l1 l ON l.node = e.s GROUP BY 1, 2),
l2 AS MATERIALIZED (SELECT node, community FROM (SELECT node, community, row_number() OVER (PARTITION BY node ORDER BY c DESC, community ASC) AS rn FROM n1) WHERE rn = 1),
n2 AS (SELECT e.d AS node, l.community, count(*) AS c FROM eb e JOIN l2 l ON l.node = e.s GROUP BY 1, 2),
l3 AS MATERIALIZED (SELECT node, community FROM (SELECT node, community, row_number() OVER (PARTITION BY node ORDER BY c DESC, community ASC) AS rn FROM n2) WHERE rn = 1),
n3 AS (SELECT e.d AS node, l.community, count(*) AS c FROM eb e JOIN l3 l ON l.node = e.s GROUP BY 1, 2),
l4 AS MATERIALIZED (SELECT node, community FROM (SELECT node, community, row_number() OVER (PARTITION BY node ORDER BY c DESC, community ASC) AS rn FROM n3) WHERE rn = 1)
SELECT node, community FROM l4 ORDER BY node
"""

# Per-dimension embedding stats (operators/profiling.py:
# embedding_dim_profile): parallel unnest of (index, value), float
# widened to double before the moments. Spark's posexplode is 0-based.
ORACLE_EMBEDDING_DIM_PROFILE = """
WITH ex AS (
    SELECT unnest(generate_series(1, len(embedding))) - 1 AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings WHERE embedding IS NOT NULL
)
SELECT CAST(pos AS INTEGER) AS pos, CAST(count(*) AS BIGINT) AS n,
       round(avg(v), 6) AS mean_v,
       round(stddev_pop(v), 6) AS sd_v,
       round(min(v), 6) AS min_v,
       round(max(v), 6) AS max_v
FROM ex GROUP BY pos ORDER BY pos
"""

# Month-over-month growth per priority: lag over the bounded monthly
# aggregate; growth divides the ROUNDED 2dp sums (identical bigint-
# cent values on both engines), so the quotient is bit-identical.
ORACLE_GROWTH_RATES = """
WITH m AS (
    SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, order_month, n_orders, sum_price,
       round((sum_price - lag(sum_price) OVER w)
             / lag(sum_price) OVER w, 6) AS growth_pct
FROM m
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_month)
ORDER BY o_orderpriority, order_month
"""

# Association rules (operators/analytics.py:market_basket): the
# independent self-join formulation — per-order distinct items joined
# on the order key — vs the engine's per-basket pair expression.
# Ranking on ROUNDED lift/confidence + ids, both engines.
ORACLE_MARKET_BASKET = """
WITH per AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM per),
pair AS (
    SELECT a.i AS ia, c.i AS ib, CAST(count(*) AS BIGINT) AS s_ab
    FROM per a JOIN per c ON a.b = c.b AND a.i < c.i
    GROUP BY 1, 2 HAVING count(*) >= 2
),
dir AS (
    SELECT ia AS antecedent, ib AS consequent, s_ab FROM pair
    UNION ALL
    SELECT ib AS antecedent, ia AS consequent, s_ab FROM pair
),
sup AS (SELECT i, CAST(count(*) AS BIGINT) AS s FROM per GROUP BY i)
SELECT * FROM (
    SELECT d.antecedent, d.consequent, d.s_ab AS support_pair,
           sa.s AS s_ant, sb.s AS s_con,
           round(d.s_ab / sa.s, 6) AS confidence,
           round((d.s_ab * n.n_baskets) / (sa.s * sb.s), 6) AS lift
    FROM dir d
    JOIN sup sa ON sa.i = d.antecedent
    JOIN sup sb ON sb.i = d.consequent
    CROSS JOIN n
)
ORDER BY lift DESC, confidence DESC, antecedent, consequent
LIMIT 25
"""

# Vocabulary coverage curve (operators/curation.py:vocab_coverage):
# per-cutoff top-k sums over the term-count table, deterministic under
# count ties (ORDER BY c DESC, term).
ORACLE_VOCAB_COVERAGE = f"""
WITH t AS (SELECT unnest({_tok(_nrm('text'))}) AS term FROM documents),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM c),
ks AS (
    SELECT CAST(100 AS INTEGER) AS cutoff,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(c) AS BIGINT) AS covered_tokens
    FROM (SELECT c FROM c ORDER BY c DESC, term LIMIT 100)
    UNION ALL
    SELECT CAST(1000 AS INTEGER), CAST(count(*) AS BIGINT),
           CAST(sum(c) AS BIGINT)
    FROM (SELECT c FROM c ORDER BY c DESC, term LIMIT 1000)
    UNION ALL
    SELECT CAST(10000 AS INTEGER), CAST(count(*) AS BIGINT),
           CAST(sum(c) AS BIGINT)
    FROM (SELECT c FROM c ORDER BY c DESC, term LIMIT 10000)
)
SELECT cutoff, n_terms, covered_tokens, total_tokens,
       round(covered_tokens / CAST(total_tokens AS DOUBLE), 6) AS coverage
FROM ks CROSS JOIN tot
ORDER BY cutoff
"""

# Last-touch attribution: DuckDB's native ASOF JOIN vs the engine's
# union+window carry (as_of_join). Same (user, ts) touch ties resolve
# to the lexicographically-largest (channel, event_id) tuple on both
# engines — the as-of family's documented struct tie rule.
ORACLE_ATTRIBUTION_LAST_TOUCH = """
WITH p AS (
    SELECT user_id, ts, value AS p_value FROM events
    WHERE event_type = 'purchase'
), t0 AS (
    SELECT user_id, ts, event_type AS channel, event_id,
           row_number() OVER (PARTITION BY user_id, ts
               ORDER BY event_type DESC, event_id DESC) AS rn
    FROM events WHERE event_type <> 'purchase'
), t AS (SELECT user_id, ts, channel FROM t0 WHERE rn = 1),
att AS (
    SELECT p.p_value, t.channel
    FROM p ASOF LEFT JOIN t
      ON p.user_id = t.user_id AND p.ts >= t.ts
)
SELECT COALESCE(channel, 'none') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(p_value), 2) AS sum_value
FROM att GROUP BY 1 ORDER BY 1
"""

# Time-decay multi-touch attribution (operators/analytics.py:
# attribution_time_decay): day-bucketed weights are EXACT dyadic
# rationals 2^-d (d integer in [0,7) — the lower window bound is
# STRICT, so a touch exactly 7 days old is out and d=7 unreachable),
# the per-conversion denominator is an exact multiple of 2^-6, and
# credit is one IEEE divide — the only cross-engine float surface is
# the final per-channel sum, rounded 2 (the repo's sum convention).
ORACLE_ATTRIBUTION_TIME_DECAY = """
WITH base AS (
    SELECT * FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), c AS (
    SELECT user_id AS u, ts AS cts, event_id AS conv_id FROM base
    WHERE event_type = 'purchase'
), t AS (
    SELECT user_id AS u, ts AS tts, event_type AS channel FROM base
    WHERE event_type <> 'purchase'
), j AS (
    -- exact dyadic 2^-d via integer shift, mirroring the engine's
    -- 1.0 / shiftleft(1L, d) (no libm power on either side)
    SELECT t.channel, c.u, c.conv_id,
           1.0 / CAST(CAST(1 AS BIGINT) << CAST(floor(
               CAST(epoch_us(c.cts) - epoch_us(t.tts) AS DOUBLE)
               / 86400000000.0) AS INTEGER) AS DOUBLE) AS w
    FROM t JOIN c ON t.u = c.u
    WHERE t.tts < c.cts AND t.tts > c.cts - INTERVAL 7 DAY
), k AS (
    SELECT channel, w / sum(w) OVER (PARTITION BY u, conv_id) AS credit
    FROM j
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       round(sum(credit), 2) AS credit
FROM k GROUP BY channel ORDER BY channel
"""

# Hour-of-day seasonal anomaly cells (operators/analytics.py:
# seasonal_baseline): stats snapped to 6dp BEFORE the 3σ compare on
# both engines, so one-pass mean association drift can't flip a
# boundary row's flag.
ORACLE_SEASONAL_BASELINE = """
WITH base AS (
    SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
           value AS v
    FROM events WHERE value IS NOT NULL
), cells AS (
    SELECT event_type, hod,
           round(avg(v), 6) AS mean_value,
           round(stddev_pop(v), 6) AS sd_value
    FROM base GROUP BY event_type, hod
)
SELECT b.event_type, b.hod, CAST(count(*) AS BIGINT) AS n,
       min(c.mean_value) AS mean_value,
       min(c.sd_value) AS sd_value,
       CAST(sum(CASE WHEN c.sd_value > 0
                      AND abs(b.v - c.mean_value) > 3.0 * c.sd_value
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM base b JOIN cells c USING (event_type, hod)
GROUP BY b.event_type, b.hod
ORDER BY b.event_type, b.hod
"""

# Triangle census of the part co-purchase graph: the u<v<w three-way
# self-join — a DIFFERENT algorithm from the engine's degree-oriented
# wedge close, same count by symmetry. Edges are canonical (sorted
# part lists), support >= 2 orders.
ORACLE_TRIANGLE_COUNT = """
WITH po AS (
    SELECT l_orderkey,
           list_sort(list_distinct(list(l_partkey))) AS parts
    FROM lineitem GROUP BY l_orderkey
), pr AS (
    SELECT unnest(flatten(list_transform(range(1, len(parts)), i ->
        list_transform(range(i + 1, len(parts) + 1),
                       j -> [parts[i], parts[j]])))) AS p
    FROM po WHERE len(parts) >= 2
), e AS (
    SELECT p[1] AS u, p[2] AS v FROM pr
    GROUP BY 1, 2 HAVING count(*) >= 2
), nodes AS (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nodes GROUP BY node),
tri AS (
    SELECT CAST(count(*) AS BIGINT) AS n_tri
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
       (SELECT n_tri FROM tri) AS n_triangles,
       CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0
            THEN round(3.0 * (SELECT n_tri FROM tri)
                       / (SELECT sum(d * (d - 1) / 2) FROM deg), 6)
       END AS clustering
"""

# Per-source Gini concentration (operators/profiling.py:
# gini_concentration): ranks from the same (value, tiebreak) total
# order, BIGINT sums, and the sorted-rank identity with exactly two
# divides on exact integers — no float association to pin. NULL
# n_chars rows are dropped before ranking and the tiebreak pins
# NULLS FIRST, mirroring the engine (the two engines default to
# opposite NULL sort ends, so unfiltered NULLs would shift ranks).
ORACLE_SOURCE_CONCENTRATION = """
WITH ranked AS (
    SELECT source AS grp, CAST(n_chars AS BIGINT) AS x,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars ASC, doc_id ASC NULLS FIRST) AS rk
    FROM documents
    WHERE n_chars IS NOT NULL
), agg AS (
    SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(x) AS BIGINT) AS sum_value,
           CAST(sum(rk * x) AS BIGINT) AS si
    FROM ranked GROUP BY grp
)
SELECT grp AS source, n_rows, sum_value,
       CASE WHEN sum_value > 0
            THEN round(2.0 * si / (n_rows * sum_value)
                       - (n_rows + 1.0) / n_rows, 6)
            ELSE 0.0 END AS gini
FROM agg
"""

# Per-node local clustering coefficient over the same co-purchase
# edges as ORACLE_TRIANGLE_COUNT, recounted by the INDEPENDENT u<v<w
# three-way self-join (each triangle appears once with x<y<z, then
# credits its three vertices). Integer counts are bit-exact; lcc is
# one divide, round 6; deg<2 nodes pin lcc = 0.0 like the engine.
ORACLE_CLUSTERING_COEFFICIENTS = """
WITH po AS (
    SELECT l_orderkey,
           list_sort(list_distinct(list(l_partkey))) AS parts
    FROM lineitem GROUP BY l_orderkey
), pr AS (
    SELECT unnest(flatten(list_transform(range(1, len(parts)), i ->
        list_transform(range(i + 1, len(parts) + 1),
                       j -> [parts[i], parts[j]])))) AS p
    FROM po WHERE len(parts) >= 2
), e AS (
    SELECT p[1] AS u, p[2] AS v FROM pr
    GROUP BY 1, 2 HAVING count(*) >= 2
), nodes AS (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nodes GROUP BY node),
tris AS (
    SELECT e1.u AS x, e1.v AS y, e2.v AS z
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), tnodes AS (
    SELECT unnest([x, y, z]) AS node FROM tris
), tcnt AS (
    SELECT node, CAST(count(*) AS BIGINT) AS t FROM tnodes GROUP BY node
)
SELECT deg.node, deg.d AS degree,
       COALESCE(tcnt.t, 0) AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN round(2.0 * COALESCE(tcnt.t, 0) / (deg.d * (deg.d - 1)), 6)
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN tcnt USING (node)
"""

# One BPE iteration's merge-candidate table (operators/analytics.py:
# bpe_merge_pairs): ordered adjacent char pairs within words.
ORACLE_BPE_MERGES = f"""
WITH t AS (SELECT {_tok(_nrm('text'))} AS toks FROM documents),
w AS (SELECT unnest(toks) AS w FROM t WHERE len(toks) >= 1),
p AS (
    SELECT unnest(list_transform(range(1, length(w)),
                                 i -> [w[i], w[i + 1]])) AS pr
    FROM w WHERE length(w) >= 2
)
SELECT * FROM (
    SELECT pr[1] AS c_a, pr[2] AS c_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1, 2 HAVING count(*) >= 2
)
ORDER BY n_pairs DESC, c_a, c_b
LIMIT 25
"""

# Hard-negative mining (operators/similarity.py:hard_negatives):
# cosine_topk's scoring with the null-safe label-differs predicate.
ORACLE_HARD_NEGATIVES = f"""
WITH e AS (
    SELECT vec_id, label, embedding,
           sqrt({_dot("embedding", "embedding")}) AS nrm
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           c.label AS neighbor_label,
           CASE WHEN q.nrm * c.nrm = 0 THEN NULL
                ELSE {_dot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) END AS score
    FROM e q JOIN e c
      ON q.vec_id < 10 AND q.vec_id <> c.vec_id
     AND c.label IS DISTINCT FROM q.label
), ranked AS (
    SELECT query_id, neighbor_id, neighbor_label, score,
           row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC NULLS LAST, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, neighbor_label,
       round(score, 6) AS score, CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 3
"""

# Independent-algorithm oracle for the Bloom-pruned join: the plain
# join. A Bloom filter admits no false negatives and the exact join
# removes its false positives, so the pruned plan's RESULT must equal
# the unpruned join bit for bit — the prune is pure physical-plan
# optimization (operators/relational.py:bloom_prune_join).
ORACLE_BLOOM_PRUNE_JOIN = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#4'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# Per-key CUSUM drift (operators/analytics.py:cusum_changepoint):
# the same strictly-sequential fold over the (ts, event_id)-ordered
# value list — list_reduce runs left-to-right exactly like Spark's
# aggregate, so the float path is engine-identical without rounding
# any intermediate.
ORACLE_CUSUM_CHANGEPOINT = """
WITH seq AS (
    -- NULLS FIRST pins the fold order to Spark's array_sort struct
    -- ordering (NULL ts sorts first there); DuckDB's default is
    -- NULLS LAST, which would fold NULL-ts rows in a different
    -- position. The streaming twin also sorts na_position='first'.
    SELECT user_id,
           list(value ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS vals
    FROM events WHERE value IS NOT NULL GROUP BY user_id
), m AS (
    SELECT user_id, vals, len(vals) AS n,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                       (a, x) -> a + x) / len(vals) AS mean
    FROM seq
), f AS (
    -- field ORDER is load-bearing: DuckDB 1.0 list_reduce evaluates
    -- struct fields left-to-right with the accumulator already
    -- mutated (a.su read inside a later field sees the NEW su).
    -- Putting the max-trackers (mu, md) BEFORE the sums they read
    -- (su, sd) makes every field read only not-yet-reassigned
    -- fields — identical results under mutation AND snapshot
    -- semantics, so it matches Spark's snapshot fold exactly.
    SELECT user_id, n, mean,
           list_reduce(
               list_prepend(
                   {'v': CAST(0.0 AS DOUBLE),
                    'mu': CAST(0.0 AS DOUBLE), 'md': CAST(0.0 AS DOUBLE),
                    'su': CAST(0.0 AS DOUBLE), 'sd': CAST(0.0 AS DOUBLE)},
                   list_transform(vals, v ->
                       {'v': v,
                        'mu': CAST(0.0 AS DOUBLE), 'md': CAST(0.0 AS DOUBLE),
                        'su': CAST(0.0 AS DOUBLE), 'sd': CAST(0.0 AS DOUBLE)})),
               (a, x) -> {
                   'v': x.v,
                   'mu': greatest(a.mu,
                       greatest(0.0, a.su + (x.v - mean - 0.1 * abs(mean)))),
                   'md': greatest(a.md,
                       greatest(0.0, a.sd + (mean - x.v - 0.1 * abs(mean)))),
                   'su': greatest(0.0, a.su + (x.v - mean - 0.1 * abs(mean))),
                   'sd': greatest(0.0, a.sd + (mean - x.v - 0.1 * abs(mean)))
               }) AS r
    FROM m
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(mean, 6) AS mean_value,
       round(r.mu, 6) AS cusum_up,
       round(r.md, 6) AS cusum_dn,
       CASE WHEN round(r.mu, 6) = 0.0 AND round(r.md, 6) = 0.0 THEN 'none'
            WHEN round(r.mu, 6) >= round(r.md, 6) THEN 'up'
            ELSE 'dn' END AS direction
FROM f
"""

# Within-domain quality ranks (operators/curation.py:
# domain_quality_rank): text_stats' quality expression, then
# percent_rank/ntile over the (rounded score, doc_id) total order —
# deterministic tie-break, identical rank semantics both engines.
ORACLE_DOMAIN_QUALITY_RANK = f"""
WITH base AS (
    SELECT doc_id, source, {_tok(_nrm('text'))} AS tok, {_nrm('text')} AS nrm
    FROM documents WHERE text IS NOT NULL
), m AS (
    SELECT doc_id, source,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS mtl,
           CASE WHEN length(nrm) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace(nrm, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                     / CAST(length(nrm) AS DOUBLE)
           END AS pr,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST({_stop_hits("tok", "en")} AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS swr
    FROM base
), q AS (
    SELECT doc_id, source,
           round(((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN swr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 6) AS quality
    FROM m
)
SELECT doc_id, source, quality,
       round(percent_rank() OVER (
           PARTITION BY source ORDER BY quality ASC, doc_id ASC), 6)
           AS pct_rank,
       CAST(ntile(10) OVER (
           PARTITION BY source ORDER BY quality ASC, doc_id ASC) AS INTEGER)
           AS decile
FROM q
"""

# n-gram novelty vs a reference half (operators/curation.py:
# ngram_novelty): distinct 3-gram shingles, left join against the
# reference's distinct shingle set, shingle-less docs → NULL novelty.
ORACLE_NGRAM_NOVELTY = f"""
WITH tgt AS (
    SELECT doc_id,
           list_distinct({_shingles(_tok(_nrm('text')), 3)}) AS sh
    FROM documents WHERE doc_id % 2 = 1
), ref AS (
    SELECT DISTINCT unnest(
        list_distinct({_shingles(_tok(_nrm('text')), 3)})) AS s
    FROM documents WHERE doc_id % 2 = 0
), ref_ne AS (SELECT s FROM ref WHERE s <> ''),
ex AS (SELECT doc_id, unnest(sh) AS s FROM tgt),
hits AS (
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(r.s) AS BIGINT) AS n_seen
    FROM ex e LEFT JOIN ref_ne r USING (s)
    GROUP BY e.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shingles, 0) AS n_shingles,
       COALESCE(h.n_seen, 0) AS n_seen,
       CASE WHEN COALESCE(h.n_shingles, 0) = 0 THEN NULL
            ELSE round(1.0 - h.n_seen / CAST(h.n_shingles AS DOUBLE), 6)
       END AS novelty
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN hits h USING (doc_id)
"""

# First-digit Benford screen (operators/profiling.py:benford_profile):
# cent-grid snap + bigint→string leading digit, shares over the 9-row
# digit frame. bigint→VARCHAR never goes scientific, so the digit is
# engine-portable where a float log10 would not be.
ORACLE_BENFORD_PROFILE = """
WITH d AS (
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INTEGER) AS digit
    FROM orders
    -- mirror the engine's cent-grid guard exactly (round(x*100) >= 1),
    -- not a raw positivity test: a positive value below half a cent
    -- snaps to digit 0, which the engine drops
    WHERE o_totalprice IS NOT NULL
      AND CAST(round(o_totalprice * 100) AS BIGINT) >= 1
), c AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
), t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT digit, n,
       round(n / total, 6) AS observed_p,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
       round(abs(n / total - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
FROM c CROSS JOIN t
ORDER BY digit
"""

# Winsorized per-group moments (operators/profiling.py:
# winsorized_stats): quantile_cont == Spark exact percentile (proven
# hash-green), stddev_pop one-pass parity per value_percentiles.
ORACLE_WINSORIZED_STATS = """
WITH base AS (
    SELECT o_orderpriority AS k, o_totalprice AS v
    FROM orders WHERE o_totalprice IS NOT NULL
), b AS (
    SELECT k, quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
    FROM base GROUP BY k
), c AS (
    SELECT base.k, v, greatest(least(v, hi), lo) AS w, lo, hi
    FROM base JOIN b USING (k)
)
SELECT k AS o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(min(lo), 2) AS p_lo, round(min(hi), 2) AS p_hi,
       round(avg(v), 2) AS mean_raw, round(avg(w), 2) AS mean_winsor,
       round(stddev_pop(v), 2) AS sd_raw,
       round(stddev_pop(w), 2) AS sd_winsor
FROM c GROUP BY k ORDER BY k
"""

# Cluster-aware train/val split (operators/curation.py:
# leakage_safe_split): same transitive closure as dedup_clusters, then
# singleton coalesce + per-cluster size window + the h60 'split' bucket
# keyed on the CLUSTER id (every member draws the same side).
ORACLE_LEAKAGE_SAFE_SPLIT = f"""
WITH RECURSIVE pairs AS ({_minhash_oracle()}),
edges AS MATERIALIZED (
    -- MATERIALIZED: reach references edges per recursion round; an
    -- inlined edges would re-run the whole pair chain each round
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
),
clusters AS (
    SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node
),
with_cluster AS (
    SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
    FROM documents d LEFT JOIN clusters c USING (doc_id)
)
SELECT doc_id, cluster,
       CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members,
       CASE WHEN {_h60("'split:' || CAST(cluster AS VARCHAR)")} % 10000 < 2000
            THEN 'val' ELSE 'train' END AS split
FROM with_cluster
ORDER BY doc_id
"""

# Skip-gram co-occurrence (operators/analytics.py:skipgram_cooc): the
# same per-row pair expression, built with DuckDB list lambdas.
ORACLE_SKIPGRAM_COOC = f"""
WITH t AS (SELECT {_tok(_nrm('text'))} AS toks FROM documents),
t2 AS (SELECT toks FROM t WHERE len(toks) >= 2),
p0 AS (
    SELECT unnest(flatten(list_transform(range(1, len(toks) + 1), i ->
           list_transform(list_filter(range(1, 5), d -> i + d <= len(toks)),
                          d -> [toks[i], toks[i + d]])))) AS pr
    FROM t2
)
SELECT * FROM (
    SELECT least(pr[1], pr[2]) AS w_a, greatest(pr[1], pr[2]) AS w_b,
           CAST(count(*) AS BIGINT) AS n_cooc
    FROM p0 WHERE pr[1] <> pr[2]
    GROUP BY 1, 2
    HAVING count(*) >= 2
)
ORDER BY n_cooc DESC, w_a, w_b
LIMIT 25
"""

ORACLE_PRICE_TIERS = """
WITH tiers(tier, lo, hi) AS (VALUES
    ('T0', 0.0, 50000.0), ('T1', 50000.0, 150000.0),
    ('T2', 150000.0, 300000.0), ('T3', 300000.0, 1e18))
SELECT tier, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
"""

# Salted join must produce exactly the plain-join aggregate.
ORACLE_SALTED_BRAND_JOIN = """
SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

ORACLE_SEGMENT_OVERLAP = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT relation, count(*) AS n_nations
FROM (
    SELECT nationkey, 'both' AS relation FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'customer_only' AS relation FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
)
GROUP BY relation
"""

ORACLE_CUBE_FLAGS = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(avg(l_discount), 6) AS avg_disc
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLE_THUMBNAIL_KEYS = """
SELECT concat_ws('/', substring(id, 1, 1), substring(id, 2, 1),
                 substring(id, 3, 1), substring(id, 4, 1),
                 id || '.jpg') AS key
FROM (SELECT CAST(doc_id AS VARCHAR) AS id FROM documents)
"""


# Batch twin of the stream-stream interval join (state bound = the
# same interval predicate).
ORACLE_INTERVAL_JOIN = """
SELECT p.event_id AS l_event_id, c.event_id AS r_event_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts > p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


# Token-window chunking: stride 48 = 64 - 16; chunk count
# max(1, ceil((n-16)/48)) for non-empty docs, 1-based list slices.
ORACLE_DOC_CHUNKS = f"""
WITH {_DOC_TOK_CTE}, c AS (
    SELECT doc_id, CAST(len(tok) AS BIGINT) AS n, tok
    FROM doc_tok WHERE len(tok) > 0
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_no,
       array_to_string(tok[i*48+1 : i*48+64], ' ') AS chunk_text,
       CAST(least(64, n - i*48) AS BIGINT) AS n_tokens
FROM c, UNNEST(range(greatest(1, (n - 16 + 47) // 48))) AS t(i)
"""


# Greedy sequence packing replayed exactly: the per-group sequential
# walk is a recursive CTE stepping one item at a time (depth = max
# chunks per source — fine at oracle SFs), matching pack_sequences'
# open-new-bin-when-budget-exceeded rule; `running > 0` is vacuous
# after item 1 because every chunk has >= 1 token.
ORACLE_PACKED_BINS = f"""
WITH RECURSIVE {_DOC_TOK_CTE}, c AS (
    SELECT doc_id, CAST(len(tok) AS BIGINT) AS n
    FROM doc_tok WHERE len(tok) > 0
), chunks AS (
    SELECT d.source, c.doc_id,
           CAST(i AS INT) AS chunk_no,
           CAST(least(64, n - i*48) AS BIGINT) AS n_tokens
    FROM c JOIN documents d USING (doc_id),
         UNNEST(range(greatest(1, (n - 16 + 47) // 48))) AS t(i)
), items AS (
    SELECT source, doc_id, chunk_no, n_tokens,
           row_number() OVER (PARTITION BY source ORDER BY doc_id, chunk_no) AS rn
    FROM chunks
), walk AS (
    SELECT source, n_tokens, rn, CAST(0 AS BIGINT) AS bin,
           n_tokens AS running
    FROM items WHERE rn = 1
    UNION ALL
    SELECT i.source, i.n_tokens, i.rn,
           CASE WHEN w.running + i.n_tokens > 512 THEN w.bin + 1
                ELSE w.bin END,
           CASE WHEN w.running + i.n_tokens > 512 THEN i.n_tokens
                ELSE w.running + i.n_tokens END
    FROM items i JOIN walk w ON i.source = w.source AND i.rn = w.rn + 1
)
SELECT source AS "group", bin,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM walk GROUP BY source, bin
"""


ORACLE_STRATIFIED_SAMPLE = """
SELECT source, count(*) AS n_docs, min(doc_id) AS min_doc
FROM documents
WHERE CAST(concat('0x', substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 <
      CASE source WHEN 'src2' THEN 1000 WHEN 'src1' THEN 5000
                  WHEN 'src0' THEN 8000 ELSE 2500 END
GROUP BY source
"""


def _zorder_oracle(bits: int = 8) -> str:
    terms = []
    for i, c in enumerate(("xb", "yb")):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * 2 + i})")
    z = " | ".join(terms)
    return f"""
WITH buckets AS (
    SELECT event_id,
           CAST(least(255, greatest(0, CAST(floor((CAST(value AS DOUBLE) - 0.0) / 100.0 * 256) AS BIGINT))) AS BIGINT) AS xb,
           CAST(user_id % 256 AS BIGINT) AS yb
    FROM events
)
SELECT event_id, xb, yb, CAST({z} AS BIGINT) AS zkey FROM buckets
"""


ORACLE_ZORDER_EVENTS = _zorder_oracle()

ORACLE_APPLY_CHANGESET = """
WITH snap AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
), marked AS (
    SELECT *, o_orderkey % 10 AS m FROM snap WHERE o_orderkey % 10 < 3
), changes AS (
    SELECT CASE WHEN m = 2 THEN o_orderkey + 100000000 ELSE o_orderkey END AS o_orderkey,
           o_custkey, o_orderstatus,
           CASE WHEN m = 1 THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
           CASE WHEN m = 0 THEN 'D' WHEN m = 1 THEN 'U' ELSE 'I' END AS op
    FROM marked
)
SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 6) AS o_totalprice
FROM snap WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 6) AS o_totalprice
FROM changes WHERE op <> 'D'
"""

ORACLE_SKEW_REPORT = """
WITH counts AS (
    SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
), total AS (SELECT count(*) AS t FROM events)
SELECT user_id, n_rows,
       round(CAST(n_rows AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
FROM counts, total
ORDER BY n_rows DESC, user_id ASC
LIMIT 20
"""

ORACLE_CORPUS_REPORT = f"""
WITH {_DOC_TOK_CTE}, per AS (
    SELECT source,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS mtl,
           CASE WHEN length({_nrm("text")}) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace({_nrm("text")}, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                     / CAST(length({_nrm("text")}) AS DOUBLE)
           END AS pr,
           CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST({_stop_hits("tok", "en")} AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END AS swr,
           md5(array_to_string(list_sort(list_distinct(tok)), ' ')) AS fp
    FROM doc_tok
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(mtl), 6) AS avg_token_len,
       round(avg(pr), 6) AS avg_punct_ratio,
       round(avg(swr), 6) AS avg_stopword_ratio,
       count(DISTINCT fp) AS n_distinct_docs,
       round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM per
GROUP BY source
"""

ORACLE_DECONTAMINATE = f"""
WITH {_DOC_TOK_CTE}, sh AS (
    SELECT doc_id, list_distinct({_shingles("tok", 3)}) AS sh
    FROM doc_tok
), bench AS (
    SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 97 = 0
), corpus AS (
    SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE doc_id % 97 <> 0
), hits AS (
    SELECT c.doc_id, count(*) AS n_hits
    FROM corpus c JOIN bench USING (shingle)
    GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) >= 1 AS contaminated
FROM doc_tok d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""

ORACLE_QUALITY_GATE = f"""
WITH {_DOC_TOK_CTE}, m AS (
    SELECT doc_id, source,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           round(CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END, 6) AS mean_token_len,
           round(CASE WHEN len(tok) = 0 THEN 0.0
                ELSE CAST({_stop_hits("tok", "en")} AS DOUBLE) / CAST(len(tok) AS DOUBLE)
           END, 6) AS stopword_ratio,
           round(CASE WHEN length({_nrm("text")}) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace({_nrm("text")}, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                     / CAST(length({_nrm("text")}) AS DOUBLE)
           END, 6) AS punct_ratio,
           round(CASE WHEN len({_shingles("tok", 2)}) <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct({_shingles("tok", 2)})) AS DOUBLE)
                           / CAST(len({_shingles("tok", 2)}) AS DOUBLE)
           END, 6) AS repetition_ratio
    FROM doc_tok
)
SELECT doc_id, source, n_tokens, mean_token_len, stopword_ratio,
       punct_ratio, repetition_ratio
FROM m
WHERE n_tokens >= 5 AND n_tokens <= 100000
  AND mean_token_len >= 2.0 AND mean_token_len <= 12.0
  AND punct_ratio <= 0.2
  AND stopword_ratio >= 0.0
  AND repetition_ratio <= 0.6
"""

#: whitespace token count (functions.text.token_count twin)
_WS_TOKENS = (
    "CAST(CASE WHEN trim(lower(text)) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS BIGINT)"
)

#: the pinned language-mixture config (queries.MIXTURE_WEIGHTS twin);
#: cast because DuckDB types bare decimal literals as DECIMAL, not DOUBLE
_MIXTURE_CASE = (
    "CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2 WHEN 'fr' THEN 0.15 "
    "WHEN 'es' THEN 0.1 WHEN 'zh' THEN 0.05 ELSE 0.0 END AS DOUBLE)"
)

_MIXTURE_PLAN_CTE = f"""
WITH totals AS (
    SELECT lang AS domain,
           CAST(sum({_WS_TOKENS}) AS BIGINT) AS n_tokens,
           {_MIXTURE_CASE} AS weight
    FROM documents GROUP BY lang
), plan AS (
    SELECT domain, n_tokens, weight,
           CAST(floor(10000 * weight) AS BIGINT) AS target_tokens,
           CASE WHEN n_tokens > 0 THEN
               least(CAST(1000000 AS BIGINT),
                     CAST(floor(CAST(floor(10000 * weight) AS BIGINT)
                                * 1000000.0 / n_tokens) AS BIGINT))
           ELSE CAST(0 AS BIGINT) END AS rate_ppm
    FROM totals
)
"""

ORACLE_MIXTURE_PLAN = f"""
{_MIXTURE_PLAN_CTE}
SELECT domain, n_tokens, weight, target_tokens, rate_ppm FROM plan
"""

ORACLE_MIXTURE_SAMPLE = f"""
{_MIXTURE_PLAN_CTE}
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN plan p ON d.lang = p.domain
WHERE {_h60("concat_ws('|', 'mix0', CAST(d.doc_id AS VARCHAR))")} % 1000000
      < p.rate_ppm
"""

# Hourly resample + forward-fill; generate_series is inclusive of both
# endpoints like Spark's sequence, and last_value IGNORE NULLS mirrors
# F.last(ignorenulls=True) over the same frame.
ORACLE_GAP_FILL = """
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS hr, round(sum(value), 6) AS v
    FROM events GROUP BY 1, 2
), spans AS (
    SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY user_id
), grid AS (
    SELECT s.user_id, g.hr
    FROM spans s, LATERAL (
        SELECT unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS hr
    ) g
)
SELECT g.user_id,
       epoch_us(g.hr) AS hr_us,
       h.v IS NOT NULL AS observed,
       last_value(h.v IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled
FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr
"""

# Wide→long unpivot: UNION ALL keeps the oracle ANSI-portable and the
# metric labels identical to Spark's unpivot output.
ORACLE_MELT_METRICS = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
       round(CAST(l_quantity AS DOUBLE), 6) AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       round(CAST(l_extendedprice AS DOUBLE), 6) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       round(CAST(l_discount AS DOUBLE), 6) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax',
       round(CAST(l_tax AS DOUBLE), 6) FROM lineitem
"""

# Keep-first sentence dedup + ordered reassembly; string_agg skips the
# non-kept NULLs and coalesce('') matches Spark's array_join([]) = ''.
ORACLE_SENTENCE_DEDUP = """
WITH p AS (
    SELECT doc_id, string_split(coalesce(text, ''), '. ') AS parts
    FROM documents
), s AS (
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, parts[i] AS sent
    FROM p, LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i) t
), ranked AS (
    SELECT doc_id, pos, sent,
           row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos) AS occ
    FROM s
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN occ <= 1 THEN sent END, '. ' ORDER BY pos),
                '') AS text,
       count(*) AS n_sentences,
       count(*) - count(CASE WHEN occ <= 1 THEN 1 END) AS n_dropped
FROM ranked GROUP BY doc_id
"""

# Self-fit smoothed unigram LM; log2(c+1) - log2(N+V) mirrors the
# Spark subtraction form exactly (no division-order float drift).
ORACLE_LM_SCORES = """
WITH terms AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents WHERE trim(lower(text)) <> ''
), counts AS (
    SELECT term, CAST(count(*) AS BIGINT) AS c FROM terms GROUP BY term
), stats AS (
    SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
    FROM counts
)
SELECT t.doc_id, count(*) AS n_terms,
       round(avg(log2(c + 1.0) - log2(n + 1.0 * v)), 6) AS lm_score
FROM terms t JOIN counts USING (term) CROSS JOIN stats
GROUP BY t.doc_id
"""

ORACLE_DOMAIN_CAP = """
SELECT doc_id, lang, n_chars, rank_in_domain FROM (
    SELECT doc_id, lang, n_chars,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY n_chars DESC, doc_id)
                AS INTEGER) AS rank_in_domain
    FROM documents
) WHERE rank_in_domain <= 25
"""

ORACLE_GLOBAL_SHUFFLE = f"""
SELECT doc_id,
       {_h60("concat_ws('|', 'seed0', CAST(doc_id AS VARCHAR))")} AS shuffle_key,
       CAST({_h60("concat_ws('|', 'seed0', CAST(doc_id AS VARCHAR))")} % 8 AS INT) AS shard
FROM documents
"""

# --- round-5 additions: spans / sequence analytics / classifier -----------


def _duplicate_spans_oracle(k: int = 8, min_docs: int = 2) -> str:
    gram = _h60(f"array_to_string(tok[i+1:i+{k}], ' ')")
    return f"""
WITH {_DOC_TOK_CTE}, c AS (
    SELECT doc_id, tok, len(tok) AS n FROM doc_tok WHERE len(tok) >= {k}
), w AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, {gram} AS g
    FROM c, UNNEST(range(n - {k} + 1)) AS t(i)
), dup AS (
    SELECT g FROM w GROUP BY g HAVING count(DISTINCT doc_id) >= {min_docs}
), hit AS (
    SELECT w.doc_id, w.pos FROM w JOIN dup USING (g)
), isl AS (
    SELECT doc_id, pos,
           sum(CASE WHEN prev IS NULL OR pos > prev + {k} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM (SELECT doc_id, pos,
                 lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM hit)
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {k} AS BIGINT) AS span_end,
       CAST(max(pos) + {k} - min(pos) AS BIGINT) AS span_tokens
FROM isl GROUP BY doc_id, island
"""


ORACLE_DUPLICATE_SPANS = _duplicate_spans_oracle()


def _funnel_oracle(steps: tuple = ("signup", "view", "click", "purchase")) -> str:
    # chained strict-min CTEs: u_i = first step-i event strictly after
    # the user's stage-(i-1) timestamp — the N-pass formulation the
    # Spark fold-aggregate collapses into one pass.
    # ts IS NOT NULL mirrors the engine: NULL-ts events never enter a
    # time-ordered funnel (the i>=2 CTEs exclude them implicitly via
    # the strict > join; stage 1 must match)
    ctes = [
        f"u1 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' AND ts IS NOT NULL GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"u{i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN u{i} ON e.user_id = u{i}.user_id AND e.ts > u{i}.t "
            f"WHERE e.event_type = '{steps[i]}' GROUP BY e.user_id)"
        )
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS stage, '{s}' AS step, "
        f"(SELECT count(*) FROM u{i + 1}) AS n_users"
        for i, s in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows


ORACLE_FUNNEL_STAGES = _funnel_oracle()


ORACLE_SCD2_HISTORY = """
WITH ordered AS (
    SELECT user_id, ts, event_type, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
), changed AS (
    SELECT user_id, ts, event_type, event_id
    FROM ordered WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id,
       event_type AS attr_value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM changed
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


ORACLE_RETENTION_COHORTS = """
WITH w AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id))
                AS TIMESTAMP) AS cohort_week,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
    FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM w GROUP BY cohort_week, week_offset
"""


ORACLE_USER_RUNNING_ANOMALY = """
SELECT event_id, user_id,
       round(CASE WHEN cnt >= 5 AND sd > 0 THEN (value - mu) / sd END, 6) AS zscore,
       (CASE WHEN cnt >= 5 AND sd > 0
             THEN abs((value - mu) / sd) > 3.0 ELSE FALSE END) AS is_anomaly
FROM (
    SELECT event_id, user_id, value,
           count(value) OVER w AS cnt,
           avg(value) OVER w AS mu,
           stddev_pop(value) OVER w AS sd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
"""


def _classifier_oracle() -> str:
    from batch_process_dpla_index_spark.functions.classifier import (
        BIAS,
        term_weights,
    )

    cases = " ".join(
        f"WHEN '{t}' THEN CAST({w!r} AS DOUBLE)"
        for t, w in sorted(term_weights().items())
    )
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(tok, t -> CASE t {cases} ELSE CAST(0.0 AS DOUBLE) END)), "
        "(acc, x) -> acc + x)"
    )
    return f"""
WITH {_DOC_TOK_CTE}, scored AS (
    SELECT doc_id,
           1.0 / (1.0 + exp(-(CASE WHEN len(tok) > 0
                                   THEN CAST({BIAS!r} AS DOUBLE) + {fold} / len(tok)
                                   ELSE 0.0 END))) AS score
    FROM doc_tok
)
SELECT doc_id, round(score, 6) AS quality_prob, score >= 0.5 AS keep
FROM scored
"""


ORACLE_QUALITY_CLASSIFIER = _classifier_oracle()


def _containment_oracle(
    n: int = 3, threshold: float = 0.6, max_posting: int = 1000
) -> str:
    # mirrors the operator's hot-posting-list defuse (see
    # _jaccard_oracle note) — required for parity at any fixture where
    # a shingle's doc frequency exceeds the cap
    return f"""
WITH {_DOC_TOK_CTE}, sets AS (
    SELECT doc_id, list_distinct({_shingles("tok", n)}) AS sh
    FROM doc_tok
), all_posts AS (
    SELECT doc_id AS id, len(sh) AS sz, unnest(sh) AS shingle FROM sets
), posts AS (
    SELECT * FROM all_posts
    WHERE shingle NOT IN (
        SELECT shingle FROM all_posts GROUP BY shingle
        HAVING count(*) > {max_posting})
), inter AS (
    SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b, count(*) AS n_common
    FROM posts a JOIN posts b USING (shingle)
    WHERE a.id < b.id
    GROUP BY a.id, b.id, a.sz, b.sz
)
SELECT id_a, id_b,
       round(CAST(n_common AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE), 6)
           AS containment
FROM inter
WHERE CAST(n_common AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE) >= {threshold}
"""


ORACLE_CONTAINMENT_PAIRS = _containment_oracle()


ORACLE_EVENT_TRANSITIONS = """
WITH pairs AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
    FROM events
), counts AS (
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / sum(n_transitions) OVER (PARTITION BY from_type), 6)
           AS p_transition
FROM counts
"""


ORACLE_TOKENIZER_FERTILITY = rf"""
WITH per_doc AS (
    SELECT lang,
           CAST(length(text) AS BIGINT) AS n_chars_t,
           -- shared _nrm/_tok twins of functions.text.tokens (regex
           -- trim, NOT bare trim: boundary tabs/newlines must not
           -- grow empty tokens)
           CAST(len({_tok(_nrm('text'))}) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(lower(text),
                '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))
                AS BIGINT) AS n_bpe
    FROM documents
)
SELECT lang,
       -- CAST: DuckDB sum(BIGINT) is HUGEINT, which the driver's
       -- canonicalization hashes differently than Spark's BIGINT
       CAST(sum(n_chars_t) AS BIGINT) AS sum_chars,
       CAST(sum(n_ws) AS BIGINT) AS sum_words,
       CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
       round(CAST(sum(n_chars_t) AS DOUBLE) / CAST(sum(n_ws) AS DOUBLE), 6)
           AS chars_per_word,
       round(CAST(sum(n_chars_t) AS DOUBLE) / CAST(sum(n_bpe) AS DOUBLE), 6)
           AS chars_per_bpe,
       round(CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_ws) AS DOUBLE), 6)
           AS fertility
FROM per_doc GROUP BY lang
"""


ORACLE_NEAREST_PURCHASE = """
WITH pur AS (
    -- max() per (user, ts) pins the duplicate-timestamp tie to the
    -- same winner as the engine's largest-value-struct rule; DuckDB's
    -- native ASOF has no defined tie order of its own
    SELECT user_id, ts, max(round(value, 6)) AS purchase_value,
           epoch_us(ts) AS rts
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
), b AS (
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS lts,
           r.purchase_value AS pv, r.rts
    FROM events l
    ASOF LEFT JOIN pur r ON l.user_id = r.user_id AND l.ts >= r.ts
), f AS (
    SELECT l.event_id, r.purchase_value AS nv, r.rts AS nrts
    FROM events l
    ASOF LEFT JOIN pur r ON l.user_id = r.user_id AND l.ts <= r.ts
)
SELECT b.event_id, b.user_id,
       CASE WHEN f.nrts IS NULL THEN b.pv
            WHEN b.rts IS NULL THEN f.nv
            WHEN b.lts - b.rts <= f.nrts - b.lts THEN b.pv
            ELSE f.nv END AS purchase_value,
       CASE WHEN f.nrts IS NULL THEN b.rts - b.lts
            WHEN b.rts IS NULL THEN f.nrts - b.lts
            WHEN b.lts - b.rts <= f.nrts - b.lts THEN b.rts - b.lts
            ELSE f.nrts - b.lts END AS matched_delta_us
FROM b JOIN f USING (event_id)
"""


ORACLE_BIGRAM_PMI = f"""
WITH {_DOC_TOK_CTE}, uni AS (
    SELECT w, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT unnest(tok) AS w FROM doc_tok) GROUP BY w
), bigr AS (
    SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab
    FROM (SELECT unnest({_shingles("tok", 2)}) AS bigram FROM doc_tok)
    WHERE len(string_split(bigram, ' ')) = 2
    GROUP BY bigram
), nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
nb AS (
    SELECT CAST(count(*) AS BIGINT) AS nb
    FROM (SELECT unnest({_shingles("tok", 2)}) AS bigram FROM doc_tok)
    WHERE len(string_split(bigram, ' ')) = 2
)
SELECT bigram, c_ab, a.c AS c_a, b.c AS c_b,
       round(log2((CAST(c_ab AS DOUBLE) / nb)
                  / ((CAST(a.c AS DOUBLE) / nu) * (CAST(b.c AS DOUBLE) / nu))),
             6) AS pmi
FROM bigr
JOIN uni a ON string_split(bigram, ' ')[1] = a.w
JOIN uni b ON string_split(bigram, ' ')[2] = b.w
CROSS JOIN nu CROSS JOIN nb
WHERE c_ab >= 5
ORDER BY pmi DESC, bigram ASC
LIMIT 20
"""


ORACLE_WEIGHTED_SAMPLE = f"""
-- rank on the FULL-precision key (rounding first would collapse the
-- A-ES ranking for large weights); round only the emitted column
WITH keyed AS (
    SELECT doc_id, n_chars,
           ln((({_h60("'wsample:' || CAST(doc_id AS VARCHAR)")} % 1000003) + 1)
              / 1000004.0) / n_chars AS ws_key_full
    FROM documents
    WHERE n_chars > 0
)
SELECT doc_id, n_chars, round(ws_key_full, 6) AS ws_key
FROM keyed
ORDER BY ws_key_full DESC, doc_id ASC
LIMIT 50
"""


ORACLE_SESSION_PATHS = """
WITH marked AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30 * 60 * 1000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, ts, event_id, event_type,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
    FROM marked
), paths AS (
    SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM sess GROUP BY user_id, session_id
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 15
"""


# --- round-6 additions: profiling, linkage, graph, sketches ---------------

def _profile_block(col: str, kind: str) -> str:
    """One column's profile row (operators/profiling.py:column_profile
    canonicalization: numerics → double bounds, strings → raw bounds,
    timestamps → ISO-micros strings whose lexicographic order is time
    order; distinct counts are over the canonical value)."""
    if kind == "num":
        sel = (
            f"count(DISTINCT {col}) AS n_distinct, "
            f"round(CAST(min({col}) AS DOUBLE), 6) AS min_num, "
            f"round(CAST(max({col}) AS DOUBLE), 6) AS max_num, "
            f"CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
        )
    elif kind == "ts":
        fmt = f"strftime({col}, '%Y-%m-%d %H:%M:%S.%f')"
        sel = (
            f"count(DISTINCT {fmt}) AS n_distinct, "
            f"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
            f"min({fmt}) AS min_str, max({fmt}) AS max_str"
        )
    else:
        sel = (
            f"count(DISTINCT {col}) AS n_distinct, "
            f"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
            f"min({col}) AS min_str, max({col}) AS max_str"
        )
    return (
        f"SELECT '{col}' AS col_name, count(*) AS n_rows, "
        f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
        f"{sel} FROM orders"
    )


ORACLE_COLUMN_PROFILE = (
    "\nUNION ALL\n".join(
        _profile_block(c, k)
        for c, k in (
            ("o_orderkey", "num"),
            ("o_custkey", "num"),
            ("o_orderstatus", "str"),
            ("o_totalprice", "num"),
            ("o_orderdate", "ts"),
            ("o_orderpriority", "str"),
        )
    )
    + "\nORDER BY col_name"
)

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
ORACLE_CORR_MATRIX = (
    "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"round(corr({a}, {b}), 6) AS corr FROM lineitem"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    )
    + "\nORDER BY col_a, col_b"
)

# lam literal repr round-trips the exact double the Spark side folds in
_DECAY_LAM = __import__("math").log(2.0) / 7.0
# NOTE the parenthesization: the Spark side computes
# (-lam) * (diff_us / 86400e6) — age FIRST, then the rate multiply.
# The unparenthesized SQL form would parse as ((-lam * diff) / 86400e6),
# a different FP association whose last-ulp drift defeats the
# integer-micros bit-identity argument.
ORACLE_DECAYED_COUNTS = f"""
WITH dated AS (SELECT * FROM events WHERE ts IS NOT NULL),
ref AS (SELECT max(ts) AS t_ref FROM dated)
SELECT user_id, count(*) AS n_events,
       round(sum(exp((-{_DECAY_LAM!r}) * ((epoch_us(t_ref) - epoch_us(ts)) / 86400000000.0))), 6) AS decayed_n,
       round(sum(exp((-{_DECAY_LAM!r}) * ((epoch_us(t_ref) - epoch_us(ts)) / 86400000000.0))
                 * coalesce(value, 0.0)), 6) AS decayed_value
FROM dated CROSS JOIN ref
GROUP BY user_id
ORDER BY user_id
"""

_SNM_W = 3
_SNM_LEADS = ",\n       ".join(
    f"lead(k, {i}) OVER win AS k{i}, lead(nm, {i}) OVER win AS n{i}"
    for i in range(1, _SNM_W + 1)
)
_SNM_SLOTS = "\nUNION ALL\n".join(
    # both key AND text non-null, the engine's predicate exactly
    # (linkage.py filters key_b AND text_b): a record with a NULL id
    # must be dropped by BOTH sides or the hashes diverge
    f"SELECT k AS key_a, k{i} AS key_b, levenshtein(nm, n{i}) AS distance "
    f"FROM w WHERE k{i} IS NOT NULL AND n{i} IS NOT NULL"
    for i in range(1, _SNM_W + 1)
)
ORACLE_FUZZY_MATCH = f"""
WITH t AS (SELECT doc_id AS k, substring({_nrm('text')}, 1, 200) AS nm FROM documents),
t2 AS (SELECT k, nm, substring(nm, 1, 1) AS b FROM t),
w AS (SELECT k, nm, b,
       {_SNM_LEADS}
      FROM t2 WINDOW win AS (PARTITION BY b ORDER BY nm ASC, k ASC)),
cand AS ({_SNM_SLOTS})
SELECT key_a, key_b, distance FROM cand
WHERE distance <= 8
ORDER BY key_a, key_b
"""

_SNM_SLOTS_R = "\nUNION ALL\n".join(
    f"SELECT k AS key_a, k{i} AS key_b, levenshtein(nm, n{i}) AS distance "
    f"FROM wr WHERE k{i} IS NOT NULL AND n{i} IS NOT NULL"
    for i in range(1, _SNM_W + 1)
)

# Two-pass SNM (linkage.py:multipass_snm_pairs): the forward pass is
# ORACLE_FUZZY_MATCH's; the second pass blocks/sorts on reverse(nm)
# (levenshtein on reversed strings == true distance), pairs
# canonicalized least/greatest and deduplicated with min().
ORACLE_SNM_MULTIPASS = f"""
WITH t AS (SELECT doc_id AS k, substring({_nrm('text')}, 1, 200) AS nm FROM documents),
t2 AS (SELECT k, nm, substring(nm, 1, 1) AS b FROM t),
w AS (SELECT k, nm, b,
       {_SNM_LEADS}
      FROM t2 WINDOW win AS (PARTITION BY b ORDER BY nm ASC, k ASC)),
cand AS ({_SNM_SLOTS}),
tr AS (SELECT k, reverse(nm) AS nm FROM t),
tr2 AS (SELECT k, nm, substring(nm, 1, 1) AS b FROM tr),
wr AS (SELECT k, nm, b,
       {_SNM_LEADS}
      FROM tr2 WINDOW win AS (PARTITION BY b ORDER BY nm ASC, k ASC)),
candr AS ({_SNM_SLOTS_R}),
allp AS (
    SELECT least(key_a, key_b) AS key_a,
           greatest(key_a, key_b) AS key_b, distance
    FROM (SELECT * FROM cand WHERE distance <= 8
          UNION ALL
          SELECT * FROM candr WHERE distance <= 8)
)
SELECT key_a, key_b, min(distance) AS distance
FROM allp GROUP BY key_a, key_b
ORDER BY key_a, key_b
"""


def _pagerank_oracle(damping: float = 0.85, iterations: int = 8) -> str:
    """Unrolled fixed-k power iteration mirroring operators/graph.py:
    pagerank — same edge normalization, same dangling-mass fold, same
    double literals (1-d and d parsed as the identical IEEE ops)."""
    ctes = [
        """edges AS (
  SELECT from_type AS src, to_type AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM (SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events)
  WHERE to_type IS NOT NULL GROUP BY 1, 2)""",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "outw AS (SELECT src, sum(w) AS wout FROM edges GROUP BY src)",
        "en AS MATERIALIZED (SELECT e.src, e.dst, e.w / o.wout AS wn FROM edges e JOIN outw o USING (src))",
        # MATERIALIZED: each r_i is referenced twice (contrib + dangling);
        # inlining would blow the unrolled plan up 2^k
        "r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iterations):
        ctes.append(
            f"d{i} AS (SELECT coalesce(sum(rank), 0.0) AS dang FROM r{i} "
            f"WHERE node NOT IN (SELECT src FROM en))"
        )
        ctes.append(
            f"c{i} AS (SELECT en.dst AS node, sum(r.rank * en.wn) AS contrib "
            f"FROM r{i} r JOIN en ON r.node = en.src GROUP BY en.dst)"
        )
        ctes.append(
            f"r{i + 1} AS MATERIALIZED (SELECT nodes.node, "
            f"(1.0 - {damping!r}) / nn.n + {damping!r} * "
            f"(coalesce(c.contrib, 0.0) + d.dang / nn.n) AS rank "
            f"FROM nodes CROSS JOIN nn CROSS JOIN d{i} d "
            f"LEFT JOIN c{i} c ON nodes.node = c.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{iterations} ORDER BY node"
    )


ORACLE_PAGERANK = _pagerank_oracle()

ORACLE_ER_CLUSTERS = f"""
WITH RECURSIVE t AS (SELECT doc_id AS k, substring({_nrm('text')}, 1, 200) AS nm FROM documents),
t2 AS (SELECT k, nm, substring(nm, 1, 1) AS b FROM t),
w AS (SELECT k, nm, b,
       {_SNM_LEADS}
      FROM t2 WINDOW win AS (PARTITION BY b ORDER BY nm ASC, k ASC)),
cand AS ({_SNM_SLOTS}),
pairs AS (SELECT key_a, key_b FROM cand WHERE distance <= 8),
edges AS MATERIALIZED (
    -- MATERIALIZED: see the dedup_clusters note — avoids re-running
    -- the SNM chain per recursion round
    SELECT key_a AS src, key_b AS dst FROM pairs
    UNION
    SELECT key_b AS src, key_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, min(lab) AS entity_id
FROM reach GROUP BY node
ORDER BY doc_id
"""

ORACLE_ROBUST_OUTLIERS = """
WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM v GROUP BY event_type),
dev AS (SELECT v.event_type, abs(v.value - m.med) AS adev, m.med
        FROM v JOIN med m USING (event_type)),
mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type)
SELECT d.event_type, count(*) AS n,
       round(max(d.med), 6) AS med,
       round(max(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""

_QB_PS = [i / 10 for i in range(1, 10)]
_QB_EDGES = ", ".join(
    f"quantile_cont(val, {p!r}) AS e{i}" for i, p in enumerate(_QB_PS)
)
_QB_BIN = "1 + " + " + ".join(
    f"(CASE WHEN val > e{i} THEN 1 ELSE 0 END)" for i in range(len(_QB_PS))
)
ORACLE_QUANTILE_BINS = f"""
WITH v AS (SELECT o_totalprice AS val FROM orders WHERE o_totalprice IS NOT NULL),
e AS (SELECT {_QB_EDGES} FROM v)
SELECT {_QB_BIN} AS bin, count(*) AS n, round(avg(val), 6) AS mean_value
FROM v CROSS JOIN e
GROUP BY bin
ORDER BY bin
"""

ORACLE_HEAVY_HITTERS = f"""
WITH {_DOC_TOK_CTE},
items AS (SELECT unnest(tok) AS item FROM doc_tok)
SELECT item, count(*) AS n_exact,
       CAST(row_number() OVER (ORDER BY count(*) DESC, item ASC) AS INTEGER) AS rank,
       TRUE AS mg_bound_ok
FROM items GROUP BY item
ORDER BY n_exact DESC, item ASC
LIMIT 20
"""


def _hits_oracle(iterations: int = 4) -> str:
    """Unrolled fixed-k HITS mirroring operators/graph.py:hits_scores —
    same distinct transition edges as the pagerank oracle, same
    max-normalization (order-free, so each iteration is value-exact)."""
    ctes = [
        """edges AS MATERIALIZED (
  SELECT DISTINCT from_type AS s, to_type AS d
  FROM (SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events)
  WHERE to_type IS NOT NULL)""",
        "nodes AS MATERIALIZED (SELECT s AS node FROM edges UNION SELECT d FROM edges)",
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)",
    ]
    for i in range(iterations):
        ctes.append(
            f"ra{i} AS (SELECT e.d AS node, sum(h.h) AS a "
            f"FROM h{i} h JOIN edges e ON h.node = e.s GROUP BY e.d)"
        )
        ctes.append(f"am{i} AS (SELECT max(a) AS m FROM ra{i})")
        ctes.append(
            f"a{i + 1} AS MATERIALIZED (SELECT nodes.node, "
            f"coalesce(r.a / am.m, 0.0) AS a "
            f"FROM nodes CROSS JOIN am{i} am "
            f"LEFT JOIN ra{i} r ON nodes.node = r.node)"
        )
        ctes.append(
            f"rh{i} AS (SELECT e.s AS node, sum(a.a) AS h "
            f"FROM a{i + 1} a JOIN edges e ON a.node = e.d GROUP BY e.s)"
        )
        ctes.append(f"hm{i} AS (SELECT max(h) AS m FROM rh{i})")
        ctes.append(
            f"h{i + 1} AS MATERIALIZED (SELECT nodes.node, "
            f"coalesce(r.h / hm.m, 0.0) AS h "
            f"FROM nodes CROSS JOIN hm{i} hm "
            f"LEFT JOIN rh{i} r ON nodes.node = r.node)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT a.node, round(a.a, 6) AS authority, "
        f"round(h.h, 6) AS hub "
        f"FROM a{iterations} a JOIN h{iterations} h USING (node) "
        f"ORDER BY node"
    )


ORACLE_HITS_SCORES = _hits_oracle()

# Common-neighbor / Adamic-Adar link prediction
# (operators/graph.py:common_neighbors) on the co-purchase graph: the
# triangle oracle's edge CTEs, symmetric adjacency, capped wedge
# centers, anti-join against existing edges, and a SORTED left fold
# for the Adamic-Adar sum (identical association both engines).
ORACLE_COMMON_NEIGHBORS = """
WITH po AS (
    SELECT l_orderkey,
           list_sort(list_distinct(list(l_partkey))) AS parts
    FROM lineitem GROUP BY l_orderkey
), pr AS (
    SELECT unnest(flatten(list_transform(range(1, len(parts)), i ->
        list_transform(range(i + 1, len(parts) + 1),
                       j -> [parts[i], parts[j]])))) AS p
    FROM po WHERE len(parts) >= 2
), e AS (
    SELECT p[1] AS u, p[2] AS v FROM pr
    GROUP BY 1, 2 HAVING count(*) >= 2
),
adj AS (SELECT u AS z, v AS n FROM e UNION ALL SELECT v AS z, u AS n FROM e),
deg AS (SELECT z, CAST(count(*) AS BIGINT) AS dg FROM adj GROUP BY z),
ctr AS (SELECT adj.z, adj.n, deg.dg FROM adj JOIN deg USING (z)
        WHERE deg.dg <= 10000),
w AS (SELECT a1.n AS a, a2.n AS b, a1.dg AS dg
      FROM ctr a1 JOIN ctr a2 ON a1.z = a2.z AND a1.n < a2.n),
nw AS (SELECT w.a, w.b, w.dg FROM w
       ANTI JOIN e ON w.a = e.u AND w.b = e.v),
g AS (SELECT a AS id_a, b AS id_b,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             list_sort(list(dg)) AS degs
      FROM nw GROUP BY a, b)
SELECT id_a, id_b, common_neighbors,
       round(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(degs, x -> 1.0 / ln(x))),
           (acc, v) -> acc + v), 6) AS adamic_adar
FROM g
ORDER BY adamic_adar DESC, common_neighbors DESC, id_a, id_b
LIMIT 25
"""


def _source_overlap_oracle(n: int = 3, num_perm: int = 64) -> str:
    """Per-source union-MinHash overlap
    (operators/dedup.py:source_minhash_overlap): same h60 base, same
    affine params, all-integer mins — bit-exact by construction."""
    params = _perm_params(num_perm)
    mins = ",\n           ".join(
        f"min(({a} * base + {b}) % {_MERSENNE}) AS p{i}"
        for i, (a, b) in enumerate(params)
    )
    eq = " + ".join(f"(l.p{i} = r.p{i})::INT" for i in range(num_perm))
    return f"""
WITH t AS (SELECT source, {_shingles(_tok(_nrm('text')), n)} AS sh
           FROM documents WHERE source IS NOT NULL),
x AS (SELECT source, {_h60('s')} % {_MERSENNE} AS base
      FROM (SELECT source, unnest(sh) AS s FROM t)),
sig AS (SELECT source,
           {mins}
        FROM x GROUP BY source),
p AS (SELECT l.source AS source_a, r.source AS source_b,
             CAST({eq} AS BIGINT) AS n_equal
      FROM sig l JOIN sig r ON l.source < r.source)
SELECT source_a, source_b, n_equal,
       round(CAST(n_equal AS DOUBLE) / {float(num_perm)!r}, 6) AS est_jaccard
FROM p ORDER BY source_a, source_b
"""


ORACLE_SOURCE_OVERLAP = _source_overlap_oracle()

# RFM quartile segmentation (operators/analytics.py:rfm_segments):
# per-customer recency/frequency/monetary, exact quartile edges
# (DuckDB quantile_cont == Spark exact percentile, proven hash-green
# by quantile_bins), strict-crossing scores with ties scoring down.
# Monetary is rounded to cents BEFORE the edge pass in both engines.
ORACLE_RFM_SEGMENTS = """
WITH pc AS (
    SELECT o_custkey AS custkey,
           max(o_orderdate) AS last_d,
           CAST(count(*) AS BIGINT) AS frequency,
           round(sum(o_totalprice), 2) AS monetary
    FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
), anc AS (SELECT max(last_d) AS anchor FROM pc),
r AS (
    SELECT custkey,
           CAST(date_diff('day', last_d, anchor) AS BIGINT) AS recency_days,
           frequency, monetary
    FROM pc CROSS JOIN anc
), e AS (
    SELECT quantile_cont(recency_days, 0.25) AS re0,
           quantile_cont(recency_days, 0.5)  AS re1,
           quantile_cont(recency_days, 0.75) AS re2,
           quantile_cont(frequency, 0.25) AS fe0,
           quantile_cont(frequency, 0.5)  AS fe1,
           quantile_cont(frequency, 0.75) AS fe2,
           quantile_cont(monetary, 0.25) AS me0,
           quantile_cont(monetary, 0.5)  AS me1,
           quantile_cont(monetary, 0.75) AS me2
    FROM r
), s AS (
    SELECT custkey, recency_days, frequency, monetary,
           CAST(4 - ((recency_days > re0)::INT + (recency_days > re1)::INT
                     + (recency_days > re2)::INT) AS INTEGER) AS r_score,
           CAST(1 + ((frequency > fe0)::INT + (frequency > fe1)::INT
                     + (frequency > fe2)::INT) AS INTEGER) AS f_score,
           CAST(1 + ((monetary > me0)::INT + (monetary > me1)::INT
                     + (monetary > me2)::INT) AS INTEGER) AS m_score
    FROM r CROSS JOIN e
)
SELECT custkey, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm
FROM s ORDER BY custkey
"""

# Churn training labels (operators/analytics.py:churn_labels):
# all-integer per-user aggregate + 1-row global anchor; the 14-day
# horizon compares full timestamps, day distance compares dates.
ORACLE_CHURN_LABELS = """
WITH pu AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
           max(ts) AS last_ts
    FROM events WHERE user_id IS NOT NULL GROUP BY 1
), anc AS (SELECT max(last_ts) AS anchor_ts FROM pu)
SELECT user_id, n_events, active_days,
       CAST(date_diff('day', CAST(last_ts AS DATE),
                      CAST(anchor_ts AS DATE)) AS BIGINT) AS days_since_last,
       CAST(last_ts < anchor_ts - INTERVAL 14 DAY AS INTEGER) AS churned
FROM pu CROSS JOIN anc ORDER BY user_id
"""

# Flesch / Flesch-Kincaid readability (queries.q_readability_scores):
# integer word / sentence-run / vowel-group counts (identical regexes
# both engines), then the identical left-to-right double formula.
ORACLE_READABILITY_SCORES = f"""
WITH t AS (
    SELECT doc_id, text, {_tok(_nrm('text'))} AS tok FROM documents
), m AS (
    SELECT doc_id,
           CAST(len(tok) AS BIGINT) AS n_words,
           CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                AS BIGINT) AS n_sentences,
           CAST(list_sum(list_transform(tok,
                w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))))
                AS BIGINT) AS n_syllables
    FROM t WHERE len(tok) >= 1
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
             6) AS flesch,
       round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59,
             6) AS fk_grade
FROM m ORDER BY doc_id
"""

def _source_overlap_incremental_oracle(n: int = 3, num_perm: int = 64) -> str:
    """Replays the incremental path exactly
    (operators/dedup.py:source_overlap_incremental): signatures over
    the corpus slice, signatures over the delta slice, min-per-perm
    merge on a FULL OUTER source join (DuckDB least skips NULLs like
    Spark's), then the pair join — all integers, bit-exact."""
    params = _perm_params(num_perm)
    mins = ",\n           ".join(
        f"min(({a} * base + {b}) % {_MERSENNE}) AS p{i}"
        for i, (a, b) in enumerate(params)
    )
    merged = ",\n           ".join(
        f"least(c.p{i}, d.p{i}) AS p{i}" for i in range(num_perm)
    )
    eq = " + ".join(f"(l.p{i} = r.p{i})::INT" for i in range(num_perm))
    return f"""
WITH t AS (SELECT doc_id, source,
                  {_shingles(_tok(_nrm('text')), n)} AS sh
           FROM documents WHERE source IS NOT NULL),
x AS (SELECT doc_id, source, {_h60('s')} % {_MERSENNE} AS base
      FROM (SELECT doc_id, source, unnest(sh) AS s FROM t)),
sig_c AS (SELECT source, {mins}
          FROM x WHERE doc_id % 10 != 7 GROUP BY source),
sig_d AS (SELECT source, {mins}
          FROM x WHERE doc_id % 10 = 7 GROUP BY source),
sig AS (SELECT coalesce(c.source, d.source) AS source,
           {merged}
        FROM sig_c c FULL OUTER JOIN sig_d d ON c.source = d.source),
p AS (SELECT l.source AS source_a, r.source AS source_b,
             CAST({eq} AS BIGINT) AS n_equal
      FROM sig l JOIN sig r ON l.source < r.source)
SELECT source_a, source_b, n_equal,
       round(CAST(n_equal AS DOUBLE) / {float(num_perm)!r}, 6) AS est_jaccard
FROM p ORDER BY source_a, source_b
"""


ORACLE_SOURCE_OVERLAP_INCREMENTAL = _source_overlap_incremental_oracle()


def _kcore_oracle(k: int = 3, iterations: int = 12) -> str:
    """Unrolled fixed-round k-core peeling
    (operators/graph.py:kcore_decomposition) on the co-purchase graph
    (the common_neighbors edge CTEs). AS MATERIALIZED pins each round
    so DuckDB doesn't inline the chain 2^k-wide; all-integer."""
    ctes = [
        """po AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS parts
    FROM lineitem GROUP BY l_orderkey
), pr AS (
    SELECT unnest(flatten(list_transform(range(1, len(parts)), i ->
        list_transform(range(i + 1, len(parts) + 1),
                       j -> [parts[i], parts[j]])))) AS p
    FROM po WHERE len(parts) >= 2
), e AS (
    SELECT p[1] AS u, p[2] AS v FROM pr
    GROUP BY 1, 2 HAVING count(*) >= 2
),
adj0 AS MATERIALIZED (SELECT u AS z, v AS n FROM e
                      UNION ALL SELECT v AS z, u AS n FROM e)"""
    ]
    for i in range(iterations):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT z FROM "
            f"(SELECT z, count(*) AS c FROM adj{i} GROUP BY z) "
            f"WHERE c >= {k})"
        )
        ctes.append(
            f"adj{i + 1} AS MATERIALIZED (SELECT a.z, a.n FROM adj{i} a "
            f"JOIN k{i} x ON a.z = x.z JOIN k{i} y ON a.n = y.z)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
deg AS (SELECT z, CAST(count(*) AS BIGINT) AS degree_full
        FROM adj0 GROUP BY z),
core AS (SELECT z, CAST(count(*) AS BIGINT) AS cdg
         FROM adj{iterations} GROUP BY z)
SELECT deg.z AS node, deg.degree_full,
       core.z IS NOT NULL AS in_core,
       coalesce(core.cdg, 0) AS core_degree
FROM deg LEFT JOIN core ON deg.z = core.z
ORDER BY node
"""
    )


ORACLE_KCORE_DECOMPOSITION = _kcore_oracle()



def _modality_row(modality: str, items_sql: str, survivors_sql: str) -> str:
    """One modality row of the dup report: counts + round-6 rate, each
    composed from an already-verified survivors oracle. The survivors
    subquery is evaluated ONCE (derived-table join of two one-row
    counts — round-14 review: two independent scalar subqueries ran
    the whole recursive survivors replay twice per row)."""
    return f"""
SELECT '{modality}' AS modality, i.n_items, s.n_survivors,
       round(1.0 - CAST(s.n_survivors AS DOUBLE) / i.n_items, 6)
           AS dup_rate
FROM (SELECT CAST(({items_sql}) AS BIGINT) AS n_items) i,
     (SELECT CAST(count(*) AS BIGINT) AS n_survivors
      FROM ({survivors_sql})) s
"""


# Per-modality duplication report (queries.q_modality_dup_report):
# text exact digest + the three perceptual survivors pipelines, each
# replayed by its own already-verified oracle chain as a subquery.
ORACLE_MODALITY_DUP_REPORT = (
    _modality_row(
        "text",
        "SELECT count(*) FROM documents",
        "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
    )
    + " UNION ALL "
    + _modality_row(
        "image",
        "SELECT count(*) + count(*) FILTER (doc_id % 5 = 0) FROM documents",
        ORACLE_IMAGE_DEDUP_SURVIVORS,
    )
    + " UNION ALL "
    + _modality_row(
        "audio",
        """SELECT count(*)
             + count(*) FILTER (doc_id % 5 = 0
                 AND octet_length(encode(coalesce(text, ''))) % 2 = 0)
           FROM documents""",
        ORACLE_AUDIO_DEDUP_SURVIVORS,
    )
    + " UNION ALL "
    + _modality_row(
        "video",
        "SELECT count(*) + count(*) FILTER (doc_id % 5 = 0) FROM documents",
        ORACLE_VIDEO_DEDUP_SURVIVORS,
    )
    + " ORDER BY modality"
)


# Per-source two-sample KS over doc length: integer-exact cumulative
# counts on the dense (source × distinct length) grid; the
# sup-difference is maximized over the common-denominator BIGINT
# numerator, ONE double divide per source at the end (the Spark
# operator's arithmetic, profiling.py:source_drift_ks).
ORACLE_SOURCE_DRIFT_KS = """
WITH c0 AS (
    SELECT source AS grp, CAST(n_chars AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
), mm AS (SELECT min(x) AS xmin, max(x) AS xmax FROM c0),
c AS (
    SELECT grp,
           CAST((x - xmin) // ((xmax - xmin + 8192) // 8192) AS BIGINT)
               AS b,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM c0 CROSS JOIN mm GROUP BY 1, 2
), g AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_g FROM c GROUP BY 1),
bs AS (SELECT DISTINCT b FROM c),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c),
cum0 AS (
    SELECT g.grp, g.n_g, bs.b,
           CAST(sum(coalesce(c.cnt, 0))
                OVER (PARTITION BY g.grp ORDER BY bs.b) AS BIGINT) AS cum_g
    FROM g CROSS JOIN bs
    LEFT JOIN c ON c.grp = g.grp AND c.b = bs.b
), cum AS (
    SELECT grp, n_g, b, cum_g,
           CAST(sum(cum_g) OVER (PARTITION BY b) AS BIGINT) AS cum_all
    FROM cum0
)
SELECT cum.grp AS source, cum.n_g AS n_rows,
       CASE WHEN cum.n_g < n.n_total THEN
           round(CAST(max(abs(cum_g * (n.n_total - cum.n_g)
                              - (cum_all - cum_g) * cum.n_g)) AS DOUBLE)
                 / CAST(cum.n_g * (n.n_total - cum.n_g) AS DOUBLE), 6)
       END AS ks_stat
FROM cum CROSS JOIN n
GROUP BY cum.grp, cum.n_g, n.n_total
ORDER BY source
"""

# Per-label centroid cosine vs the global centroid: means rounded 6 dp
# BEFORE the cosine on both engines (the growth_rates discipline), so
# the dot/norm arithmetic runs on identical doubles.
ORACLE_EMBEDDING_CENTROID_DRIFT = """
WITH ex AS (
    SELECT label AS lbl,
           unnest(generate_series(1, len(embedding))) - 1 AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings WHERE embedding IS NOT NULL
), s AS (
    SELECT lbl, pos, sum(v) AS s_lp, CAST(count(*) AS BIGINT) AS n_lp
    FROM ex GROUP BY 1, 2
), p AS (
    SELECT lbl, pos, n_lp, round(s_lp / n_lp, 6) AS m_lp FROM s
), gm AS (
    SELECT pos, round(sum(s_lp) / sum(n_lp), 6) AS m_gp FROM s GROUP BY 1
)
SELECT lbl AS label, max(n_lp) AS n_vecs,
       round(sum(m_lp * m_gp)
             / sqrt(sum(m_lp * m_lp) * sum(m_gp * m_gp)), 6)
           AS cos_to_global,
       round(1.0 - sum(m_lp * m_gp)
             / sqrt(sum(m_lp * m_lp) * sum(m_gp * m_gp)), 6) AS drift
FROM p JOIN gm USING (pos)
GROUP BY lbl ORDER BY label
"""

ORACLE_K_ANONYMITY = """
SELECT source, lang, CAST(n_chars // 200 AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_rows
FROM documents
GROUP BY 1, 2, 3
HAVING count(*) < 5
ORDER BY source, lang, len_bucket
"""

# Language-mix entropy per source: the H = log2(n) − Σ c·log2(c)/n
# identity over exact BIGINT counts (the char_entropy discipline).
ORACLE_SOURCE_LANG_ENTROPY = """
WITH c AS (
    SELECT source AS src, lang AS lng, CAST(count(*) AS BIGINT) AS cnt
    FROM documents GROUP BY 1, 2
)
SELECT src AS source, CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       round(log2(CAST(sum(cnt) AS DOUBLE))
             - sum(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE)))
               / CAST(sum(cnt) AS DOUBLE), 6) AS lang_entropy,
       round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
           AS top_lang_share
FROM c GROUP BY src ORDER BY source
"""


# Day-over-day KS of the event-value distribution: the
# source_drift_ks integer-exact discipline on a (day × floor(value))
# grid, adjacent days paired by day + INTERVAL 1 DAY.
ORACLE_TEMPORAL_DRIFT_KS = """
WITH c0 AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(floor(value) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), mm AS (SELECT min(x) AS xmin, max(x) AS xmax FROM c0),
c AS (
    SELECT day,
           CAST((x - xmin) // ((xmax - xmin + 8192) // 8192) AS BIGINT)
               AS x,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM c0 CROSS JOIN mm GROUP BY 1, 2
), g AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS n_day FROM c GROUP BY 1),
xs AS (SELECT DISTINCT x FROM c),
cum AS (
    SELECT g.day, g.n_day, xs.x,
           CAST(sum(coalesce(c.cnt, 0))
                OVER (PARTITION BY g.day ORDER BY xs.x) AS BIGINT) AS cum_d
    FROM g CROSS JOIN xs
    LEFT JOIN c ON c.day = g.day AND c.x = xs.x
), paired AS (
    SELECT cur.day, cur.n_day, prv.n_day AS n_prev,
           max(abs(cur.cum_d * prv.n_day - prv.cum_d * cur.n_day)) AS num
    FROM cum cur
    JOIN cum prv
      ON prv.day + INTERVAL 1 DAY = cur.day AND prv.x = cur.x
    GROUP BY 1, 2, 3
)
SELECT day, n_day AS n_rows, n_prev,
       round(CAST(num AS DOUBLE) / CAST(n_day * n_prev AS DOUBLE), 6)
           AS ks_stat
FROM paired
UNION ALL
SELECT g.day, g.n_day AS n_rows, CAST(NULL AS BIGINT) AS n_prev,
       CAST(NULL AS DOUBLE) AS ks_stat
FROM g WHERE g.day NOT IN (SELECT day FROM paired)
ORDER BY day
"""

# Day-over-day total-variation distance of the event-type mix: the
# integer TV numerator Σ|c_d·n_prev − c_prev·n_d| over the full-outer
# category union, one double divide by 2·n_d·n_prev.
ORACLE_EVENT_MIX_DRIFT = """
WITH c AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type AS cat, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
), g AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS n_day FROM c GROUP BY 1),
pairs AS (
    SELECT cur.day AS day, cur.n_day AS n_cur, prv.day AS pday,
           prv.n_day AS n_prev
    FROM g cur JOIN g prv ON prv.day + INTERVAL 1 DAY = cur.day
), joined AS (
    SELECT p.day, p.n_cur, p.n_prev,
           coalesce(cc.cnt, 0) AS c_cur, coalesce(cp.cnt, 0) AS c_prev
    FROM pairs p
    JOIN (SELECT DISTINCT cat FROM c) cats ON TRUE
    LEFT JOIN c cc ON cc.day = p.day AND cc.cat = cats.cat
    LEFT JOIN c cp ON cp.day = p.pday AND cp.cat = cats.cat
    WHERE cc.cnt IS NOT NULL OR cp.cnt IS NOT NULL
), paired AS (
    SELECT day, n_cur, n_prev,
           sum(abs(c_cur * n_prev - c_prev * n_cur)) AS num
    FROM joined GROUP BY 1, 2, 3
)
SELECT day, n_cur AS n_rows, n_prev,
       round(CAST(num AS DOUBLE) / CAST(2 * n_cur * n_prev AS DOUBLE), 6)
           AS tv_dist
FROM paired
UNION ALL
SELECT g.day, g.n_day AS n_rows, CAST(NULL AS BIGINT) AS n_prev,
       CAST(NULL AS DOUBLE) AS tv_dist
FROM g WHERE g.day NOT IN (SELECT day FROM paired)
ORDER BY day
"""


ORACLE_L_DIVERSITY = """
SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive
FROM documents
GROUP BY 1, 2
HAVING count(DISTINCT lang) < 3
ORDER BY source, len_bucket
"""

# Pairwise cross-source shingle containment over the SAME word-n-gram
# shingle macro the jaccard/minhash oracles replay (short-doc and
# empty-doc conventions included); integer intersection counts, one
# double divide per pair. This is the EXACT all-pairs tier — the
# registry's contamination_matrix oracle is the two-tier screened
# replay below (r16 VERDICT #2: the screened plan is the default).
ORACLE_CONTAMINATION_MATRIX_EXACT = f"""
WITH {_DOC_TOK_CTE}, sets AS (
    SELECT source, list_distinct({_shingles("tok", 3)}) AS sh FROM doc_tok
), posts AS (
    SELECT DISTINCT source AS src, unnest(sh) AS shingle FROM sets
), sizes AS (
    SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM posts GROUP BY 1
), pairs AS (
    SELECT a.src AS source_a, b.src AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM posts a JOIN posts b USING (shingle)
    WHERE a.src <> b.src
    GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared,
       round(CAST(n_shared AS DOUBLE) / CAST(s.n_sh AS DOUBLE), 6)
           AS containment
FROM pairs JOIN sizes s ON s.src = source_b
ORDER BY source_a, source_b
"""


def _contamination_screened_oracle(
    n: int = 3,
    est_threshold: float = 0.0625,
    num_perm: int = 64,
    include_est: bool = True,
) -> str:
    """Two-tier replay of curation.contamination_screened: the
    source_overlap signature estimate (same h60/affine integer mins)
    flags pairs in both orientations, exact containment recomputed for
    flagged pairs only with the exact matrix's shingle conventions.
    ``include_est=False`` drops the est_jaccard output column — the
    shape contamination_matrix's default (delegating) path returns."""
    params = _perm_params(num_perm)
    mins = ",\n           ".join(
        f"min(({a} * base + {b}) % {_MERSENNE}) AS p{i}"
        for i, (a, b) in enumerate(params)
    )
    eq = " + ".join(f"(l.p{i} = r.p{i})::INT" for i in range(num_perm))
    return f"""
WITH {_DOC_TOK_CTE}, x AS (
    SELECT source, {_h60('s')} % {_MERSENNE} AS base
    FROM (SELECT source, unnest({_shingles("tok", n)}) AS s
          FROM doc_tok WHERE source IS NOT NULL)
), sig AS (SELECT source,
           {mins}
        FROM x GROUP BY source),
est AS (
    SELECT l.source AS source_a, r.source AS source_b,
           round(CAST({eq} AS DOUBLE) / {float(num_perm)!r}, 6)
               AS est_jaccard
    FROM sig l JOIN sig r ON l.source < r.source
), flagged AS (
    SELECT source_a, source_b, est_jaccard FROM est
    WHERE est_jaccard >= {est_threshold!r}
    UNION ALL
    SELECT source_b AS source_a, source_a AS source_b, est_jaccard
    FROM est WHERE est_jaccard >= {est_threshold!r}
), sets AS (
    SELECT source, list_distinct({_shingles("tok", n)}) AS sh FROM doc_tok
), posts AS (
    SELECT DISTINCT source AS src, unnest(sh) AS shingle FROM sets
), sizes AS (
    SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM posts GROUP BY 1
), pairs AS (
    SELECT f.source_a, f.source_b, f.est_jaccard,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM flagged f
    JOIN posts a ON a.src = f.source_a
    JOIN posts b ON b.src = f.source_b AND b.shingle = a.shingle
    GROUP BY 1, 2, 3
)
SELECT source_a, source_b, n_shared,
       round(CAST(n_shared AS DOUBLE) / CAST(s.n_sh AS DOUBLE), 6)
           AS containment{", est_jaccard" if include_est else ""}
FROM pairs JOIN sizes s ON s.src = source_b
ORDER BY source_a, source_b
"""


ORACLE_CONTAMINATION_SCREENED = _contamination_screened_oracle()
# the registry twin of contamination_matrix's DEFAULT (screened) path:
# identical two-tier replay, est_jaccard dropped from the output
ORACLE_CONTAMINATION_MATRIX = _contamination_screened_oracle(
    include_est=False
)

# Source-vs-rest PSI over document lengths: the temporal_psi grid and
# float discipline (raw IEEE shares, bucket-ordered fold), rest-of-
# corpus counts derived from the dense grid (C_b - c_g), never a
# second scan.
ORACLE_SOURCE_PSI = """
WITH c0 AS (
    SELECT source AS grp, CAST(floor(n_chars) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
), mm AS (SELECT min(x) AS xmin, max(x) AS xmax FROM c0),
cb AS (
    SELECT grp,
           CAST((x - xmin) // ((xmax - xmin + 32) // 32) AS BIGINT) AS b,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM c0 CROSS JOIN mm GROUP BY 1, 2
), g AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_g FROM cb GROUP BY 1),
bs AS (SELECT DISTINCT b FROM cb),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cb),
dense AS (
    SELECT g.grp, bs.b, g.n_g, coalesce(cb.cnt, 0) AS c_g
    FROM g CROSS JOIN bs
    LEFT JOIN cb ON cb.grp = g.grp AND cb.b = bs.b
), aug AS (
    SELECT grp, b, n_g, c_g,
           CAST(sum(c_g) OVER (PARTITION BY b) AS BIGINT) AS c_all,
           CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS nbk
    FROM dense
), terms AS (
    SELECT grp, n_g, b, n.n_total,
           CASE WHEN n_g < n.n_total THEN
               ((c_g + 0.5) / (n_g + nbk / 2.0)
                - (c_all - c_g + 0.5)
                  / (n.n_total - n_g + nbk / 2.0))
               * ln(((c_g + 0.5) / (n_g + nbk / 2.0))
                    / ((c_all - c_g + 0.5)
                       / (n.n_total - n_g + nbk / 2.0)))
           END AS term
    FROM aug CROSS JOIN n
)
SELECT grp AS source, n_g AS n_rows,
       CASE WHEN n_g < n_total THEN
           round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY b)),
               (acc, v) -> acc + v), 6)
       END AS psi
FROM terms
GROUP BY grp, n_g, n_total
ORDER BY source
"""

# Source-vs-rest Wasserstein-1 over document lengths (r17): the
# temporal_wasserstein grid/float discipline on the source axis —
# exact integer cumulatives for own AND corpus (rest = cum_all -
# cum_g), one division per CDF point, |p - q| weighted by the run
# length to the next observed bucket, bucket-ordered fold, width x
# sum rounded 6; whole-corpus groups emit NULL.
ORACLE_SOURCE_WASSERSTEIN = """
WITH c0 AS (
    SELECT source AS grp, CAST(floor(n_chars) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
), mm AS (SELECT min(x) AS xmin, max(x) AS xmax FROM c0),
wz AS (SELECT CAST((xmax - xmin + 32) // 32 AS BIGINT) AS w FROM mm),
cb AS (
    SELECT grp,
           CAST((x - xmin) // ((xmax - xmin + 32) // 32) AS BIGINT) AS b,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM c0 CROSS JOIN mm GROUP BY 1, 2
), g AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_g FROM cb GROUP BY 1),
bs AS (SELECT DISTINCT b FROM cb),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cb),
dense AS (
    SELECT g.grp, bs.b, g.n_g, coalesce(cb.cnt, 0) AS c_g
    FROM g CROSS JOIN bs
    LEFT JOIN cb ON cb.grp = g.grp AND cb.b = bs.b
), aug AS (
    SELECT grp, b, n_g, c_g,
           CAST(sum(c_g) OVER (PARTITION BY b) AS BIGINT) AS c_all
    FROM dense
), cum AS (
    SELECT grp, b, n_g,
           CAST(sum(c_g) OVER wg AS BIGINT) AS cum_g,
           CAST(sum(c_all) OVER wg AS BIGINT) AS cum_all
    FROM aug
    WINDOW wg AS (PARTITION BY grp ORDER BY b ROWS UNBOUNDED PRECEDING)
), terms AS (
    SELECT grp, n_g, b, n.n_total,
           CASE WHEN n_g < n.n_total THEN
               abs(CAST(cum_g AS DOUBLE) / n_g
                   - CAST(cum_all - cum_g AS DOUBLE) / (n.n_total - n_g))
               * coalesce(lead(b) OVER wl - b, 0)
           END AS term
    FROM cum CROSS JOIN n
    WINDOW wl AS (PARTITION BY grp ORDER BY b)
)
SELECT grp AS source, n_g AS n_rows,
       CASE WHEN n_g < n_total THEN
           round((SELECT w FROM wz) * list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY b)),
               (acc, v) -> acc + v), 6)
       END AS w1_dist
FROM terms
GROUP BY grp, n_g, n_total
ORDER BY source
"""

# Day-over-day PSI of the event-value distribution: 32-bucket
# min/max grid, +0.5 Laplace smoothing, RAW IEEE shares (exactly
# representable operands — a pre-log round would zero an empty
# bucket's share at ~1M rows/day), per-day sum as a bucket-ordered
# fold (adamic_adar convention).
ORACLE_TEMPORAL_PSI = """
WITH c0 AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(floor(value) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), mm AS (SELECT min(x) AS xmin, max(x) AS xmax FROM c0),
cb AS (
    SELECT day,
           CAST((x - xmin) // ((xmax - xmin + 32) // 32) AS BIGINT) AS b,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM c0 CROSS JOIN mm GROUP BY 1, 2
), g AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS n_day FROM cb GROUP BY 1),
bs AS (SELECT DISTINCT b FROM cb),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nbk FROM bs),
dense AS (
    SELECT g.day, bs.b, g.n_day, coalesce(cb.cnt, 0) AS c_cur
    FROM g CROSS JOIN bs
    LEFT JOIN cb ON cb.day = g.day AND cb.b = bs.b
), lagged AS (
    SELECT day, b, n_day,
           CASE WHEN lag(day) OVER w + INTERVAL 1 DAY = day
                THEN lag(n_day) OVER w END AS n_prev,
           CASE WHEN lag(day) OVER w + INTERVAL 1 DAY = day THEN
               ((c_cur + 0.5) / (n_day + nbk / 2.0)
                - (lag(c_cur) OVER w + 0.5)
                  / (lag(n_day) OVER w + nbk / 2.0))
               * ln(((c_cur + 0.5) / (n_day + nbk / 2.0))
                    / ((lag(c_cur) OVER w + 0.5)
                       / (lag(n_day) OVER w + nbk / 2.0)))
           END AS term
    FROM dense CROSS JOIN nb
    WINDOW w AS (PARTITION BY b ORDER BY day)
), pairs AS (
    SELECT day, n_day, max(n_prev) AS n_prev,
           round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY b)),
               (acc, v) -> acc + v), 6) AS psi
    FROM lagged WHERE n_prev IS NOT NULL
    GROUP BY day, n_day
)
SELECT day, n_day AS n_rows, n_prev, psi FROM pairs
UNION ALL
SELECT g.day, g.n_day AS n_rows, CAST(NULL AS BIGINT) AS n_prev,
       CAST(NULL AS DOUBLE) AS psi
FROM g WHERE g.day NOT IN (SELECT day FROM pairs)
ORDER BY day
"""


# Per-segment day-over-day PSI (r17): the attribution step after a
# corpus-level monitor fires — temporal_psi's grid/smoothing/fold
# discipline with (seg, day) keys on ONE shared global grid, window
# partitioned by (seg, b), per-(seg, day) bucket-ordered fold.
ORACLE_DRIFT_ATTRIBUTION = """
WITH c0 AS (
    SELECT event_type AS seg,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(floor(value) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL
    GROUP BY 1, 2, 3
), mm AS (SELECT min(x) AS xmin, max(x) AS xmax FROM c0),
cb AS (
    SELECT seg, day,
           CAST((x - xmin) // ((xmax - xmin + 32) // 32) AS BIGINT) AS b,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM c0 CROSS JOIN mm GROUP BY 1, 2, 3
), g AS (
    SELECT seg, day, CAST(sum(cnt) AS BIGINT) AS n_sd
    FROM cb GROUP BY 1, 2
),
bs AS (SELECT DISTINCT b FROM cb),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nbk FROM bs),
dense AS (
    SELECT g.seg, g.day, bs.b, g.n_sd, coalesce(cb.cnt, 0) AS c_cur
    FROM g CROSS JOIN bs
    LEFT JOIN cb ON cb.seg = g.seg AND cb.day = g.day AND cb.b = bs.b
), lagged AS (
    SELECT seg, day, b, n_sd,
           CASE WHEN lag(day) OVER w + INTERVAL 1 DAY = day
                THEN lag(n_sd) OVER w END AS n_prev,
           CASE WHEN lag(day) OVER w + INTERVAL 1 DAY = day THEN
               ((c_cur + 0.5) / (n_sd + nbk / 2.0)
                - (lag(c_cur) OVER w + 0.5)
                  / (lag(n_sd) OVER w + nbk / 2.0))
               * ln(((c_cur + 0.5) / (n_sd + nbk / 2.0))
                    / ((lag(c_cur) OVER w + 0.5)
                       / (lag(n_sd) OVER w + nbk / 2.0)))
           END AS term
    FROM dense CROSS JOIN nb
    WINDOW w AS (PARTITION BY seg, b ORDER BY day)
), pairs AS (
    SELECT seg, day, n_sd, max(n_prev) AS n_prev,
           round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY b)),
               (acc, v) -> acc + v), 6) AS psi
    FROM lagged WHERE n_prev IS NOT NULL
    GROUP BY seg, day, n_sd
)
SELECT seg AS event_type, day, n_sd AS n_rows, n_prev, psi FROM pairs
UNION ALL
SELECT g.seg AS event_type, g.day, g.n_sd AS n_rows,
       CAST(NULL AS BIGINT) AS n_prev, CAST(NULL AS DOUBLE) AS psi
FROM g LEFT JOIN pairs pr ON pr.seg = g.seg AND pr.day = g.day
WHERE pr.seg IS NULL
ORDER BY event_type, day
"""


# Day-over-day Wasserstein-1 on the shared bucket grid (r17): exact
# integer cumulative counts, ONE division per CDF point (no float
# accumulation), |p - q| terms summed in a bucket-ordered fold, final
# figure = width x sum rounded 6 — the transport member of the drift
# family next to KS/TV/PSI.
ORACLE_TEMPORAL_WASSERSTEIN = """
WITH c0 AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(floor(value) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), mm AS (SELECT min(x) AS xmin, max(x) AS xmax FROM c0),
wz AS (SELECT CAST((xmax - xmin + 32) // 32 AS BIGINT) AS w FROM mm),
cb AS (
    SELECT day,
           CAST((x - xmin) // ((xmax - xmin + 32) // 32) AS BIGINT) AS b,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM c0 CROSS JOIN mm GROUP BY 1, 2
), g AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS n_day FROM cb GROUP BY 1),
bs AS (SELECT DISTINCT b FROM cb),
dense AS (
    SELECT g.day, bs.b, g.n_day, coalesce(cb.cnt, 0) AS c_cur
    FROM g CROSS JOIN bs
    LEFT JOIN cb ON cb.day = g.day AND cb.b = bs.b
), cum AS (
    SELECT day, b, n_day,
           CAST(sum(c_cur) OVER (PARTITION BY day ORDER BY b
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
    FROM dense
), lagged AS (
    SELECT day, b, n_day,
           CASE WHEN lag(day) OVER w + INTERVAL 1 DAY = day
                THEN lag(n_day) OVER w END AS n_prev,
           CASE WHEN lag(day) OVER w + INTERVAL 1 DAY = day THEN
               abs(CAST(cum_c AS DOUBLE) / n_day
                   - CAST(lag(cum_c) OVER w AS DOUBLE)
                     / (lag(n_day) OVER w))
               * coalesce(lead(b) OVER wd - b, 0)
           END AS term
    FROM cum
    WINDOW w AS (PARTITION BY b ORDER BY day),
           wd AS (PARTITION BY day ORDER BY b)
), pairs AS (
    SELECT day, n_day, max(n_prev) AS n_prev,
           round((SELECT w FROM wz) * list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY b)),
               (acc, v) -> acc + v), 6) AS w1_dist
    FROM lagged WHERE n_prev IS NOT NULL
    GROUP BY day, n_day
)
SELECT day, n_day AS n_rows, n_prev, w1_dist FROM pairs
UNION ALL
SELECT g.day, g.n_day AS n_rows, CAST(NULL AS BIGINT) AS n_prev,
       CAST(NULL AS DOUBLE) AS w1_dist
FROM g WHERE g.day NOT IN (SELECT day FROM pairs)
ORDER BY day
"""


ORACLES: dict[str, str] = {
    "source_drift_ks": ORACLE_SOURCE_DRIFT_KS,
    "temporal_wasserstein": ORACLE_TEMPORAL_WASSERSTEIN,
    "source_wasserstein": ORACLE_SOURCE_WASSERSTEIN,
    "drift_attribution": ORACLE_DRIFT_ATTRIBUTION,
    "contamination_screened": ORACLE_CONTAMINATION_SCREENED,
    "temporal_psi": ORACLE_TEMPORAL_PSI,
    "source_psi": ORACLE_SOURCE_PSI,
    "l_diversity": ORACLE_L_DIVERSITY,
    "contamination_matrix": ORACLE_CONTAMINATION_MATRIX,
    "temporal_drift_ks": ORACLE_TEMPORAL_DRIFT_KS,
    "event_mix_drift": ORACLE_EVENT_MIX_DRIFT,
    "embedding_centroid_drift": ORACLE_EMBEDDING_CENTROID_DRIFT,
    "k_anonymity": ORACLE_K_ANONYMITY,
    "source_lang_entropy": ORACLE_SOURCE_LANG_ENTROPY,
    "source_overlap_incremental": ORACLE_SOURCE_OVERLAP_INCREMENTAL,
    "kcore_decomposition": ORACLE_KCORE_DECOMPOSITION,
    "hits_scores": ORACLE_HITS_SCORES,
    "common_neighbors": ORACLE_COMMON_NEIGHBORS,
    "source_overlap": ORACLE_SOURCE_OVERLAP,
    "rfm_segments": ORACLE_RFM_SEGMENTS,
    "churn_labels": ORACLE_CHURN_LABELS,
    "readability_scores": ORACLE_READABILITY_SCORES,
    "column_profile": ORACLE_COLUMN_PROFILE,
    "corr_matrix": ORACLE_CORR_MATRIX,
    "decayed_counts": ORACLE_DECAYED_COUNTS,
    "fuzzy_match": ORACLE_FUZZY_MATCH,
    "snm_multipass": ORACLE_SNM_MULTIPASS,
    "dedup_representatives": ORACLE_DEDUP_REPRESENTATIVES,
    "leakage_safe_split": ORACLE_LEAKAGE_SAFE_SPLIT,
    "lsh_quality_report": ORACLE_LSH_QUALITY_REPORT,
    "random_projection_profile": ORACLE_RANDOM_PROJECTION_PROFILE,
    "label_propagation": ORACLE_LABEL_PROPAGATION,
    "embedding_dim_profile": ORACLE_EMBEDDING_DIM_PROFILE,
    "growth_rates": ORACLE_GROWTH_RATES,
    "market_basket": ORACLE_MARKET_BASKET,
    "vocab_coverage": ORACLE_VOCAB_COVERAGE,
    "attribution_last_touch": ORACLE_ATTRIBUTION_LAST_TOUCH,
    "attribution_time_decay": ORACLE_ATTRIBUTION_TIME_DECAY,
    "clustering_coefficients": ORACLE_CLUSTERING_COEFFICIENTS,
    "source_concentration": ORACLE_SOURCE_CONCENTRATION,
    "seasonal_baseline": ORACLE_SEASONAL_BASELINE,
    "triangle_count": ORACLE_TRIANGLE_COUNT,
    "bpe_merges": ORACLE_BPE_MERGES,
    "hard_negatives": ORACLE_HARD_NEGATIVES,
    "bloom_prune_join": ORACLE_BLOOM_PRUNE_JOIN,
    "cusum_changepoint": ORACLE_CUSUM_CHANGEPOINT,
    "domain_quality_rank": ORACLE_DOMAIN_QUALITY_RANK,
    "ngram_novelty": ORACLE_NGRAM_NOVELTY,
    "benford_profile": ORACLE_BENFORD_PROFILE,
    "winsorized_stats": ORACLE_WINSORIZED_STATS,
    "skipgram_cooc": ORACLE_SKIPGRAM_COOC,
    "rrf_fusion": ORACLE_RRF_FUSION,
    "pagerank": ORACLE_PAGERANK,
    "heavy_hitters": ORACLE_HEAVY_HITTERS,
    "robust_outliers": ORACLE_ROBUST_OUTLIERS,
    "quantile_bins": ORACLE_QUANTILE_BINS,
    "er_clusters": ORACLE_ER_CLUSTERS,
    "pq_topk": ORACLE_PQ_TOPK,
    "ivf_pq_topk": ORACLE_IVF_PQ_TOPK,
    "weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "session_paths": ORACLE_SESSION_PATHS,
    "nearest_purchase": ORACLE_NEAREST_PURCHASE,
    "bigram_pmi": ORACLE_BIGRAM_PMI,
    "containment_pairs": ORACLE_CONTAINMENT_PAIRS,
    "event_transitions": ORACLE_EVENT_TRANSITIONS,
    "tokenizer_fertility": ORACLE_TOKENIZER_FERTILITY,
    "duplicate_spans": ORACLE_DUPLICATE_SPANS,
    "funnel_stages": ORACLE_FUNNEL_STAGES,
    "scd2_history": ORACLE_SCD2_HISTORY,
    "retention_cohorts": ORACLE_RETENTION_COHORTS,
    "user_running_anomaly": ORACLE_USER_RUNNING_ANOMALY,
    "quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "top_orders": ORACLE_TOP_ORDERS,
    "region_revenue": ORACLE_REGION_REVENUE,
    "segment_with_f_orders": ORACLE_SEGMENT_WITH_F_ORDERS,
    "customers_without_orders": ORACLE_CUSTOMERS_WITHOUT_ORDERS,
    "brand_revenue": ORACLE_BRAND_REVENUE,
    "priority_by_month": ORACLE_PRIORITY_BY_MONTH,
    "scalar_suite": ORACLE_SCALAR_SUITE,
    "union_entities": ORACLE_UNION_ENTITIES,
    "distinct_parts_per_flag": ORACLE_DISTINCT_PARTS_PER_FLAG,
    "rollup_flags": ORACLE_ROLLUP_FLAGS,
    "latest_events_per_user": ORACLE_LATEST_EVENTS_PER_USER,
    "rolling_user_value": ORACLE_ROLLING_USER_VALUE,
    "hourly_event_counts": ORACLE_HOURLY_EVENT_COUNTS,
    "sliding_event_counts": ORACLE_SLIDING_EVENT_COUNTS,
    "user_sessions": ORACLE_USER_SESSIONS,
    "props_by_type": ORACLE_PROPS_BY_TYPE,
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "keep_first": ORACLE_KEEP_FIRST,
    "fingerprint_clusters": ORACLE_FINGERPRINT_CLUSTERS,
    "fingerprint_folded": ORACLE_FINGERPRINT_FOLDED,
    "text_stats": ORACLE_TEXT_STATS,
    "language_id": ORACLE_LANGUAGE_ID,
    "rolling_hash": ORACLE_ROLLING_HASH,
    "doc_presence_scores": ORACLE_DOC_PRESENCE_SCORES,
    "jaccard_pairs": ORACLE_JACCARD_PAIRS,
    "minhash_lsh_pairs": ORACLE_MINHASH_LSH_PAIRS,
    "simhash_pairs": ORACLE_SIMHASH_PAIRS,
    "cosine_topk": ORACLE_COSINE_TOPK,
    "lsh_ann_topk": ORACLE_LSH_ANN_TOPK,
    "cosine_topk_pandas": ORACLE_COSINE_TOPK,
    "mq_provider_scores": ORACLE_MQ_PROVIDER_SCORES,
    "mq_contributor_scores": ORACLE_MQ_CONTRIBUTOR_SCORES,
    "flatten_items": ORACLE_FLATTEN_ITEMS,
    "avro_flatten_items": ORACLE_FLATTEN_ITEMS,
    "repair_flatten": ORACLE_REPAIR_FLATTEN,
    "schema_align": ORACLE_SCHEMA_ALIGN,
    "sitemap_urls": ORACLE_SITEMAP_URLS,
    "multimodal_meta": ORACLE_MULTIMODAL_META,
    "multimodal_decode": ORACLE_MULTIMODAL_DECODE,
    "multimodal_resize": ORACLE_MULTIMODAL_RESIZE,
    "multimodal_frames": ORACLE_MULTIMODAL_FRAMES,
    "image_near_dup": ORACLE_IMAGE_NEAR_DUP,
    "image_dedup_survivors": ORACLE_IMAGE_DEDUP_SURVIVORS,
    "video_near_dup": ORACLE_VIDEO_NEAR_DUP,
    "audio_pcm_stats": ORACLE_AUDIO_PCM_STATS,
    "video_dedup_survivors": ORACLE_VIDEO_DEDUP_SURVIVORS,
    "audio_near_dup": ORACLE_AUDIO_NEAR_DUP,
    "audio_dedup_survivors": ORACLE_AUDIO_DEDUP_SURVIVORS,
    "modality_dup_report": ORACLE_MODALITY_DUP_REPORT,
    "embedding_near_dup": ORACLE_EMBEDDING_NEAR_DUP,
    "props_from_json": ORACLE_PROPS_FROM_JSON,
    "thumbnail_keys": ORACLE_THUMBNAIL_KEYS,
    "udtf_sentences": ORACLE_UDTF_SENTENCES,
    "pivot_status": ORACLE_PIVOT_STATUS,
    "event_calendar": ORACLE_EVENT_CALENDAR,
    "value_percentiles": ORACLE_VALUE_PERCENTILES,
    "price_histogram": ORACLE_PRICE_HISTOGRAM,
    "asof_purchases": ORACLE_ASOF_PURCHASES,
    "hash_sample_split": ORACLE_HASH_SAMPLE_SPLIT,
    "training_prep": ORACLE_TRAINING_PREP,
    "grouping_sets": ORACLE_GROUPING_SETS,
    "pii_redaction": ORACLE_PII_REDACTION,
    "repetition_stats": ORACLE_REPETITION_STATS,
    "top_bigrams": ORACLE_TOP_BIGRAMS,
    "sql_supplier_share": ORACLE_SQL_SUPPLIER_SHARE,
    "bpe_token_counts": ORACLE_BPE_TOKEN_COUNTS,
    "user_cumsum": ORACLE_USER_CUMSUM,
    "user_zscore": ORACLE_USER_ZSCORE,
    "mixture_plan": ORACLE_MIXTURE_PLAN,
    "mixture_sample": ORACLE_MIXTURE_SAMPLE,
    "domain_cap": ORACLE_DOMAIN_CAP,
    "lm_scores": ORACLE_LM_SCORES,
    "sentence_dedup": ORACLE_SENTENCE_DEDUP,
    "packed_bins": ORACLE_PACKED_BINS,
    "gap_fill": ORACLE_GAP_FILL,
    "melt_metrics": ORACLE_MELT_METRICS,
    "ivf_topk": ORACLE_IVF_TOPK,
    "cell_occupancy": ORACLE_CELL_OCCUPANCY,
    "kmeans_cells": ORACLE_KMEANS_CELLS,
    "two_level_kmeans": ORACLE_TWO_LEVEL_KMEANS,
    "imi_topk": ORACLE_IMI_TOPK,
    "imi_recall_report": ORACLE_IMI_RECALL_REPORT,
    "cluster_silhouette": ORACLE_CLUSTER_SILHOUETTE,
    "pq_encode": ORACLE_PQ_ENCODE,
    "semdedup": ORACLE_SEMDEDUP,
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "dataset_dup_profile": ORACLE_DATASET_DUP_PROFILE,
    "ivf_recall_report": ORACLE_IVF_RECALL_REPORT,
    "incremental_semantic_dedup": ORACLE_INCREMENTAL_SEMANTIC_DEDUP,
    "dsir_weights": ORACLE_DSIR_WEIGHTS,
    "tfidf_terms": ORACLE_TFIDF_TERMS,
    "char_entropy": ORACLE_CHAR_ENTROPY,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "price_tiers": ORACLE_PRICE_TIERS,
    "salted_brand_join": ORACLE_SALTED_BRAND_JOIN,
    "segment_overlap": ORACLE_SEGMENT_OVERLAP,
    "cube_flags": ORACLE_CUBE_FLAGS,
    "interval_join": ORACLE_INTERVAL_JOIN,
    "doc_chunks": ORACLE_DOC_CHUNKS,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "decontaminate": ORACLE_DECONTAMINATE,
    "fuzzy_decontaminate": ORACLE_FUZZY_DECONTAMINATE,
    "quality_gate": ORACLE_QUALITY_GATE,
    "global_shuffle": ORACLE_GLOBAL_SHUFFLE,
    "corpus_report": ORACLE_CORPUS_REPORT,
    "apply_changeset": ORACLE_APPLY_CHANGESET,
    "skew_report": ORACLE_SKEW_REPORT,
    "zorder_events": ORACLE_ZORDER_EVENTS,
    "incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
    "bm25_search": ORACLE_BM25_SEARCH,
    "boilerplate_stats": ORACLE_BOILERPLATE_STATS,
    "event_rank_suite": ORACLE_EVENT_RANK_SUITE,
    # approx_distinct_users: the raw HLL estimate is engine-specific
    # and not emitted; the hashable surface is the exact distinct count
    # plus the |approx-exact|/exact <= 3*rsd bound flag, which the
    # oracle asserts always-true. A sketch outside its advertised rsd
    # now hash-mismatches at the gate.
    "approx_distinct_users": """
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       count(*) AS n_events,
       TRUE AS approx_within_bound
FROM events GROUP BY event_type""",
}
