"""Fixed-vocabulary linear quality classifier (fastText-style scorer).

A production curation pipeline scores documents with a trained linear
classifier over token features (fastText / logistic regression); the
model itself is trained offline — what the ENGINE must provide is the
vectorized scoring pass. This module pins a deterministic small model
(vocabulary → weight) so the scoring operator is exactly testable: the
weights are a pure function of the term via the engine-portable h60
digest, biased positive for formal/informative terms and negative for
spam/boilerplate terms, so scores are reproducible in any engine
without shipping a model artifact.

Scoring: ``sigmoid(bias + sum(weight[token]) / n_tokens)`` — the
per-token weight sum is a left fold over the token array (strict
left-to-right double addition, mirrored verbatim by the DuckDB oracle),
normalized by length so long documents aren't advantaged. Entirely
narrow expressions — zero shuffles, codegen'd end to end.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.functions.text import token_count, tokens

#: Terms with hand-assigned polarity; the magnitude is h60-derived so
#: the weight table is deterministic and engine-reproducible.
POSITIVE_TERMS = (
    "analysis", "research", "method", "data", "study", "result",
    "evidence", "theory", "chapter", "figure", "university", "journal",
    "author", "published", "abstract", "introduction", "conclusion",
    "reference", "library", "archive",
)
NEGATIVE_TERMS = (
    "click", "subscribe", "free", "buy", "winner", "casino", "viagra",
    "lottery", "prize", "offer", "discount", "limited", "deal", "cash",
    "earn", "cheap", "guarantee", "unsubscribe", "cookie", "advert",
)
BIAS = -0.25


def _h60_py(s: str) -> int:
    """Python twin of functions.text.h60 (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def term_weights() -> dict[str, float]:
    """term → weight in [-1, 1]; sign from polarity, magnitude from
    h60 so the table is a deterministic constant in every engine."""
    out: dict[str, float] = {}
    for t in POSITIVE_TERMS:
        out[t] = round(0.25 + (_h60_py("qw:" + t) % 751) / 1000.0, 3)
    for t in NEGATIVE_TERMS:
        out[t] = round(-0.25 - (_h60_py("qw:" + t) % 751) / 1000.0, 3)
    return out


def classifier_score(col: Column) -> Column:
    """sigmoid(BIAS + fold(weight[token]) / n_tokens); 0.5 for empty
    docs' neutral prior. Pure Column expressions — the weight table is
    a literal map in the plan, no join, no shuffle."""
    weights = term_weights()
    pairs: list[Column] = []
    for term, w in sorted(weights.items()):
        pairs.append(F.lit(term))
        pairs.append(F.lit(float(w)))
    wmap = F.create_map(*pairs)
    tok = tokens(col)
    total = F.aggregate(
        tok,
        F.lit(0.0),
        lambda acc, t: acc + F.coalesce(wmap[t], F.lit(0.0)),
    )
    n = token_count(col)
    logit = F.when(n > 0, F.lit(BIAS) + total / n).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
