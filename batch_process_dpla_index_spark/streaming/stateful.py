"""Custom stateful streaming operators beyond windowed aggregation.

`streaming/windows.py` covers the built-in surface (tumbling / sliding
/ session windows, watermark dedup) plus running totals on both custom
state APIs; this module holds the *algorithmic* state machines — ops
whose per-key state is a learned summary, not a counter.

- anomaly_stream: causal per-key z-score anomaly detection. State is
  a Welford (n, mean, M2) triple per key — O(|keys|) state, constant
  per-event work — and each event is scored against the history
  STRICTLY BEFORE it, so replaying the stream yields exactly the batch
  twin `operators/analytics.py:running_anomaly` (expanding-window,
  current-row-excluded). The batch form is the oracle-verified one;
  the stream is convergence-tested against it.
- decayed_stream: per-key exponentially time-decayed totals with O(1)
  state — the previous totals decay by exp(-lam·Δt) as each event
  folds in, replaying to the batch twin
  `operators/analytics.py:decayed_counts(per_key_reference=True)`.
"""

from __future__ import annotations

ANOMALY_STATE = "n BIGINT, mean DOUBLE, m2 DOUBLE"
ANOMALY_OUTPUT = (
    "event_id BIGINT, user_id BIGINT, zscore DOUBLE, is_anomaly BOOLEAN"
)


def anomaly_stream(stream, threshold: float = 3.0, warmup: int = 5):
    """Score each event against its key's running mean/std (events
    strictly before it in (ts, event_id) order), then fold it into the
    Welford state. Emits one row per input event with the same
    (zscore, is_anomaly) the batch twin computes.

    Rows within a micro-batch are sorted by (ts, event_id) before the
    scan so intra-batch causality matches the batch window's ordering;
    cross-batch causality holds when batches arrive in time order (the
    usual append-stream contract — enforce with a watermark upstream
    if the source can reorder)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    def _round6(x: float) -> float:
        # Mirror Spark's F.round exactly: Java BigDecimal.valueOf uses
        # Double.toString (shortest repr — same as Python's repr) then
        # HALF_UP; Python's built-in round() is half-EVEN and would
        # diverge on .XXXXXX5 boundaries.
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def update(key, pdfs, state):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        ids, zs, flags = [], [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # NULLS FIRST to mirror the batch twin's window ordering
        # (Spark ASC NULLS FIRST); pandas defaults NaT LAST, which
        # would fold undatable events in a different position and
        # diverge every later score for the key
        batch = batch.sort_values(
            ["ts", "event_id"], kind="mergesort", na_position="first"
        )
        for eid, v in zip(batch["event_id"], batch["value"]):
            v = float(v)
            std = math.sqrt(m2 / n) if n > 0 else 0.0
            if n >= warmup and std > 0:
                z = (v - mean) / std
                # flag from the unrounded score (the batch twin rounds
                # only the emitted column, not the threshold input)
                zs.append(_round6(z))
                flags.append(abs(z) > threshold)
            else:
                zs.append(None)
                flags.append(False)
            ids.append(int(eid))
            # Welford fold of the just-scored observation.
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        state.update((int(n), float(mean), float(m2)))
        yield pd.DataFrame(
            {
                "event_id": ids,
                # NULL keys are legal (the batch twin groups them) and
                # arrive as None OR NaN
                "user_id": [None if pd.isna(key[0]) else int(key[0])] * len(ids),
                "zscore": pd.array(zs, dtype="float64"),
                "is_anomaly": flags,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        ANOMALY_OUTPUT,
        ANOMALY_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


DECAY_STATE = "t_last_us BIGINT, dn DOUBLE, dv DOUBLE, n BIGINT"
DECAY_OUTPUT = (
    "user_id BIGINT, n_events BIGINT, decayed_n DOUBLE, decayed_value DOUBLE"
)


def decayed_stream(stream, half_life_days: float = 7.0):
    """Per-key exponentially time-decayed activity, maintained ONLINE:
    the streaming twin of
    `operators/analytics.py:decayed_counts(per_key_reference=True)`.

    State per key is O(1) — (t_last_us, decayed_n, decayed_value, n).
    On each event the previous totals decay by
    ``exp(-lam · Δt_since_last)`` and the event folds in with weight
    1; because ``exp(-a)·exp(-b) == exp(-(a+b))`` up to FP, the
    running totals equal the batch definition "every event weighted
    by its age against the key's LATEST event" without ever
    rescanning history. Emits one row per key per micro-batch with
    the current totals (update mode — downstream keeps the latest).

    Same ordering contract as `anomaly_stream`: rows are sorted by
    (ts, event_id) within a micro-batch; cross-batch causality holds
    for append-in-time-order streams. A late event older than the
    key's last-seen timestamp still folds in correctly (its negative
    Δt grows the factor — algebraically exact), but then the "latest
    event" reference no longer advances monotonically; bound
    lateness with a watermark upstream if the source can reorder.
    """
    import math

    import pandas as pd

    lam = math.log(2.0) / half_life_days

    def update(key, pdfs, state):
        t_last, dn, dv, n = (
            state.get if state.exists else (None, 0.0, 0.0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.dropna(subset=["ts"])
        if batch.empty and not state.exists:
            # a key whose rows were ALL undatable: the batch twin
            # (which filters ts IS NOT NULL before grouping) emits no
            # row for it — emitting a zero row (and creating state)
            # here would diverge from the convergence contract
            return
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        # normalize to µs regardless of the Arrow-delivered resolution
        # (datetime64[ns] would make a bare astype(int64) 1000× off)
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")
        vals = batch["value"]
        for t, v in zip(ts_us, vals):
            t = int(t)
            if t_last is not None:
                f = math.exp(-lam * ((t - t_last) / 86400.0e6))
                dn *= f
                dv *= f
            dn += 1.0
            dv += 0.0 if pd.isna(v) else float(v)
            t_last = t
            n += 1
        state.update((t_last, float(dn), float(dv), int(n)))
        yield pd.DataFrame(
            {
                # NULL keys are legal (the batch twin groups them) and
                # arrive as None OR NaN; int() on either would abort
                # the whole query
                "user_id": [None if pd.isna(key[0]) else int(key[0])],
                "n_events": [int(n)],
                "decayed_n": [_round6_top(dn)],
                "decayed_value": [_round6_top(dv)],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        DECAY_OUTPUT,
        DECAY_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _round6_top(x: float) -> float:
    """Module-level twin of anomaly_stream's _round6 (HALF_UP like
    Spark's F.round) for operators defined after it."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


SS_STATE = (
    "items ARRAY<STRING>, cnts ARRAY<BIGINT>, errs ARRAY<BIGINT>, n BIGINT"
)
SS_OUTPUT = (
    "shard INT, item STRING, count_hi BIGINT, err BIGINT, n_shard BIGINT"
)


def topk_stream(stream, item_col: str, capacity: int = 64, n_shards: int = 8):
    """Streaming heavy hitters via SPACE-SAVING sketches — the
    streaming twin of the batch Misra–Gries sweep
    (`operators/sketches.py:heavy_hitters`).

    Items shard by the portable h60 digest into ``n_shards`` state
    groups; each group maintains one Space-Saving sketch of
    ``capacity`` counters (evicting the MIN counter and inheriting its
    count as the newcomer's error). Because an item maps to exactly
    ONE shard, the union of shard sketches IS a global sketch: per
    item, ``count_hi`` is an upper bound on its true stream count and
    ``count_hi − err`` a lower bound (the classic SS guarantee, error
    ≤ n_shard/capacity). With capacity ≥ the shard's distinct items
    the sketch is EXACT — the convergence contract the tests pin
    against the oracle-verified batch counts.

    State is O(n_shards × capacity) regardless of stream length; each
    micro-batch emits every tracked (shard, item) with the running
    ``n_shard``, so the snapshot with the max n_shard per shard is the
    final answer under AvailableNow draining.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    cap = int(capacity)
    if cap < 1:
        raise ValueError(f"topk_stream: capacity must be >= 1, got {capacity}")
    if int(n_shards) < 1:
        # pmod(x, 0) is NULL, which would silently fuse every item into
        # one NULL-key group and void the per-shard error guarantee
        raise ValueError(f"topk_stream: n_shards must be >= 1, got {n_shards}")

    def update(key, pdfs, state):
        if state.exists:
            items, cnts, errs, n = state.get
            counters = {
                i: [int(c), int(e)] for i, c, e in zip(items, cnts, errs)
            }
            n = int(n)
        else:
            counters, n = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        col = batch["__item"].dropna()
        n += len(col)
        # value_counts order is frequency-then-insertion; iterate in a
        # DETERMINISTIC (count desc, item asc) order so min-evictions
        # replay identically across runs and partitionings
        vc = sorted(
            col.value_counts().items(), key=lambda kv: (-kv[1], kv[0])
        )
        for item, cnt in vc:
            c = int(cnt)
            if item in counters:
                counters[item][0] += c
            elif len(counters) < cap:
                counters[item] = [c, 0]
            else:
                # evict the min counter (ties: smallest item string —
                # deterministic); newcomer inherits its count as error
                evict, (mc, _) = min(
                    counters.items(), key=lambda kv: (kv[1][0], kv[0])
                )
                del counters[evict]
                counters[item] = [mc + c, mc]
        state.update(
            (
                list(counters.keys()),
                [v[0] for v in counters.values()],
                [v[1] for v in counters.values()],
                int(n),
            )
        )
        shard = None if pd.isna(key[0]) else int(key[0])
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "item": list(counters.keys()),
                "count_hi": [v[0] for v in counters.values()],
                "err": [v[1] for v in counters.values()],
                "n_shard": [n] * len(counters),
            }
        )

    from batch_process_dpla_index_spark.functions.text import h60
    from pyspark.sql import functions as F

    sharded = stream.select(
        F.col(item_col).cast("string").alias("__item"),
        F.pmod(h60(F.col(item_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
    ).where(F.col("__item").isNotNull())
    return sharded.groupBy("__shard").applyInPandasWithState(
        update, SS_OUTPUT, SS_STATE, "update", GroupStateTimeout.NoTimeout
    )


CUSUM_STATE = "su DOUBLE, mu DOUBLE, sd DOUBLE, md DOUBLE, n BIGINT"
CUSUM_OUTPUT = (
    "user_id BIGINT, n_events BIGINT, cusum_up DOUBLE, cusum_dn DOUBLE,"
    " direction STRING"
)


def cusum_stream(stream, slack_frac: float = 0.1):
    """Streaming CUSUM drift detector — the O(1)-state twin of the
    batch fold (`operators/analytics.py:cusum_changepoint` with
    ``target_col``): rows carry a per-key ``target`` baseline, and the
    state is just the four CUSUM registers plus the count. Each
    micro-batch sorts by (ts, event_id) so intra-batch fold order
    matches the batch twin's time order; cross-batch causality is the
    append-stream contract.

    Emits the running maxima per key per batch — with AvailableNow
    draining, the last emission per key equals the batch twin's row
    exactly (the fold is the same sequence of IEEE adds and maxes).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        su, mu, sd, md, n = (
            state.get if state.exists else (0.0, 0.0, 0.0, 0.0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(
            ["ts", "event_id"], kind="mergesort", na_position="first"
        )
        # Batch-twin NULL parity: cusum_changepoint filters value IS NOT
        # NULL before grouping, so a key whose every value is NULL gets no
        # batch row. Mirror that — never create state or emit for such a
        # key (same guard decayed_stream uses for empty batches).
        if not state.exists and not batch["value"].notna().any():
            return
        for v, tgt in zip(batch["value"], batch["target"]):
            if pd.isna(v):
                continue
            v = float(v)
            mean = float(tgt)
            slack = slack_frac * abs(mean)
            su = max(0.0, su + (v - mean - slack))
            mu = max(mu, su)
            sd = max(0.0, sd + (mean - v - slack))
            md = max(md, sd)
            n += 1
        state.update((float(su), float(mu), float(sd), float(md), int(n)))
        up, dn = _round6_top(mu), _round6_top(md)
        if up == 0.0 and dn == 0.0:
            direction = "none"
        elif up >= dn:
            direction = "up"
        else:
            direction = "dn"
        yield pd.DataFrame(
            {
                "user_id": [None if pd.isna(key[0]) else int(key[0])],
                "n_events": [int(n)],
                "cusum_up": [up],
                "cusum_dn": [dn],
                "direction": [direction],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update, CUSUM_OUTPUT, CUSUM_STATE, "update", GroupStateTimeout.NoTimeout
    )


SIG_PERMS = 64
SIG_STATE = "mins ARRAY<BIGINT>, n_docs BIGINT"
SIG_OUTPUT = "source STRING, n_docs BIGINT, sig ARRAY<BIGINT>"


def signature_stream(stream, text_col: str = "text", source_col: str = "source", n: int = 3):
    """Per-source union-MinHash signatures maintained ONLINE — the
    streaming twin of `operators/dedup.py:source_signatures` and the
    live feed for the persisted overlap index
    (`products/overlap_index.py`).

    State per source is O(SIG_PERMS) ints (the per-perm running mins
    plus a doc counter) — |sources| × 65 ints total, regardless of
    stream length. Each micro-batch folds its documents' shingle
    hashes into the mins with one numpy broadcast per doc; min is
    idempotent and order-free, so replayed or reordered batches
    CANNOT corrupt the SIGNATURE (the same algebra that makes the
    batch product's refresh idempotent). The ``n_docs`` counter is
    informational and NOT replay-idempotent — an at-least-once
    upstream that redelivers a document overcounts it (the signature
    stays exact); treat it as a progress gauge, not an exact count.
    Emits the current (source, n_docs, sig) per source per batch in
    update mode — the drained snapshot's signature equals the batch
    operator exactly (pinned by
    test_signature_stream_converges_to_batch).

    The ``source`` key is cast to STRING on input (the static
    state/output DDL pins it, the topk_stream item precedent) — a
    numeric source column works, emitted as its string form; compare
    against a batch twin keyed on the same cast.

    Tokenization stays JVM-side on purpose: the input projects
    through the SAME `functions.text.tokens` expression the batch
    tiers use, so the Python side only shingles and hashes — zero
    tokenizer-divergence risk between stream and batch (the
    shingle/hash math is the `_minhash_sig_pandas` fold verbatim:
    md5-h60 base, affine `_perm_params` rehashes, whole-text shingle
    for sub-n docs, empty docs contribute nothing).

    ``num_perm`` is pinned to ``SIG_PERMS`` (the state/output schemas
    are static DDL strings); the batch twin defaults to the same 64.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from batch_process_dpla_index_spark.operators.dedup import (
        _doc_shingle_mins,
        _perm_params,
        _py_word_shingles,
    )

    params = _perm_params(SIG_PERMS)
    a_vec = np.array([p[0] for p in params], dtype=np.uint64)[:, None]
    b_vec = np.array([p[1] for p in params], dtype=np.uint64)[:, None]

    def update(key, pdfs, state):
        if state.exists:
            mins_list, n_docs = state.get
            mins = np.array(mins_list, dtype=np.uint64)
            n_docs = int(n_docs)
        else:
            mins, n_docs = None, 0
        for pdf in pdfs:
            for tok in pdf["__tok"]:
                if tok is None or len(tok) == 0:
                    continue  # empty doc: no shingles, exactly the batch tier
                # shingle rules + hash fold are the SHARED helpers the
                # Arrow batch tier uses — one definition, zero
                # divergence risk (operators/dedup.py:_py_word_shingles
                # / _doc_shingle_mins)
                doc_mins = _doc_shingle_mins(
                    _py_word_shingles(tok, n), a_vec, b_vec
                )
                mins = doc_mins if mins is None else np.minimum(mins, doc_mins)
                n_docs += 1
        if mins is None:
            # only reachable when state did NOT exist (an existing
            # source loads its mins above) and every doc in the batch
            # was empty: no state, no row — the batch twin has no row
            # for such a source either
            return
        state.update((mins.astype("int64").tolist(), int(n_docs)))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "n_docs": [int(n_docs)],
                "sig": [mins.astype("int64").tolist()],
            }
        )

    from pyspark.sql import functions as F

    from batch_process_dpla_index_spark.functions.text import tokens

    projected = stream.where(F.col(source_col).isNotNull()).select(
        F.col(source_col).cast("string").alias("source"),
        tokens(F.col(text_col)).alias("__tok"),
    )
    return projected.groupBy("source").applyInPandasWithState(
        update, SIG_OUTPUT, SIG_STATE, "update", GroupStateTimeout.NoTimeout
    )
