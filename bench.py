"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed as plan-build + full materialization (count of a
collect-free action) — the same work the driver's correctness run does,
minus the DuckDB comparison. Times include Catalyst planning but share
one JVM/session (startup excluded, like a warm cluster).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# FROZEN GATE CONSTANTS (r15 VERDICT governance note / r16 VERDICT #6).
# These three numbers ARE the bench gate; they were adjudicated in
# VERDICT r15 and must not change without a VERDICT citation in the
# same commit — loosening any of them is gate-tampering:
#   GATE_RATIO    — a query fails when it runs >2x its first-recorded
#                   BASELINE.md pin (r8 verdict item 6).
#   WARM_RUNS     — every over-ratio query is re-run this many times
#                   in-process and judged on its best warm time
#                   (r9 verdict item 8).
#   ABS_FLOOR_SEC — a warm over-ratio only fails outright when it is
#                   also this many seconds over its pin (r14→r15: sub-
#                   second pins flap on ~0.3 s of host noise). A query
#                   over-ratio but under the floor is NOT forgiven
#                   forever: it is recorded in
#                   `warm_over_ratio_floor_exempt`, and if it appears
#                   there on two CONSECUTIVE runs it fails the second
#                   one (r16 ADVICE — a persistent sub-second plan
#                   regression can no longer hide under the floor).
# ---------------------------------------------------------------------------
GATE_RATIO = 2.0
WARM_RUNS = 4
ABS_FLOOR_SEC = 0.5


def main():
    # host-contention receipt (VERDICT r12 #5): two rounds running the
    # committed bench carried flat ~1.25-1.4x inflation across untouched
    # queries while the clean-host evidence lived only in BASELINE.md
    # prose — record 1-min loadavg at start AND end IN the JSON so the
    # canonical artifact self-documents whether the host was idle
    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_start = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        # non-sfN dir (e.g. a .scale/sf1x replica): still benchable,
        # just unidentifiable as a scale factor — and never comparable
        # to the sf0.1 BASELINE.md rows
        sf = -1.0

    # previous run's floor-exempt record, read BEFORE this run
    # overwrites BENCH_LOCAL.json (consecutive-run escalation — see the
    # frozen-constants header)
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    # escalation state is only ever GENERATED at sf0.1 (baselines
    # exist only there); non-sf0.1 probes carry it through verbatim on
    # write (below), so reading unconditionally is safe and a probe
    # between two gate runs can neither consume nor reset the clock
    prev_floor_exempt: set[str] = set()
    try:
        with open(local_path, encoding="utf-8") as f:
            prev_floor_exempt = set(
                json.load(f).get("warm_over_ratio_floor_exempt", [])
            )
    except (OSError, ValueError):
        # visible reset (r16 ADVICE): a missing/corrupt BENCH_LOCAL.json
        # silently re-arms the one-run shield the escalation exists to
        # remove — say so in the run receipt instead of hiding it
        print(
            "# floor-exempt history unavailable, escalation clock reset",
            file=sys.stderr,
        )

    from batch_process_dpla_index_spark.operators.dedup import unpersist_deps
    from batch_process_dpla_index_spark.queries import QUERIES
    from batch_process_dpla_index_spark.session import get_spark

    spark = get_spark()
    # warm the JVM + parquet footers once so per-query times measure the
    # query, not session bootstrap — ALL tables, not just lineitem: the
    # window rotation puts arbitrary queries first, and a head query
    # reading a cold table absorbs its footer/listing cost (r7:
    # quality_gate tripped its 2x baseline gate purely by rotating to
    # position 3 over a cold documents.parquet).
    #
    # PERSIST the fixtures into Spark storage (r15, after the run-3
    # warm-slower-than-COLD inversion): this VM reclaims the OS page
    # cache mid-run (free -g reads buff/cache ≈1 GB right after a
    # 500 s bench), so late queries — including the 4×-warm
    # adjudication re-runs — re-read parquet from virtio at whatever
    # throughput the hypervisor grants that second, and the gate
    # measures host weather instead of plans. sf0.1 is ~18 MB of
    # parquet against an 8 GB heap; CacheManager substitutes the
    # InMemoryRelation into every later plan-equal read (verified
    # through load_table and registry queries). Pins stay comparable:
    # they were recorded page-cache-WARM, and a storage-memory scan of
    # this size costs the same as a page-cache one — the change
    # removes only the eviction cliff, not scan work.
    from batch_process_dpla_index_spark.sources.tables import load_table

    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).persist().count()
        except Exception:
            # warmup must never abort the run: a missing/corrupt table
            # only fails its own queries in the error-tolerant loop
            # below, same contract as before this loop existed
            pass
    # ...and the Python-worker pool + Arrow channel: the first
    # Arrow-batched query otherwise absorbs worker cold-start (~3 s),
    # and the correctness-window rotation can put any query first
    from pyspark.sql import functions as F

    # lambda form: `from __future__ import annotations` stringifies
    # type hints, which pandas_udf's hint inference rejects
    _warm = F.pandas_udf(lambda s: s + 1, "long")
    spark.range(1024).select(_warm("id")).count()
    # ...and the OTHER two Arrow execution paths: scalar pandas_udf,
    # applyInPandas (grouped-map) and mapInArrow each spin up their
    # own worker/serializer machinery on first use, and whichever
    # query sits at window position 1 otherwise absorbs it
    # (ivf_pq_topk read 4.79x cold / 0.53x warm in r10 purely from
    # landing at the head — VERDICT r10 #5)
    warm_df = spark.range(1024).withColumn("g", F.col("id") % 4)
    warm_df.groupBy("g").applyInPandas(
        lambda pdf: pdf.head(1), "id long, g long"
    ).count()
    warm_df.mapInArrow(lambda it: it, "id long, g long").count()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        df = None
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            # stop the clock BEFORE cache release: unpersist is
            # bookkeeping, not query cost, and the baselines were
            # recorded under that semantics
            elapsed = time.time() - t0
        except Exception as exc:  # one broken query must never erase the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)
            continue
        finally:
            # release pair-operator caches (the _with_cached_deps
            # discipline) so 100+ queries don't accumulate persisted
            # frames and skew later timings via memory pressure —
            # ERROR paths included, or one failing query leaks its
            # persists into every subsequent timing
            if df is not None:
                unpersist_deps(df)
        times[name] = round(elapsed, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    # Composed product pipelines (index build+serve, curation export,
    # sitemap, compaction) — timed end-to-end in a scratch dir so the
    # 2x gate covers what users actually run, not just the stages.
    import shutil
    import tempfile

    from batch_process_dpla_index_spark.products.bench_targets import (
        PRODUCT_BENCHES,
    )

    for name, fn in PRODUCT_BENCHES.items():
        work_dir = tempfile.mkdtemp(prefix=f"bench_{name}_")
        t0 = time.time()
        try:
            n = fn(spark, sf_dir, work_dir)
            # stop the clock before cleanup: scratch-dir deletion is
            # disk-state noise, not pipeline cost
            elapsed = time.time() - t0
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)
            continue
        finally:
            shutil.rmtree(work_dir, ignore_errors=True)
        times[name] = round(elapsed, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)

    # Mechanical noise normalization (round-8 verdict item 6): the
    # run-level common-query ratio vs BASELINE.md's first-recorded
    # per-query rows ("| name | sec |"). A uniform host slowdown shows
    # up as baseline_ratio >> 1 with FLAT per-query ratios; a genuine
    # regression shows up as one query's ratio spiking — the 2× gate
    # math becomes arithmetic on this block instead of hand-written
    # prose.
    baseline: dict[str, float] = {}
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE.md"
    )
    try:
        import re

        with open(baseline_path, encoding="utf-8") as f:
            # no $ anchor: the product table rows carry a third
            # description column ("| product_sitemap | 0.63 | id scan
            # ... |") and an end-anchored match silently dropped all 8
            # product_* targets out of the 2x gate (VERDICT r10 #2)
            for m in re.finditer(
                r"^\| ([a-z0-9_]+) \| ([0-9.]+) \|", f.read(), re.M
            ):
                # first occurrence wins: baselines are first-recorded
                baseline.setdefault(m.group(1), float(m.group(2)))
    except OSError as exc:
        print(f"# BASELINE.md read failed: {exc}", file=sys.stderr)
    if sf != 0.1:
        # BASELINE.md rows are sf0.1 figures; a cross-SF ratio would
        # read as a huge win/regression that is really just data size
        baseline = {}
    common = sorted(set(times) & set(baseline))
    ratios = {
        q: round(times[q] / baseline[q], 3) if baseline[q] > 0 else None
        for q in common
    }
    base_sum = sum(baseline[q] for q in common)
    baseline_ratio = round(
        sum(times[q] for q in common) / base_sum, 3
    ) if base_sum > 0 else None

    # Mechanical warm adjudication (round-9 verdict item 8): every
    # query over the 2x gate is re-run 4x warm IN THIS PROCESS and
    # judged on its best warm time. The window-head first-run premium
    # (keep_first r9, hash_sample_split r8) re-benches clean under
    # this protocol; a genuine plan regression stays >2x warm and
    # fails the run — the adjudication that used to be BASELINE.md
    # prose is now the exit code.
    over2_names = [
        q for q, r in ratios.items() if r is not None and r > GATE_RATIO
    ]
    warm_times: dict[str, list[float]] = {}
    warm_ratios: dict[str, float] = {}
    for name in over2_names:
        runs: list[float] = []
        for _ in range(WARM_RUNS):
            t0 = time.time()
            df = None
            work_dir = None
            try:
                if name in QUERIES:
                    df = QUERIES[name](spark, sf_dir)
                    df.count()
                else:
                    work_dir = tempfile.mkdtemp(prefix=f"bench_{name}_")
                    PRODUCT_BENCHES[name](spark, sf_dir, work_dir)
                runs.append(round(time.time() - t0, 3))
            except Exception as exc:
                errors.setdefault(
                    f"warm:{name}", f"{type(exc).__name__}: {exc}"[:500]
                )
                break
            finally:
                if df is not None:
                    unpersist_deps(df)
                if work_dir is not None:
                    shutil.rmtree(work_dir, ignore_errors=True)
        if runs:
            warm_times[name] = runs
            warm_ratios[name] = round(min(runs) / baseline[name], 3)
            print(
                f"# warm {name}: {runs} -> ratio {warm_ratios[name]}",
                file=sys.stderr,
            )
    # Absolute-delta floor (round-14 verdict item 4; constant frozen in
    # the header): a warm ratio is a FAIL only when it is both >2x AND
    # more than ABS_FLOOR_SEC over its pin in absolute terms.
    # Sub-second pins (rolling_hash 0.18 s, scd2_history 0.54 s in r14)
    # can read >2x from ~0.3 s of host noise — page-cache reclaim +
    # py4j jitter on this VM — which is below the run-to-run variance
    # of ANY query here; a genuine plan regression on a query worth
    # gating costs whole seconds. The ratios still land in warm_ratios
    # for the record — only the gate applies the floor.
    warm_over_2 = {
        q: r
        for q, r in warm_ratios.items()
        if r > GATE_RATIO
        and (min(warm_times[q]) - baseline[q]) > ABS_FLOOR_SEC
    }
    # Consecutive-run escalation (r16 ADVICE): queries warm over-ratio
    # but under the absolute floor are recorded; if the PREVIOUS run's
    # committed BENCH_LOCAL.json (read before this run overwrites it)
    # carries the same query in its floor-exempt list, the floor no
    # longer shields it — two runs of "over 2x but small" is a
    # persistent regression, not noise.
    floor_exempt = sorted(
        q
        for q, r in warm_ratios.items()
        if r > GATE_RATIO and q not in warm_over_2
    )
    repeat_offenders = sorted(set(floor_exempt) & prev_floor_exempt)
    # the recorded state: generated fresh at sf0.1, carried through
    # verbatim by probes at other SFs (no baselines there — floor_
    # exempt is vacuously empty and must not reset the clock)
    exempt_record = floor_exempt if sf == 0.1 else sorted(prev_floor_exempt)
    for q in repeat_offenders:
        warm_over_2[q] = warm_ratios[q]
    # a >2x query whose warm re-run CRASHED must fail the gate, not
    # slip past it with no warm_ratio — a crash is the worst class of
    # regression, and an empty `runs` list would otherwise exit 0
    for name in over2_names:
        if name not in warm_ratios:
            warm_over_2[name] = None

    try:
        load_end = round(os.getloadavg()[0], 2)
    except OSError:
        load_end = None
    out = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # contention receipt: 1-min loadavg before warmup / after the
        # last timed run. Note load_end on a HEALTHY bench reads ~the
        # core count (this process IS the load); the signal is
        # load_start >> 0 or load_end >> n_cpus — competing work
        "loadavg": {"start": load_start, "end": load_end},
        # warm adjudication record: 4 same-process re-run times and the
        # min-based ratio for every query whose first-run ratio was >2x
        "warm_times": warm_times,
        "warm_ratios": warm_ratios,
        # over-ratio-but-under-floor record: fed into the NEXT run's
        # consecutive-run escalation (frozen-constants header)
        "warm_over_ratio_floor_exempt": exempt_record,
        "warm_repeat_offenders": repeat_offenders,
        # `value` sums only the SUCCEEDING queries — consumers must
        # check `complete`/`errors` before reading it as a speedup
        # (a newly-crashing query would otherwise look like a win).
        "complete": not errors,
        # run-level common-query ratio vs BASELINE.md (first-recorded
        # rows); per-query ratios land in BENCH_LOCAL.json, the stdout
        # line carries the aggregate + any >2x offenders
        "baseline_ratio": baseline_ratio,
        "n_common": len(common),
        "baseline_ratios": ratios,
    }
    if errors:
        out["errors"] = errors
        out["n_errors"] = len(errors)
    # Self-record the complete result: the driver captures only the tail
    # of stdout, which truncated 14 queries' timings out of BENCH_r04.
    # The file is the durable artifact; the stdout line is the contract.
    try:
        with open(local_path, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:  # never let recording kill the contract line
        print(f"# BENCH_LOCAL.json write failed: {exc}", file=sys.stderr)
    # The driver keeps only the LAST ~2000 chars of output and parses
    # the JSON it finds there; the full 120-query dict is ~2900 chars
    # compact (names alone are ~1800), so a complete line can never
    # survive the window — BENCH_r0{3..6}.json all have parsed:null
    # with the head of the line sheared off. Emit a line that FITS:
    # totals + the slowest queries that squeeze under the budget, with
    # an omission count; BENCH_LOCAL.json (committed) keeps every
    # timing.
    budget = 1800
    line_out = {
        k: v
        for k, v in out.items()
        # warm_times stays in BENCH_LOCAL.json only: 4 floats per
        # adjudicated query would eat the 1800-char stdout budget that
        # exists to carry per-query timings; warm_ratios is the verdict
        if k not in ("queries", "baseline_ratios", "warm_times")
    }
    # the 2x-gate offenders, mechanically: every common query whose
    # normalized ratio exceeds 2 rides the stdout line by name
    over2 = {
        q: r for q, r in ratios.items() if r is not None and r > GATE_RATIO
    }
    line_out["ratios_over_2"] = dict(
        sorted(over2.items(), key=lambda kv: -kv[1])[:12]
    )
    line_out["n_over_2"] = len(over2)
    line_out["warm_ratios"] = warm_ratios
    line_out["warm_over_2"] = warm_over_2
    # exempt_record already rides line_out via `out` (not excluded
    # above) — no separate assignment, ONE source of truth
    line_out["n_queries"] = len(times)
    line_out["full"] = "BENCH_LOCAL.json"
    by_cost = sorted(times.items(), key=lambda kv: (-kv[1], kv[0]))
    kept: dict[str, float] = {}
    for qname, t in by_cost:
        trial = dict(line_out)
        trial["queries"] = {**kept, qname: t}
        trial["queries_omitted"] = len(times) - len(trial["queries"])
        if len(json.dumps(trial, separators=(",", ":"))) > budget:
            break
        kept[qname] = t
    line_out["queries"] = kept
    line_out["queries_omitted"] = len(times) - len(kept)
    print(json.dumps(line_out, separators=(",", ":")))
    # the warm verdict IS the exit code: a query that exceeds 2x on
    # its recorded run AND on its best of 4 warm re-runs is a real
    # regression, not a position artifact
    if warm_over_2:
        print(
            f"# FAIL warm-adjudicated >2x: {warm_over_2}", file=sys.stderr
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
