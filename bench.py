"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized with the no-op sink (full execution, zero
serialization-to-driver cost), which is the fair analogue of the reference
streaming results to a client.
"""

from __future__ import annotations

import json
import os
import time

import __spark_entry__ as entry_mod
from influxdb_iox_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_revenue",
    "rpc_read_filter",
    "rpc_read_group_two_tags",
    "rpc_window_agg_1h",
    "rpc_selector_last_first",
    "dedup_last_non_null",
    "doc_token_stats",
    "doc_exact_dedup",
    "doc_lang_id",
    "minhash_near_dup",
    "emb_cosine_topk",
    # round-5 additions (VERDICT r04 §6): track the codegen-SimHash claim
    # and the corpus path in the driver bench, not just BENCH_NOTES.
    "simhash_near_dup",
    "corpus_ngram_topk",
    # round-5 continuation: the incremental-dedup index path (build the
    # even-doc index + anti-join the odd-doc batch — the continuous-ingest
    # accept step a 100 TB pipeline runs per shard)
    "doc_incremental_dedup",
    # round-6 additions: the union-and-window as-of join and the
    # distinct-count Q21 shape
    "events_asof_join",
    "tpch_q21_waiting_supplier",
    # round-6 continuation: segment-level (word-window) dedup and the
    # single-exchange series transform suite
    "doc_paragraph_dedup",
    "series_transforms",
    # round-10 addition: the recursive technical-analysis path (one
    # applyInPandas per statement) — tracks the Arrow-batch + per-series
    # Python-recurrence cost in the driver bench
    "influxql_ema",
    # round-11 addition: the PQ embedding path (write-path integer encode
    # + JVM-side asymmetric-distance top-k over 32x-compressed codes)
    "ann_pq_topk",
    # round-11 addition: series pattern similarity search (one window
    # pass over every series, exact-integer correlation, TakeOrdered)
    "series_pattern_topk",
    # round-12 addition: the NB classifier train-and-score path (two hash
    # aggregates + one token-keyed join against the label-pivoted counts)
    "doc_nb_classify",
    # round-12 additions: exact duplicate-substring spans (per-character
    # window fan-out -> count -> join-back -> island merge; tracks the
    # fan-out-parallelism posture) and DSIR importance weights (hashed
    # features, broadcast-forever bucket models)
    "doc_dup_spans",
    "doc_dsir_weights",
    # round-12 addition: BM25 build-and-query in one DAG (the postings
    # aggregate + broadcast df slice + TakeOrdered — index amortizes in
    # production via save/update_bm25, same posture as incremental dedup)
    "doc_bm25_topk",
    # round-12 addition: the time-series decomposition path (exact-decimal
    # hourly bucketing + one series-keyed window pass + phase-mean
    # broadcast) — tracks the events-table heavy aggregate + window shape
    "series_seasonal_decompose",
    # round-13 addition: ExactSubstr REMOVAL end-to-end (span mine +
    # keep-first rank + codegen splice rewrite) — tracks the heaviest
    # document-rewrite shape in the suite
    "doc_dup_span_removal",
    # round-13 addition: CUSUM changepoints (ordered-window prefix sums +
    # one series aggregate on a shared exchange, integer threshold test)
    "series_changepoints",
    # round-14 addition: all-pairs sketch intersection (bottom-k build +
    # cells-only self-join with array algebra — tracks the answer-from-
    # sketches posture in the driver bench)
    "events_kmv_overlap",
    # round-14 additions: gaps-and-islands sessionization (one shared
    # series exchange for two windows + the session aggregate) and
    # parallel LTTB (integer triangle-area argmax via WindowGroupLimit)
    "events_sessionize",
    "events_lttb_downsample",
    # round-15 addition: bucketized interval join (point-in-interval as an
    # equi-join on covering time buckets — the nested-loop trap avoided)
    "events_interval_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    load_start = os.getloadavg()
    spark = get_spark(
        app_name="iox-spark-bench",
        master=f"local[{cpus}]",
        # keep stdout clean: the driver records only the LAST 2000 chars of
        # stdout and JSON-parses the final line — progress bars waste window
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Warm the JVM: a trivial parquet action plus one small decimal/hash
    # aggregate to trigger the codegen/JIT paths the headline queries use.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    import pyspark.sql.functions as F

    spark.range(1000).agg(
        F.sum(F.col("id").cast("decimal(12,2)")), F.min(F.hash("id"))
    ).collect()
    # Compile the two heaviest pipelines' codegen classes on tiny inputs so
    # the timed runs measure execution, not first-run JIT (the generated
    # classes are identical — same literals and plan shapes).
    from influxdb_iox_spark.pipeline.dedup import near_duplicate_pairs_minhash
    from influxdb_iox_spark.schema import InfluxColumnType as _ICT, IoxSchema as _IS
    from influxdb_iox_spark.sources.line_protocol import distributed_parse as _dp

    # 2000 docs, not 50: the minhash pipeline's generated classes only
    # fully JIT under real batch sizes — with a tiny warm, a fresh JVM's
    # timed runs swing ±45% run-to-run; with this warm the 3-consecutive-
    # run spread is <10% (BENCH_NOTES r6 conditions)
    warm_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2000)
    near_duplicate_pairs_minhash(
        warm_docs, threshold=0.5, materialize="parquet"
    ).write.mode("overwrite").format("noop").save()
    _warm_lines = spark.createDataFrame(
        [("events,event_type=a,user_id=u1 value=1.0 100",)], "value string"
    )
    _warm_schema = _IS.build(
        ["event_type", "user_id"], {"value": _ICT.FIELD_FLOAT}
    )
    _dp(_warm_lines, _warm_schema, "events", 0).count()

    # Sentinel: a fixed query whose code never changes round to round — its
    # time is pure machine/JVM conditions, so round-over-round deltas in the
    # headline numbers can be attributed (code vs environment).
    def _sentinel_once() -> float:
        t0 = time.perf_counter()
        spark.range(5_000_000).select(
            F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
            F.min(F.hash("id")).alias("h"),
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    def _sentinel() -> float:
        return round(min(_sentinel_once() for _ in range(3)), 3)

    # UNTIMED warmups of the sentinel query itself, then a min-of-3
    # bracket: the pre-run bracket otherwise measures JIT compilation of
    # the sentinel's decimal-sum codegen (~0.20 s on a fresh JVM vs 0.10
    # warm — r13 and r14 both carried noisy_host solely from this
    # artifact while their per-row medians ran quiet), and one warmup +
    # min-of-2 still read 0.13-0.15 on hosts whose 36-sample per-row
    # medians held 0.096-0.111 (r15 attempts 3-5): C2 tiering needs a
    # few executions, and a 2-sample min is a wide estimator.  Per-row
    # sentinels execute JIT-warm; the bracket exists to measure MACHINE
    # state and must read the same steady state they do.
    _sentinel_once()
    _sentinel_once()
    sentinel_before = _sentinel()

    # Two timed runs per query; report the minimum as the headline number
    # (local[32] micro-task stages show multi-second scheduler/GC jitter)
    # and the SECOND run separately so JIT-warm vs steady-state is visible
    # per query (a big run1/run2 gap means the min still contains warmup).
    # A single-shot sentinel runs IMMEDIATELY BEFORE each query: bracket
    # sentinels cannot attribute a MID-RUN co-tenant spike (r6: loadavg
    # 2.4→9.5 with clean bookends while minhash regressed 44%); a per-row
    # sentinel_sec makes the machine's state at that moment part of the
    # record, so a slow row with a slow sentinel is environmental and a
    # slow row with a clean sentinel is the code's.
    # Dirty-run policy (VERDICT r9 §5): a row measured under co-tenant load
    # (its sentinel >=1.5x the running median — tightened from 3x per
    # VERDICT r16 item 1: seven rows slipped through at 1.5-2x and had to
    # be argued away as environmental) or with runs disagreeing >3x
    # (a mid-run spike the sentinel bracketed past — r9's q1 run2 hit 27s
    # under loadavg 6.3 on identical code) is re-measured ONCE, and the
    # retried names are recorded on the driver line so a reader can tell a
    # re-measured row from a first-try-clean one.
    timings: dict[str, float] = {}
    timings_run1: dict[str, float] = {}
    timings_run2: dict[str, float] = {}
    sentinels: dict[str, float] = {}
    loadavgs: dict[str, float] = {}
    retried: list[str] = []

    def _sentinel_median() -> float:
        vals = sorted([sentinel_before, *sentinels.values()])
        return vals[len(vals) // 2]

    def _run_pair(fn) -> list[float]:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        return runs

    def _dirty(sent: float, runs: list[float]) -> bool:
        return (
            sent >= 1.5 * _sentinel_median()
            or max(runs) > 3 * max(min(runs), 1e-9)
        )

    for name in HEADLINE:
        fn = queries[name]
        sentinels[name] = round(_sentinel_once(), 3)
        loadavgs[name] = round(os.getloadavg()[0], 2)
        runs = _run_pair(fn)
        if _dirty(sentinels[name], runs):
            retried.append(name)
            sentinels[name] = round(_sentinel_once(), 3)
            loadavgs[name] = round(os.getloadavg()[0], 2)
            runs = _run_pair(fn)
        timings[name] = round(min(runs), 3)
        timings_run1[name] = round(runs[0], 3)
        timings_run2[name] = round(runs[1], 3)

    # ingest throughput: format the events table as line protocol in-plan,
    # then distributed-parse it back (the full ingest hot path, no disk)
    from pyspark.sql import functions as F

    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.line_protocol import distributed_parse

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(events.dtypes)["ts"].startswith("timestamp"):
        # ntz needs an ltz cast before unix_micros; session TZ is UTC
        events = events.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    lines_df = events.select(
        F.concat(
            F.lit("events,event_type="), F.col("event_type"),
            F.lit(",user_id=u"), F.col("user_id"),
            F.lit(" value="), F.col("value"),
            F.lit(" "), F.col("ts"),
        ).alias("value")
    )
    schema = IoxSchema.build(
        ["event_type", "user_id"], {"value": InfluxColumnType.FIELD_FLOAT}
    )
    sentinels["ingest_line_protocol"] = round(_sentinel_once(), 3)
    loadavgs["ingest_line_protocol"] = round(os.getloadavg()[0], 2)
    t0 = time.perf_counter()
    n = distributed_parse(lines_df, schema, "events", 0).count()
    timings["ingest_line_protocol"] = round(time.perf_counter() - t0, 3)
    assert n == events.count()
    if sentinels["ingest_line_protocol"] >= 1.5 * _sentinel_median():
        retried.append("ingest_line_protocol")
        sentinels["ingest_line_protocol"] = round(_sentinel_once(), 3)
        loadavgs["ingest_line_protocol"] = round(os.getloadavg()[0], 2)
        t0 = time.perf_counter()
        distributed_parse(lines_df, schema, "events", 0).count()
        timings["ingest_line_protocol"] = round(
            min(timings["ingest_line_protocol"], time.perf_counter() - t0), 3
        )

    sentinel_after = _sentinel()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    conditions = {
        "cpus": int(cpus),
        "fresh_jvm": True,
        "loadavg_start": round(load_start[0], 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "sentinel_before_sec": sentinel_before,
        "sentinel_after_sec": sentinel_after,
    }
    if timings_run2:
        worst = max(
            (k for k in timings_run1 if timings_run2.get(k, 0) > 0),
            key=lambda k: timings_run1[k] / timings_run2[k],
            default=None,
        )
        if worst is not None:
            conditions["first_warm_worst"] = [
                worst, round(timings_run1[worst] / timings_run2[worst], 2)
            ]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query detail (run2 timings + every per-row sentinel) goes to a
    # sidecar file: the driver captures only the LAST 2000 chars of stdout and
    # JSON-parses the final line, so the printed line must stay well under
    # that (round 7's 3.5k-char line was cut mid-dict and recorded as
    # parsed:null). The sidecar is committed per-round via BENCH_NOTES.
    # first/warm per query: run1 is the fresh-JVM FIRST execution (plan
    # compile + codegen + JIT), run2 the warm steady state. A big ratio
    # means the headline min still contains warmup cost a long-lived
    # server would amortize away.
    first_warm = {
        k: round(timings_run1[k] / timings_run2[k], 2)
        for k in timings_run1
        if timings_run2.get(k, 0) > 0
    }
    detail = {
        "queries": timings,
        "queries_run1": timings_run1,
        "queries_run2": timings_run2,
        "first_warm_ratio": first_warm,
        "sentinels": sentinels,
        # 1-minute loadavg sampled immediately before each row's timed
        # runs (VERDICT r16 item 1: per-row load attribution so a storm
        # wave mid-run is visible in the record, not argued post-hoc)
        "loadavg_per_row": loadavgs,
        "retried": retried,
        "conditions": conditions,
        "sf": sf_val,
    }
    with open(os.path.join(os.path.dirname(__file__), "bench_detail.json"), "w") as f:
        json.dump(detail, f, indent=1)

    print(build_output_line(timings, sentinels, conditions, sf_val, retried))
    spark.stop()


# the round-4 headline set, pinned as an ALLOWLIST so later additions to
# HEADLINE can never silently inflate the cross-round comparable subtotal
_R04_COMPARABLE = frozenset(
    {
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "tpch_q10_returned_revenue",
        "rpc_read_filter",
        "rpc_read_group_two_tags",
        "rpc_window_agg_1h",
        "rpc_selector_last_first",
        "dedup_last_non_null",
        "doc_token_stats",
        "doc_exact_dedup",
        "doc_lang_id",
        "minhash_near_dup",
        "emb_cosine_topk",
        "ingest_line_protocol",
    }
)


def build_output_line(
    timings: dict[str, float],
    sentinels: dict[str, float],
    conditions: dict,
    sf: float | str,
    retried: list[str] | None = None,
) -> str:
    """The ONE JSON line the driver parses. Its tail window is 2000 chars,
    so this line must stay under that; the guard below degrades gracefully
    rather than overflowing (round 7's 3.5k-char line was cut mid-dict).

    Per-row co-tenancy attribution stays on the driver record compactly:
    `sent_hi` lists only rows whose immediately-preceding sentinel ran
    >=1.5x the median sentinel (normally empty — a slow row with a clean
    sentinel is the code's fault, a listed row is environmental)."""
    med = sorted(sentinels.values())[len(sentinels) // 2] if sentinels else 0.0
    sent_hi = {
        k: v for k, v in sentinels.items() if med > 0 and v >= 1.5 * med
    }
    # Quiet-host gate (round-13 judge): a committed record measured on a
    # loaded box reads as a code regression one round and a code win the
    # next.  The bench cannot refuse to run (the driver invokes it once,
    # unconditionally), so it MARKS the record instead: any downstream
    # comparison must treat a noisy_host record's totals as environmental,
    # not behavioral.  Threshold 0.12 s: quiet-host sentinels here run
    # 0.06-0.11 (r03 0.086, r12 0.100); the r13 noisy run was 0.161.
    noisy = med > 0.12 or conditions.get("sentinel_before_sec", 0) > 0.12
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "noisy_host": noisy,
        # compare THIS number across rounds, normalized by the sentinel
        "value_r04_comparable": round(
            sum(v for k, v in timings.items() if k in _R04_COMPARABLE), 3
        ),
        "queries": timings,
        "sent_med": med,
        "sent_hi": sent_hi,
        # rows re-measured under the dirty-run policy (co-tenant sentinel
        # or >3x run disagreement) — normally empty
        "retried": retried or [],
        "sf": sf,
        "conditions": conditions,
    }
    line = json.dumps(payload)
    if len(line) > 1900:
        payload.pop("sent_hi", None)
        payload.pop("conditions", None)
        line = json.dumps(payload)
    return line


if __name__ == "__main__":
    main()
