"""Round-17 A/Bs for the VERDICT item-6/9 re-profiles, one JSON line per
experiment:

  dsir      — eager (shipped) vs lazy localCheckpoints in the dsir path:
              variance + wall clock over fresh builds (item 9)
  incr      — dedup_against_index: shipped double-hash vs lazy-checkpointed
              digest batch (item 6)
  pattern   — series_pattern_topk component timing: pattern-derivation
              collects vs the main window pass (item 6)

Usage: python scripts/ab_misc_r17.py <dsir|incr|pattern> [--rounds=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from influxdb_iox_spark.session import get_spark


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-misc-r17", master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _sentinel(spark) -> float:
    import pyspark.sql.functions as F

    t0 = time.perf_counter()
    spark.range(5_000_000).select(
        F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
        F.min(F.hash("id")).alias("h"),
    ).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def run_dsir(spark, sf_dir: str, rounds: int) -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame

    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()["doc_dsir_weights"]
    _orig = DataFrame.localCheckpoint

    def build(mode: str):
        if mode == "lazy":
            DataFrame.localCheckpoint = lambda self, eager=True: _orig(
                self, eager=False
            )
        try:
            return fn(spark, sf_dir)
        finally:
            DataFrame.localCheckpoint = _orig

    _sentinel(spark); _sentinel(spark)
    rows = {m: build(m).collect() for m in ("eager", "lazy")}
    assert rows["eager"] == rows["lazy"], "rows differ!"
    print(f"exactness: {len(rows['eager'])} rows identical", flush=True)

    times = {"eager": [], "lazy": []}
    sents = []
    for r in range(rounds):
        for m in (["eager", "lazy"] if r % 2 == 0 else ["lazy", "eager"]):
            sents.append(_sentinel(spark))
            df = build(m)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[m].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "mins": {m: min(v) for m, v in times.items()},
        "spread": {m: round(max(v) / max(min(v), 1e-9), 2) for m, v in times.items()},
        "all": times, "sent_min": min(sents), "sent_max": max(sents),
    }), flush=True)


def run_incr(spark, sf_dir: str, rounds: int) -> None:
    import tempfile

    import pyspark.sql.functions as F

    from influxdb_iox_spark.pipeline.dedup_index import (
        _content_hash,
        _read_exact,
        build_exact_index,
        dedup_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index_docs = docs.filter(F.col("doc_id") % 2 == 0)
    batch_docs = docs.filter(F.col("doc_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="ab_incr_")
    build_exact_index(index_docs, path, n_buckets=8)

    def build_old():
        return dedup_against_index(spark, path, batch_docs).select(
            "doc_id"
        ).orderBy("doc_id")

    def build_ckpt():
        index, _ = _read_exact(spark, path)
        batch = batch_docs.withColumn(
            "__h", _content_hash("text")
        ).localCheckpoint(eager=False)
        batch_keep = batch.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
        fresh_keys = batch_keep.join(
            index.select(F.col("content_hash").alias("__h")),
            on="__h", how="left_anti",
        )
        return (
            batch.join(fresh_keys, on=["__h", "doc_id"], how="left_semi")
            .drop("__h").select("doc_id").orderBy("doc_id")
        )

    _sentinel(spark); _sentinel(spark)
    rows = {"old": build_old().collect(), "ckpt": build_ckpt().collect()}
    assert rows["old"] == rows["ckpt"], "rows differ!"
    print(f"exactness: {len(rows['old'])} rows identical", flush=True)

    builders = {"old": build_old, "ckpt": build_ckpt}
    times = {"old": [], "ckpt": []}
    sents = []
    for r in range(rounds):
        for m in (["old", "ckpt"] if r % 2 == 0 else ["ckpt", "old"]):
            sents.append(_sentinel(spark))
            df = builders[m]()
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[m].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "mins": {m: min(v) for m, v in times.items()},
        "all": times, "sent_min": min(sents), "sent_max": max(sents),
    }), flush=True)


def run_pattern(spark, sf_dir: str, rounds: int) -> None:
    import pyspark.sql.functions as F

    from influxdb_iox_spark.operators.pattern import pattern_topk

    ev_raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev_raw.dtypes)["ts"].startswith("timestamp"):
        ev_raw = ev_raw.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    _sentinel(spark); _sentinel(spark)

    comps = {"derive_et": [], "derive_pat": [], "derive_merged": [],
             "main": []}
    sents = []
    pats = set()
    for _ in range(rounds):
        sents.append(_sentinel(spark))
        ev = ev_raw.select(
            "event_type", F.col("ts").alias("time"),
            F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
        )
        t0 = time.perf_counter()
        et = ev.agg(F.min("event_type")).first()[0]
        t1 = time.perf_counter()
        pat = [
            r.vm for r in ev.filter(
                (F.col("event_type") == et) & F.col("vm").isNotNull()
            ).select("vm").distinct().orderBy("vm").limit(8).collect()
        ]
        t2 = time.perf_counter()
        # merged variant: one driver action — the min-event_type rides
        # as a broadcast scalar join instead of its own collect
        et_df = ev.groupBy().agg(F.min("event_type").alias("__et"))
        pat2 = [
            r.vm for r in ev.join(
                F.broadcast(et_df), F.col("event_type") == F.col("__et")
            ).filter(F.col("vm").isNotNull())
            .select("vm").distinct().orderBy("vm").limit(8).collect()
        ]
        t2b = time.perf_counter()
        assert pat2 == pat, (pat, pat2)
        pats.add(tuple(pat))
        out = pattern_topk(ev, ["event_type"], "time", "vm", pat, k=20)
        out.select(
            "event_type", F.expr("time div 1000").alias("time_us"),
            "corr_micro",
        ).write.mode("overwrite").format("noop").save()
        t3 = time.perf_counter()
        comps["derive_et"].append(round(t1 - t0, 3))
        comps["derive_pat"].append(round(t2 - t1, 3))
        comps["derive_merged"].append(round(t2b - t2, 3))
        comps["main"].append(round(t3 - t2b, 3))
    print(json.dumps({
        "mins": {m: min(v) for m, v in comps.items()},
        "all": comps, "sent_min": min(sents), "sent_max": max(sents),
    }), flush=True)


def main() -> None:
    which = sys.argv[1]
    rounds = 5
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    {"dsir": run_dsir, "incr": run_incr, "pattern": run_pattern}[which](
        spark, sf_dir, rounds
    )
    spark.stop()


if __name__ == "__main__":
    main()
