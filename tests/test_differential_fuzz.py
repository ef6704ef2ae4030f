"""Differential query fuzzing: seeded random filter/group/aggregate
queries over the events table, executed by BOTH engines and compared
row-for-row.

The oracle-parity suite pins the 135 declared queries; this fuzzer
covers the combinatorial neighborhood around them — random predicate
mixes (half-open ns time ranges, tag in-lists, value comparisons, null
and negation cases), random grouping keys, and aggregates restricted to
the EXACTLY-comparable set (COUNT, COUNT DISTINCT, integer MIN/MAX, and
exact-decimal SUM) so every mismatch is a real semantics bug, never
float-ordering noise.  Each trial builds the Spark plan through the
DataFrame API (not SQL) so the comparison crosses the same
API-vs-translation boundary the gate queries do."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
S = 1_000_000_000


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def events(spark):
    import __spark_entry__ as entry_mod

    return entry_mod._load(spark, SF, "events")["events"]


def _random_query(rng: random.Random):
    """(spark_builder, duckdb_sql) for one random query."""
    preds_df = []
    preds_sql = []
    # time range (half-open, epoch seconds over the fixture's Jan 2024)
    if rng.random() < 0.7:
        lo = rng.randrange(1_704_067_200, 1_704_200_000)
        hi = lo + rng.randrange(600, 100_000)
        preds_df.append(
            lambda df, lo=lo, hi=hi: df.filter(
                (F.col("ts") >= lo * S) & (F.col("ts") < hi * S)
            )
        )
        preds_sql.append(
            f"epoch_us(ts) * 1000 >= {lo * S} AND epoch_us(ts) * 1000 < {hi * S}"
        )
    # tag in-list / equality / negation
    if rng.random() < 0.7:
        n = rng.randrange(1, 4)
        vals = rng.sample(EVENT_TYPES, n)
        if rng.random() < 0.3:
            preds_df.append(
                lambda df, vals=vals: df.filter(~F.col("event_type").isin(vals))
            )
            quoted = ", ".join(f"'{v}'" for v in vals)
            preds_sql.append(f"event_type NOT IN ({quoted})")
        else:
            preds_df.append(
                lambda df, vals=vals: df.filter(F.col("event_type").isin(vals))
            )
            quoted = ", ".join(f"'{v}'" for v in vals)
            preds_sql.append(f"event_type IN ({quoted})")
    # value comparison (doubles compare exactly — same parquet bits)
    if rng.random() < 0.5:
        thr = round(rng.uniform(0, 20), 2)
        op = rng.choice([">", "<=", ">="])
        preds_df.append(
            lambda df, thr=thr, op=op: df.filter(
                F.expr(f"value {op} {thr}")
            )
        )
        preds_sql.append(f"value {op} {thr}")
    # user id modulo bucket
    if rng.random() < 0.4:
        m = rng.randrange(2, 7)
        r = rng.randrange(0, m)
        preds_df.append(
            lambda df, m=m, r=r: df.filter(F.col("user_id") % m == r)
        )
        preds_sql.append(f"user_id % {m} = {r}")

    group = rng.choice([[], ["event_type"], ["event_type", "user_id"], ["user_id"]])
    aggs_df = [F.count("*").alias("n")]
    aggs_sql = ["CAST(count(*) AS BIGINT) AS n"]
    if rng.random() < 0.6:
        aggs_df.append(F.countDistinct("user_id").alias("nu"))
        aggs_sql.append("CAST(count(DISTINCT user_id) AS BIGINT) AS nu")
    if rng.random() < 0.6:
        aggs_df.append(F.min("event_id").alias("mn"))
        aggs_df.append(F.max("event_id").alias("mx"))
        aggs_sql.append("min(event_id) AS mn")
        aggs_sql.append("max(event_id) AS mx")
    if rng.random() < 0.5:
        aggs_df.append(
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("string").alias("sv")
        )
        aggs_sql.append(
            "CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) "
            "AS VARCHAR) AS sv"
        )

    def build(df):
        for p in preds_df:
            df = p(df)
        if group:
            return df.groupBy(*group).agg(*aggs_df)
        return df.agg(*aggs_df)

    where = (" WHERE " + " AND ".join(preds_sql)) if preds_sql else ""
    if group:
        sql = (
            f"SELECT {', '.join(group)}, {', '.join(aggs_sql)} FROM events"
            f"{where} GROUP BY {', '.join(group)}"
        )
    else:
        sql = f"SELECT {', '.join(aggs_sql)} FROM events{where}"
    return build, sql, group


def _norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"{v:.2f}"
    return v


def test_differential_random_queries(spark, events, duck):
    failures = []
    for seed in range(25):
        rng = random.Random(1000 + seed)
        build, sql, group = _random_query(rng)
        got = sorted(
            tuple(_norm(v) for v in r) for r in build(events).collect()
        )
        want = sorted(
            tuple(_norm(v) for v in r) for r in duck.execute(sql).fetchall()
        )
        if got != want:
            failures.append((seed, sql, got[:3], want[:3]))
    assert not failures, failures


def test_differential_document_queries(spark, duck):
    """Same harness over the documents table: random text-derived
    predicates (length bands, token-count bands, md5-prefix buckets,
    lang/source lists) and exact aggregates — crossing the tokenizer
    and fingerprint recipes the doc oracles rely on."""
    import __spark_entry__ as entry_mod

    duck.execute(
        f"CREATE VIEW IF NOT EXISTS documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    docs = entry_mod._load(spark, SF, "documents")["documents"]
    tok_df = (
        "size(array_remove(split(lower(text), '[^\\\\p{L}\\\\p{N}]+'), ''))"
    )
    tok_sql = (
        "len(list_filter(regexp_split_to_array(lower(text), "
        "'[^\\p{L}\\p{N}]+'), x -> x <> ''))"
    )
    failures = []
    for seed in range(20):
        rng = random.Random(7000 + seed)
        preds_df, preds_sql = [], []
        if rng.random() < 0.6:
            lo = rng.randrange(0, 200)
            hi = lo + rng.randrange(50, 400)
            preds_df.append(f"length(text) >= {lo} AND length(text) < {hi}")
            preds_sql.append(f"length(text) >= {lo} AND length(text) < {hi}")
        if rng.random() < 0.5:
            t = rng.randrange(5, 40)
            op = rng.choice([">", "<="])
            preds_df.append(f"{tok_df} {op} {t}")
            preds_sql.append(f"{tok_sql} {op} {t}")
        if rng.random() < 0.5:
            c = rng.choice("0123456789abcdef")
            preds_df.append(f"substring(md5(text), 1, 1) = '{c}'")
            preds_sql.append(f"substr(md5(text), 1, 1) = '{c}'")
        if rng.random() < 0.5:
            srcs = rng.sample(["src0", "src1", "src2"], rng.randrange(1, 3))
            quoted = ", ".join(f"'{s}'" for s in srcs)
            preds_df.append(f"source IN ({quoted})")
            preds_sql.append(f"source IN ({quoted})")
        group = rng.choice([[], ["lang"], ["source"], ["lang", "source"]])
        where_df = " AND ".join(preds_df) if preds_df else "true"
        sel = docs.filter(where_df)
        aggs = [F.count("*").alias("n"),
                F.sum(F.col("n_chars")).alias("sc"),
                F.min(F.md5("text")).alias("m5")]
        got_df = sel.groupBy(*group).agg(*aggs) if group else sel.agg(*aggs)
        got = sorted(tuple(r) for r in got_df.collect())
        where = (" WHERE " + " AND ".join(preds_sql)) if preds_sql else ""
        cols = "CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS sc, min(md5(text)) AS m5"
        if group:
            sql = (f"SELECT {', '.join(group)}, {cols} FROM documents{where} "
                   f"GROUP BY {', '.join(group)}")
        else:
            sql = f"SELECT {cols} FROM documents{where}"
        want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
        if got != want:
            failures.append((seed, sql, got[:2], want[:2]))
    assert not failures, failures
