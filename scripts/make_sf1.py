"""Generate an sf1 dataset (10x the sf0.1 FACT tables) for the bench
scale sweep — BENCH_NOTES §2 / SCALE.md's fixed-overhead argument needs
one more decade than the driver-provided sf0.001-0.1 testdata.

Method: each fact table is replicated 10x with keys shifted per copy so
rows stay distinct (no artificial PK dedup collapse); dimension tables
(region/nation/customer/supplier/part) are copied as-is, so join
fan-outs keep the sf0.1 shape while scan volume grows 10x — a
facts-only scaling, which is exactly the shape of the 100 TB question
(more data, same dimensions), NOT official TPC-H sf1 (which also grows
the dims; the point here is the scan/shuffle decade).

Per-copy perturbations keep derived workloads honest:
- events: ts shifted +i seconds (rows distinct under the µs-truncated
  dedup PK), event_id offset per copy.
- documents: for copies i>0 a "cpN" marker token is spliced after every
  5 words, which destroys 5-gram shingle overlap with the original —
  near-dup pair counts stay O(sf0.1's), only the corpus (signature /
  banding / verify volume) grows 10x.  n_chars recomputed.
- embeddings: first component offset per copy (distinct vectors, no
  degenerate sim≈1.0 ties between copies), vec_id offset.

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1).  DuckDB
does the generation (one CROSS JOIN range(N) per table) — Spark is the
system under test, not the generator.

Further decades: $SPARK_GRAFT_COPIES replicas from $SPARK_GRAFT_SRC
(defaults 10 / sf0.1).  E.g. sf10 = 100 copies of sf0.1:
  SPARK_GRAFT_COPIES=100 SPARK_GRAFT_SF1_DIR=/tmp/spark_graft_sf10 \
      python scripts/make_sf1.py
The fixed per-copy key offsets stay collision-free up to ~900 copies
(orders: 10M x 900 < 2^63); always generate from sf0.1, never chain
from a generated dir (the offsets assume sf0.1-sized max keys).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_COPIES", "10"))

# key offsets, comfortably above each table's max key
OFF = {
    "orders": 10_000_000,
    "lineitem": 10_000_000,
    "events": 10_000_000,
    "documents": 1_000_000,
    "embeddings": 1_000_000,
}

DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]

FACT_SQL = {
    "orders": f"""
        SELECT o_orderkey + i * {OFF['orders']} AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM src CROSS JOIN range({COPIES}) r(i)
    """,
    "lineitem": f"""
        SELECT l_orderkey + i * {OFF['lineitem']} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM src CROSS JOIN range({COPIES}) r(i)
    """,
    "events": f"""
        SELECT event_id + i * {OFF['events']} AS event_id,
               ts + to_seconds(CAST(i AS BIGINT)) AS ts,
               user_id, event_type, value, props
        FROM src CROSS JOIN range({COPIES}) r(i)
    """,
    "documents": f"""
        SELECT doc_id + i * {OFF['documents']} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '((\\S+\\s+){{5}})',
                                        '\\1cp' || i || ' ', 'g')
               END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '((\\S+\\s+){{5}})',
                                               '\\1cp' || i || ' ', 'g'))
               END AS n_chars
        FROM src CROSS JOIN range({COPIES}) r(i)
    """,
    "embeddings": f"""
        SELECT vec_id + i * {OFF['embeddings']} AS vec_id,
               list_prepend(CAST(embedding[1] + 0.0137 * i AS FLOAT),
                            embedding[2:]) AS embedding,
               label
        FROM src CROSS JOIN range({COPIES}) r(i)
    """,
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in DIM_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, sql in FACT_SQL.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'")
        con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows, {os.path.getsize(f'{DST}/{t}.parquet') / 1e6:.1f} MB")


if __name__ == "__main__":
    sys.exit(main())
