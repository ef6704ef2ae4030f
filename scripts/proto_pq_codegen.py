"""Prototype: JVM-codegen PQ encode vs the pandas-UDF encode — code
identity check + timing at sf0.1 (2000 vectors) and a 200k-row synthetic
probe, plus planning-time measurement for the unrolled expression."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from influxdb_iox_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="proto-pq-codegen", master="local[32]",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F

from influxdb_iox_spark.pipeline.similarity import (
    pq_encode,
    quantize_codebooks_milli,
)

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
print("emb dtype:", dict(emb.dtypes)["embedding"])
rows = emb.filter(F.col("vec_id") < 16).orderBy("vec_id").select("embedding").collect()
base = np.array([[float(x) for x in r.embedding] for r in rows])
m = 8
dsub = base.shape[1] // m
cb = np.stack([base[:, j * dsub : (j + 1) * dsub] for j in range(m)])
cb_int = np.asarray(quantize_codebooks_milli(cb), dtype="int64")
k = cb_int.shape[1]
cb_sq = (cb_int * cb_int).sum(axis=2)


def encode_codegen(df, vec_col="embedding"):
    dim = m * dsub
    xm = F.array(*[
        F.round(F.col(vec_col)[i] * 1000).cast("long") for i in range(dim)
    ])
    df2 = df.withColumn("__xm", xm)
    codes = []
    for j in range(m):
        packs = []
        for c in range(k):
            dot = None
            for d in range(dsub):
                t = F.col("__xm")[j * dsub + d] * F.lit(int(cb_int[j, c, d]))
                dot = t if dot is None else dot + t
            packs.append(F.lit(int(cb_sq[j, c]) * 16 + c) - 32 * dot)
        codes.append(F.pmod(F.least(*packs), F.lit(16)).cast("int"))
    return df2.withColumn("pq_codes", F.array(*codes)).drop("__xm")


t0 = time.perf_counter()
new = encode_codegen(emb)
new_plan = new._jdf.queryExecution().executedPlan()  # force planning
t_plan = time.perf_counter() - t0
print(f"codegen planning: {t_plan:.3f}s")

old_codes = {r.vec_id: list(r.pq_codes) for r in pq_encode(emb, cb_int).collect()}
new_codes = {r.vec_id: list(r.pq_codes) for r in new.select("vec_id", "pq_codes").collect()}
assert old_codes == new_codes, "codes differ!"
print(f"codes identical for {len(old_codes)} vectors")

# timing: noop-sink both, alternating
def tt(df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)

big = emb
for _ in range(7):
    big = big.unionByName(big)
big = big.localCheckpoint(eager=True)  # 256k rows, materialized input
print("big rows:", big.count())

times = {"old": [], "new": []}
for r in range(4):
    for mname in (["old", "new"] if r % 2 == 0 else ["new", "old"]):
        df = pq_encode(big, cb_int) if mname == "old" else encode_codegen(big)
        times[mname].append(tt(df.select("pq_codes")))
print("256k-row encode:", {mn: min(v) for mn, v in times.items()}, times)
spark.stop()
