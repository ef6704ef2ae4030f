"""Round-17 A/B: the minhash per-shingle `pre` frame's materialization
(VERDICT r16 item 4) — localCheckpoint (round-16 shape) vs parquet
(the scale-safe route the declared query's signature frame already
takes).  Full declared minhash_near_dup shape on both sides; rows
asserted identical once before timing; shapes alternate per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from influxdb_iox_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    spark = get_spark(
        app_name="ab-minhash-pre-r17",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    from influxdb_iox_spark.pipeline.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        materialize_parquet,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def build(pre_mode: str):
        sigs = minhash_signatures(docs, materialize=pre_mode)
        sigs = materialize_parquet(sigs)
        cands = lsh_candidate_pairs(sigs)
        out = jaccard_verify(cands, sigs, threshold=0.5)
        return out.select(
            "a", "b",
            (F.round(F.col("jaccard") * 1000000) / 1000000).alias("jaccard"),
        ).orderBy("a", "b")

    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(5_000_000).select(
            F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
            F.min(F.hash("id")).alias("h"),
        ).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    sentinel(); sentinel()
    rows = {m: build(m).collect() for m in ("local_checkpoint", "parquet")}
    assert rows["local_checkpoint"] == rows["parquet"], "rows differ!"
    print(f"exactness: {len(rows['parquet'])} rows identical", flush=True)

    times: dict[str, list[float]] = {"local_checkpoint": [], "parquet": []}
    sents: list[float] = []
    order = ["local_checkpoint", "parquet"]
    for r in range(rounds):
        for m in order if r % 2 == 0 else order[::-1]:
            sents.append(sentinel())
            # build INSIDE the window: materialize_parquet and the eager
            # checkpoints run their jobs at build time, exactly as the
            # bench times them (fn(spark, sf_dir) is inside its window)
            t0 = time.perf_counter()
            build(m).write.mode("overwrite").format("noop").save()
            times[m].append(round(time.perf_counter() - t0, 3))
    sents.append(sentinel())
    print(json.dumps({
        "mins": {m: min(v) for m, v in times.items()},
        "all": times,
        "sent_min": min(sents), "sent_max": max(sents),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
