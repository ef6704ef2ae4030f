"""Shape-audit sweep over EVERY declared query: capture the formatted
plan for each queries() entry at sf0.01 and print a one-line shape
summary (parquet scans per table, exchanges, joins, Python nodes) so
duplicated-subtree candidates stand out.

Planning only for lazy queries; entries that build eager checkpoints run
their (small) materialization jobs.  Plans land in plans/r16/audit/ only
for the queries named on argv (default: none — summary only).
"""

from __future__ import annotations

import io
import os
import re
import sys
import traceback
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from influxdb_iox_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name="iox-spark-audit-all",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — audit must keep going
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            traceback.print_exc(limit=1)
            continue
        # count scans per source table (the formatted details repeat the
        # tree line, so halve)
        tables = Counter(
            m.group(1)
            for m in re.finditer(r"InMemoryFileIndex \[[^]]*?/(\w+)\.parquet", plan)
        )
        dup = {t: c for t, c in tables.items() if c >= 2}
        n_ex = plan.count(") Exchange")
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_cart = plan.count("CartesianProduct")
        n_py = sum(
            plan.count(k)
            for k in (") BatchEvalPython", ") ArrowEvalPython",
                      ") FlatMapGroupsInPandas", ") MapInPandas", ") MapInArrow")
        )
        n_sortagg = plan.count(") SortAggregate")
        flags = []
        if dup:
            flags.append(f"MULTI-SCAN {dict(dup)}")
        if n_bnlj:
            flags.append(f"BNLJ x{n_bnlj}")
        if n_cart:
            flags.append(f"CARTESIAN x{n_cart}")
        if n_py:
            flags.append(f"PY x{n_py}")
        if n_sortagg:
            flags.append(f"SORTAGG x{n_sortagg}")
        print(
            f"{name}: exch={n_ex} " + ("; ".join(flags) if flags else "clean")
        )
    spark.stop()


if __name__ == "__main__":
    main()
