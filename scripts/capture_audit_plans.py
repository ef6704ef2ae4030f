"""Capture .explain('formatted') for ARBITRARY declared queries into
plans/r16/audit/<query>.txt — the shape-audit companion of
capture_plans.py (which covers the bench HEADLINE set).

Usage: python scripts/capture_audit_plans.py <query> [<query> ...]

Planning only — no execution — so it is safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from influxdb_iox_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
        "audit",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="iox-spark-audit-plans",
        master="local[4]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not declared")
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote audit/{name}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
