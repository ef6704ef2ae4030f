"""Capture .explain('formatted') for every bench HEADLINE query into
plans/$PLANS_ROUND/<query>_<tag>.txt (default r17) (tag = before/after, argv[1]; optional query
names after the tag restrict the set).

Planning only — no execution — so it is safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import HEADLINE
from influxdb_iox_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="iox-spark-plans",
        master="local[4]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in HEADLINE:
        if only and name not in only:
            continue
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not declared")
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
