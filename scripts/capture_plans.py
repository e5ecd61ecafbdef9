#!/usr/bin/env python3
"""Capture .explain("formatted") for named queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> <query> [query ...]
e.g.   python scripts/capture_plans.py before stream_index_refresh

Lifecycle queries (engine put/compact/append ladders) execute side-effect
jobs during construction; the captured plan is the RETURNED DataFrame's —
the probe/scan the bench times last — which is still where the join
strategy / exchange / pushed-filter claims live.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r12")


def main() -> None:
    from helixdb_spark.session import get_session
    import __spark_entry__ as entrymod

    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_session("helixdb_spark_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
