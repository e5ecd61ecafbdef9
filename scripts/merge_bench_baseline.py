"""Merge several idle bench runs into a committed same-box baseline:
per-query MINIMA (the repeatable engine cost; single runs swing on
scheduler noise). Usage:

    python scripts/merge_bench_baseline.py OUT.json RUN1.json [RUN2.json ...]
"""

from __future__ import annotations

import json
import sys


def main():
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    queries: dict[str, float] = {}
    for r in runs:
        for k, v in r["queries"].items():
            if k not in queries or v < queries[k]:
                queries[k] = v
    base = dict(runs[0])
    base["queries"] = queries
    base["value"] = round(sum(queries.values()), 3)
    base["merged_runs"] = len(runs)
    base.pop("regressions", None)
    base.pop("errors", None)
    with open(out_path, "w") as f:
        json.dump(base, f)
    print(f"{out_path}: {len(queries)} queries, total {base['value']}s "
          f"(minima over {len(runs)} runs)")


if __name__ == "__main__":
    main()
