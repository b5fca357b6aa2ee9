#!/usr/bin/env python
"""Generate tests/scan_budgets.json — the full-registry scan-budget table.

The round-11 audit swept every gate row's EXECUTED plan by hand for
repeated "Scan parquet" nodes and found real 100x-scale defects invisible
to the sf0.1 bench (a 22-scan funnel, an 18-scan fleiss, a 15-scan IVF
tuning curve). This script freezes the post-audit scan count of every
registry row so a future multi-reference regression anywhere fails
TestScanBudgets instead of waiting for the next manual sweep.

Run from the repo root after intentionally changing a query's plan shape:

    python tests/gen_scan_budgets.py            # all rows, sf0.001
    python tests/gen_scan_budgets.py name ...   # regenerate specific rows

The JSON maps query name -> "Scan parquet" count in the final executed
plan at sf0.001 (AQE's "== Initial Plan ==" echo excluded). Budgets are
CEILINGS: TestScanBudgets fails only when a row exceeds its recorded
count, so plan improvements never break the lock — regenerate to ratchet
them down.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF", "/root/testdata/sf0.001")


def scan_count(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    return plan.count("Scan parquet")


def main() -> None:
    import __spark_entry__ as entry
    from concept_multi_db_query_engine_spark.session import get_spark

    spark = get_spark(
        app_name="gen-scan-budgets",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scan_budgets.json")
    out: dict[str, int] = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    qs = entry.queries()
    names = sys.argv[1:] or sorted(qs)
    for i, name in enumerate(names):
        out[name] = scan_count(qs[name](spark, SF_DIR))
        print(f"[gen {i + 1}/{len(names)}] {name} {out[name]}",
              file=sys.stderr)
        spark.catalog.clearCache()
    with open(path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(out)} budgets to {path}")


if __name__ == "__main__":
    main()
