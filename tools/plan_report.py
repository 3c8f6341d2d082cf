"""Per-query physical-plan health report.

Prints one JSON line per registry query with the plan_summary dict
(exchange count, join strategies, nested-loop/cartesian flags, codegen
spans, pushdown coverage) for the fast declarative families — the same
population the CI plan audit covers. Use it to spot a regressed plan
(new Exchange, lost broadcast, lost pushdown) before the bench does.

Usage: python -m tools.plan_report [name ...]   (default: audit families)
"""

from __future__ import annotations

import json
import os
import sys

AUDIT_FAMILIES = {
    "joins", "aggregates", "windows", "setops", "analytics", "timeseries",
    "mlprep", "sqlapi", "filters", "scans", "reshape", "vectors",
}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_ml_helper_spark.plans.audit import plan_summary
    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
    from spark_ml_helper_spark.session import get_spark

    load_all_operators()
    names = sys.argv[1:] or [
        n for n, s in REGISTRY.items() if s.family in AUDIT_FAMILIES
    ]
    spark = get_spark(app_name="smhs-plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            print(json.dumps({"query": name, **plan_summary(df)}), flush=True)
        except Exception as exc:  # report, keep going
            print(json.dumps({"query": name, "error": str(exc)[:120]}), flush=True)


if __name__ == "__main__":
    main()
