"""Per-query data-VOLUME ledger from Spark's SQL status store.

The timing bench (bench.py / BASELINE.md bands) answers "how long"; this
answers the question the 100 TB design brief actually asks: HOW MUCH
DATA MOVES. For each query it materializes the plan once and aggregates
the executed plan's SQLMetrics across every SQL execution the query
triggered (fixpoint loops trigger several):

- shuffle_write_bytes / shuffle_records — total exchange volume. THE
  scale metric: a query whose shuffle volume grows super-linearly in
  input is the one that dies at 1000 executors, regardless of its
  local[32] wall time.
- shuffle_read_bytes — local + remote fetch volume (> write when an
  exchange output is read by several consumers or re-fetched across
  fixpoint rounds).
- scan_bytes — parquet bytes actually read ("size of files read"):
  column-pruning/pushdown evidence measured, not inferred from the plan.
- spill_bytes — memory-pressure canary; nonzero at small SF means the
  operator is already outgrowing partitions and will fall over at scale.
- max_node_rows — the LARGEST "number of output rows" of any single
  plan node: a pair-space blowup shows up here as ~n² long before it
  shows up in wall time.

Volumes, unlike wall times, need no warm-up, no GC discipline, and no
sentinel: they are properties of the PLAN + data, reproducible across
box temperatures — which makes decade ratios (sf0.01 → sf0.1) a
drift-proof scaling exponent. SCALE.md round-13 records the sweep.

Usage:  python -m tools.shuffle_ledger [name ...]     (default: bench.py
        HEADLINE set). Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
Prints one JSON line per query.

Mechanism: SharedState.statusStore() (the SQLAppStatusStore backing the
SQL UI, populated with or without the UI) — executionsList() growth
around the materialization delimits the query's executions;
executionMetrics() yields formatted metric strings ("1,234", "4.6 KiB",
or the multi-line "total (min, med, max)" form — parsers below handle
all three). Pure observation: no listener registration, no event-log
config, no effect on the measured plans.
"""

from __future__ import annotations

import json
import os
import re
import sys

UNITS = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}

#: metric name -> (ledger key, parser, aggregator)
SUMMED_SIZES = {
    "shuffle bytes written": "shuffle_write_bytes",
    "spill size": "spill_bytes",
    "size of files read": "scan_bytes",
}
READ_SIZES = ("local bytes read", "remote bytes read")


def parse_size(s: str) -> float | None:
    """'4.6 KiB' | '0.0 B' | 'total (min, med, max…)\\n1.0 MiB (…)' → bytes."""
    s = s.strip().splitlines()[-1].strip()
    m = re.match(r"([\d.,]+)\s*(B|KiB|MiB|GiB|TiB)\b", s)
    return float(m.group(1).replace(",", "")) * UNITS[m.group(2)] if m else None


def parse_count(s: str) -> int | None:
    """'1,234' (optionally in the multi-line total form) → int."""
    s = s.strip().splitlines()[-1].strip()
    m = re.match(r"([\d,]+)", s.split(" ")[0])
    return int(m.group(1).replace(",", "")) if m else None


def collect_execution_metrics(store, first: int, last: int) -> dict:
    """Aggregate SQLMetrics over executionsList()[first:last] (py4j)."""
    agg: dict[str, list[str]] = {}
    execs = store.executionsList()
    for i in range(first, last):
        e = execs.apply(i)
        vals = store.executionMetrics(e.executionId())
        mets = e.metrics()
        for j in range(mets.size()):
            m = mets.apply(j)
            if vals.contains(m.accumulatorId()):
                agg.setdefault(m.name(), []).append(vals.apply(m.accumulatorId()))
    out = {"n_execs": last - first}
    for name, key in SUMMED_SIZES.items():
        out[key] = round(
            sum(v for v in map(parse_size, agg.get(name, [])) if v), 1
        )
    out["shuffle_read_bytes"] = round(
        sum(
            v
            for name in READ_SIZES
            for v in map(parse_size, agg.get(name, []))
            if v
        ),
        1,
    )
    out["shuffle_records"] = sum(
        v for v in map(parse_count, agg.get("shuffle records written", [])) if v
    )
    rows = [v for v in map(parse_count, agg.get("number of output rows", [])) if v]
    out["max_node_rows"] = max(rows) if rows else 0
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)

    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
    from spark_ml_helper_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="smhs-shuffle-ledger", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()

    for name in names:
        first = store.executionsList().size()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        last = store.executionsList().size()
        rec = {"query": name, "sf_dir": sf_dir}
        rec.update(collect_execution_metrics(store, first, last))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
