"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``spark_ml_helper_spark``; this module just
re-exports the registry (spark_ml_helper_spark/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ml_helper_spark.registry import REGISTRY, load_all_operators

load_all_operators()

# Queries whose implementation changed since their last driver check, or whose
# only recorded result is a FAIL — surfaced first so the driver's per-round
# verification window (~50 queries, taken from the head of ``queries()``)
# re-records them.
_REVERIFY_FIRST = [
    # r10 decimal fix: the four TPC-H-shape sqlapi queries whose output
    # expressions were DECIMAL-typed by Spark's decimal-literal division
    # (driver hash-red in r08/r09 for the first three; sql_correlated_avg
    # was the same defect passing by data accident) — each shared SQL
    # string now CASTs the output AS DOUBLE (DuckDB no-op), verified at
    # sf0.001/0.01/0.1:
    "sql_group_vs_total",
    "sql_market_share",
    "sql_profit_by_nation_year",
    "sql_correlated_avg",
    # r10 fixpoint fix: graph_kcore now peels to convergence instead of a
    # fixed 4-round loop (both engines); values can change on any fixture
    # where 4 rounds was not the fixpoint:
    "graph_kcore",
    # r10 additions (unseen — pinned so this round's own operators are
    # driver-recorded ahead of the rotation backlog):
    "dedup_semantic",
    "graph_sssp_weighted",
    "dedup_substring_remove",
    "graph_coreness",
    "sql_priority_line_split",
    "sql_promo_share",
    "sql_notin_supplier_cnt",
    "sql_disjunctive_pred",
    "sql_scalar_max_join",
    # r10 scale hardening: dedup_substring's per-gram posting list is
    # replaced by 64-bit fingerprints + a map-side-combinable
    # min(doc)!=max(doc) dup test; fixture hash unchanged but pin so the
    # driver re-records the hardened tree:
    "dedup_substring",
    # r11: graph_mst landed in the r10 snapshot commit without a pin (judge
    # finding); its promised Kruskal property test now exists
    # (tests/test_properties.py::test_mst_oracle_matches_python_kruskal) —
    # pinned until re-recorded once more:
    "graph_mst",
    # (dedup_semantic is already pinned above; its r11 zero-norm
    # engine-divergence fix rides that pin)
    # r11 addition: the second-exact-pass collision audit for the
    # substring-dedup family (new query, verified at 3 SFs):
    "dedup_substring_audit",
    # r11 addition: delta-stepping SSSP twin (probe showed 2.55x at 10x on
    # the high-diameter shape; same oracle as graph_sssp_weighted so the
    # driver hash-checks the engines agree):
    "graph_sssp_delta",
    # r11 record rotation: the stalest §2 entries still carrying r01-r03
    # records on files edited since (aggregates/joins/windows line drift) —
    # ~10 per round so every record stays <= 5 rounds old:
    "join_inner",
    "join_left",
    "join_full",
    "join_semi",
    "join_anti",
    "agg_global",
    "agg_distinct",
    "agg_rollup",
    "win_rank",
    "win_lag_lead",
]


def _latest_record_round() -> dict[str, int]:
    """Per query name, the latest round with a driver CORRECTNESS row."""
    import glob
    import json
    import re

    latest: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                names = json.load(fh).keys()
        except (OSError, ValueError):
            continue
        for n in names:
            latest[n] = max(latest.get(n, 0), rnd)
    return latest


def _ordered_names() -> list[str]:
    """Registry names, never-driver-verified first.

    The driver verifies only the first ~50 entries of ``queries()`` per
    round; putting unverified entries (and the re-verify pins) at the head
    rotates coverage across rounds with no manual reordering — each round's
    CORRECTNESS_r{N}.json feeds the next round's ordering.
    """
    latest = _latest_record_round()
    pins = [n for n in _REVERIFY_FIRST if n in REGISTRY]
    unseen = [n for n in REGISTRY if n not in latest and n not in pins]
    # SQL-oracled entries first within the unseen block: a hash-match row is
    # strictly stronger evidence than a rows-only run, so spend the window on
    # those before the approx/streaming/MLlib entries that can only ever get
    # a rows-only record.
    unseen.sort(key=lambda n: REGISTRY[n].oracle is None)
    rest = [n for n in REGISTRY if n in latest and n not in pins]
    # Stalest record first: whatever is left of the driver's ~50-query
    # window after pins+unseen automatically re-records the OLDEST entries,
    # so every record converges to <= a few rounds old with no manual
    # rotation list (r11; the verdict's rotation ask, automated).
    rest.sort(key=lambda n: latest[n])
    return pins + unseen + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    return REGISTRY["agg_group"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; rows-only operators are omitted."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
