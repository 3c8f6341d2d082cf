"""dedup_substring hot-gram skew probe (SCALE.md evidence).

The round-8/9 perf-weak: the old formulation collected EVERY (doc, pos)
occurrence of a gram into one posting list (collect_list keyed by gram),
so a Zipf-hot stop-phrase gram routed its entire occurrence stream into
a single reduce task with unbounded group state. The round-10 form
fingerprints grams to 64 bits map-side and replaces the posting list
with a min(doc_id) != max(doc_id) aggregate — O(1) state, map-side
combinable — plus a semi-join re-emission.

This probe builds the adversarial corpus the fixture (31-word
vocabulary, uniform grams) cannot exhibit: N docs that all share one
8-token hot phrase repeated R times per doc (the hot gram occurs N*R
times and IS a true duplicate), padded with per-doc unique filler. It
times the NEW start-extraction stage against the OLD collect_list form
on identical input at two scales, and asserts both emit the same start
count at the small scale (the big scale runs NEW only — the OLD form is
the thing being retired).

Usage: python -m tools.scale_probe_substring [n_docs] [reps_per_doc]
       (defaults 2000 20; the 10x cell multiplies n_docs by 10)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _starts_new(grams, F):
    dup = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .select("g")
    )
    return grams.join(dup, "g", "left_semi").select("doc_id", "pos")


def _starts_old(grams, F):
    occ = grams.groupBy("g").agg(
        F.collect_list(F.struct("doc_id", "pos")).alias("occs")
    )
    return (
        occ.where(
            F.size(F.expr("array_distinct(transform(occs, o -> o.doc_id))")) >= 2
        )
        .select(F.explode("occs").alias("o"))
        .select("o.doc_id", "o.pos")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.operators.text import _SUBSTR_K
    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-substring-probe")
    out = {"probe": "dedup_substring_hot_gram", "k": _SUBSTR_K, "cells": []}

    for factor in (1, 10):
        n = n_docs * factor
        # hot phrase = K copies of the token "hot"; filler tokens unique per
        # (doc, slot) so filler grams never repeat anywhere
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.array_repeat(F.lit("hot"), _SUBSTR_K * reps),
                F.transform(
                    F.sequence(F.lit(0), F.lit(49)),
                    lambda i: F.concat(F.lit("u"), F.col("id"), F.lit("_"), i),
                ),
            ).alias("toks"),
        )
        grams = (
            docs.select(
                "doc_id",
                F.posexplode(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {_SUBSTR_K} + 1), "
                        f"i -> array_join(slice(toks, i, {_SUBSTR_K}), ' '))"
                    )
                ).alias("pos0", "gram"),
            )
            .select(
                "doc_id",
                (F.col("pos0") + 1).alias("pos"),
                F.xxhash64("gram").alias("g"),
            )
            .localCheckpoint(eager=True)
        )
        n_occ = grams.count()

        t0 = time.time()
        c_new = _starts_new(grams, F).count()
        t_new = round(time.time() - t0, 2)

        cell = {
            "factor": factor,
            "n_docs": n,
            "gram_occurrences": n_occ,
            "hot_gram_occurrences": n * (_SUBSTR_K * reps - _SUBSTR_K + 1),
            "starts": c_new,
            "t_new_s": t_new,
        }
        if factor == 1:
            t0 = time.time()
            c_old = _starts_old(grams, F).count()
            cell["t_old_s"] = round(time.time() - t0, 2)
            assert c_old == c_new, (c_old, c_new)
        out["cells"].append(cell)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
