"""Set-similarity (PPJoin) scale probe — SCALE.md evidence for the
prefix-filter claim in functions/setsim.py:24-28.

The fixture's 31-word vocabulary makes REP-COLLAPSE do most of the work
(identical token sets merge before any pair is generated), so the sf0.1
bench never exercises the prefix filter's candidate-volume scaling — the
actual 100 TB claim for shingled web text, where the vocabulary is
unbounded and almost every set is distinct. This probe generates a
synthetic corpus with CONTROLLED vocabulary and duplication and measures
the quantities that matter:

- candidates: pairs surviving the prefix+length+positional filters
  (rep_jaccard_pairs counters) — the claim is candidates ≪ n_reps²/2
  with near-linear growth in docs when elements are rare (large vocab).
- n_reps: distinct contents after collapse — shows which mechanism
  (collapse vs prefix filter) bounds the work in each regime.
- wall: end-to-end exact_jaccard_pairs-equivalent time (collapse +
  PPJoin + rescore), plus smallvocab_containment_pairs in its design
  domain (bounded vocab, block-matmul).

Corpus: n_docs docs, ~4 docs per template; each doc takes 20 tokens,
slot s of template t is token xxhash64(t, s) mod V, and doc-variant
k = doc_id % 3 replaces its first k slots with doc-unique tokens — so
same-template variants sit at Jaccard ≈ 0.83-1.0 (true pairs exist at
τ=0.8) and k=0 twins exercise the identical-set collapse. Fully
deterministic (xxhash64), generated as one Spark expression.

Cells × scales, each in its OWN SUBPROCESS (the bench_isolated
discipline — long-lived probe sessions skew later cells 2-3×):
- jaccard  × vocab 50,000 × docs {2k, 20k, 200k}   (the scale path)
- jaccard  × vocab 31     × docs {2k, 20k}          (fixture regime;
  200k SKIPPED LOUDLY: with 31 common tokens every prefix element is
  frequent and candidates degenerate toward n_reps²/2 — the measured
  2k/20k cells quantify the blowup exponent; this boundary is WHY
  dedup_ngram routes to the block-matmul kernel, setsim.py docstring)
- containment × vocab 31  × docs {2k, 20k, 200k}   (block-matmul design
  domain; vocab 50k SKIPPED LOUDLY: the multi-hot scatter is
  n_block_rows × V float64 — ~20 GB/block-pair at 50k dims — the
  documented use-exact_jaccard_pairs-instead boundary)

Usage:  python -m tools.scale_probe_setsim            (all cells)
Prints one JSON line per cell; paste the decade table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_RUNS = 3
TAU = 0.8
TOKENS_PER_DOC = 20


def _build_session(cpus: str):
    from spark_ml_helper_spark.session import get_spark

    return get_spark(app_name="smhs-scale-probe-setsim", cpus=cpus)


def _gen_corpus(spark, n_docs: int, vocab: int):
    from pyspark.sql import functions as F

    n_templates = max(n_docs // 4, 1)
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n_templates).alias("tpl"),
        (F.col("id") % 3).alias("k"),
    )
    tok = lambda seed_a, seed_b: F.concat(  # noqa: E731
        F.lit("t"), F.pmod(F.xxhash64(seed_a, seed_b), F.lit(vocab))
    )
    elems = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
            lambda s: F.when(
                s < F.col("k"), tok(F.col("doc_id") + 1_000_000_000, s)
            ).otherwise(tok(F.col("tpl"), s)),
        )
    )
    return base.select("doc_id", elems.alias("elems")).repartition(64)


def _single(op: str, n_docs: int, vocab: int) -> None:
    from spark_ml_helper_spark.functions.setsim import (
        _collapse_identical_sets,
        rep_jaccard_pairs,
        smallvocab_containment_pairs,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sets = _gen_corpus(spark, n_docs, vocab).localCheckpoint(eager=True)
    sets.count()  # materialize generation outside the timed region

    counters: dict = {}

    def run_jaccard() -> int:
        # rep-level PPJoin — collapse + prefix filter + exact rescore
        # (exact_jaccard_pairs minus the doc-level expansion joins, which
        # are membership-sized and not what the probe charts)
        c = counters if not counters else None  # record on first run only
        _, _, _, rep_sets = _collapse_identical_sets(sets)
        return rep_jaccard_pairs(rep_sets, TAU, "jac", counters=c).count()

    def run_containment() -> int:
        # exercises the library's AUTO block scaling (setsim._auto_blocks,
        # this probe's first find): a fixed n_blocks=4 at 200k docs
        # allocated a 50k×50k = 20 GB float64 pair matrix and killed the
        # Arrow worker (EOFException from PythonArrowOutput); the library
        # now derives block count from the collapsed rep count so a block
        # pair's matrix stays ~BLOCK_TARGET_ROWS².
        return smallvocab_containment_pairs(sets, TAU, "cont").count()

    fn = run_jaccard if op == "jaccard" else run_containment
    pairs = fn()  # warm-up (also fills counters for jaccard)
    walls = []
    for _ in range(N_RUNS):
        t0 = time.time()
        pairs = fn()
        walls.append(round(time.time() - t0, 2))
    n_reps = counters.get("n_reps", 0)
    out = {
        "op": op,
        "docs": n_docs,
        "vocab": vocab,
        "pairs": pairs,
        "walls": walls,
        "best": min(walls),
        **counters,
    }
    if n_reps:
        out["nsq_half"] = n_reps * (n_reps - 1) // 2
        out["cand_frac_of_nsq"] = round(
            counters["candidates"] / max(out["nsq_half"], 1), 6
        )
    print("PROBE " + json.dumps(out), flush=True)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) >= 2 and sys.argv[1] == "--single":
        _single(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    cells = [
        # fixed vocab: density (docs per vocab token) GROWS with docs, so
        # posting lists lengthen and the candidate exponent rises — the
        # regime a fixed shingle space would put a growing corpus in
        ("jaccard", 2_000, 50_000),
        ("jaccard", 20_000, 50_000),
        ("jaccard", 200_000, 50_000),
        # constant density (vocab scales with docs — how shingled web
        # text actually grows): the honest 100 TB scaling claim
        ("jaccard", 2_000, 5_000),
        ("jaccard", 200_000, 500_000),
        # fixture regime: tiny common vocabulary
        ("jaccard", 2_000, 31),
        ("jaccard", 20_000, 31),
        ("containment", 2_000, 31),
        ("containment", 20_000, 31),
        ("containment", 200_000, 31),
    ]
    print(json.dumps({"skipped": "jaccard docs=200000 vocab=31",
                      "why": "31 common tokens -> prefix filter degenerates "
                             "toward n_reps^2/2 (quantified by the 2k/20k "
                             "cells); block-matmul is the documented path"}),
          flush=True)
    print(json.dumps({"skipped": "containment vocab=50000",
                      "why": "multi-hot scatter is rows x V float64 "
                             "(~20 GB/block-pair at 50k dims); "
                             "exact_jaccard_pairs is the documented path"}),
          flush=True)
    for op, n_docs, vocab in cells:
        out = subprocess.run(
            [sys.executable, "-m", "tools.scale_probe_setsim",
             "--single", op, str(n_docs), str(vocab)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for line in out.stdout.splitlines():
            if line.startswith("PROBE "):
                print(line[6:], flush=True)
                break
        else:
            print(json.dumps({"op": op, "docs": n_docs, "vocab": vocab,
                              "error": out.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
