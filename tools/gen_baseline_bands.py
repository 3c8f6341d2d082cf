"""Generate the BASELINE.md current-band table.

Runs every bench.py HEADLINE query (one warm-up pass, then N timed
INTERLEAVED round-robin passes with GC between runs — round 14; the
old sequential per-query protocol entangled row position with the
box's slow thermal swings, measured as opposite-sign intra-draw
gradients inflating late rows 2x in one draw and early rows 2.9x in
the next) and prints a markdown table: per-query band (min-max),
median, and the watch threshold (1.5x median — an in-bench or isolated
draw above it triggers the drift protocol: re-measure alone, diff the
plan only if the isolated number also moved).

Usage: python -m tools.gen_baseline_bands [-n RUNS]
           [--adjudicate name=cause ...] [--emit-pending]
                                                    (RUNS default 3)
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS. Prints markdown to
stdout (pipe into BASELINE.md by hand — the table is a measurement,
reviewed before committing, not a build artifact).

Every measurement is also dumped to /tmp/smhs_bands_pending.json, and
--emit-pending re-runs the diff/gate/emit stage FROM that dump without
re-measuring — adjudication needs bench_isolated runs in between, and
re-measuring the whole suite afterwards on a drifted box would just
draw a different mover set (measure once, adjudicate, then emit the
SAME numbers).

Box-state SENTINEL (round-13 protocol): agg_group is timed FIRST, its
median recorded in the table header. Two tables (or a table and a
bench_isolated adjudication) drawn on different-temperature boxes
compare through the ratio of their sentinels — rounds 11 and 12 each
burned an adjudication on drift that was global box state, visible as
equal elevation of control queries. The regeneration diff below is
box-NORMALIZED for the same reason, using the MEDIAN of per-query
old-vs-new ratios over the common rows as the primary estimate
(tools/measure.compute_movers; the sentinel is the under-5-rows
fallback and cross-check — a cheap sentinel over-reads scheduler heat
~1.35x vs the heavy rows, measured round 13, which in the masking
direction would hide a real heavy mover).

Regeneration DIFF + GATE (round-12 protocol, hardened round-13): the
"vs prev band" column shows the old-vs-new median ratio (raw and
box-normalized) read from BASELINE.md's current band table. Any
query whose NORMALIZED median moved >1.25x in either direction REQUIRES
an adjudication — re-measure solo with tools/bench_isolated -n 5, name
a cause, and pass it as --adjudicate name=cause. Without one the tool
REFUSES to emit the table (exit 2): silently regenerating rebases the
watch thresholds, which is how dedup_substring's 1.02->1.44 s move
slipped through in round 11.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

PENDING_PATH = "/tmp/smhs_bands_pending.json"

from tools.measure import (
    DIFF_THRESHOLD,
    HEAVY_SENTINEL_QUERY,
    SENTINEL_QUERY,
    adjudication_gate,
    compute_movers,
    parse_prev_block,
)


def _prev_block() -> tuple[dict, float | None, float | None]:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.md"
    )
    try:
        text = open(path).read()
    except OSError:
        return {}, None, None
    return parse_prev_block(text)


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    adjudicated: dict[str, str] = {}
    emit_pending = False
    it = iter(args)
    for a in it:
        if a == "-n":
            n_runs = int(next(it))
        elif a == "--adjudicate":
            name, _, cause = next(it).partition("=")
            adjudicated[name] = cause or "adjudicated (no cause given)"
        elif a == "--emit-pending":
            emit_pending = True

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if emit_pending:
        with open(PENDING_PATH) as fh:
            pend = json.load(fh)
        sf_dir, cpus, n_runs = pend["sf_dir"], pend["cpus"], pend["n_runs"]
        sentinel = pend["sentinel"]
        heavy_sentinel = pend.get("heavy_sentinel")
        sentinel_end = pend.get("sentinel_end")
        heavy_end = pend.get("heavy_sentinel_end")
        rows = [tuple(r) for r in pend["rows"]]
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        from bench import HEADLINE

        from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
        from spark_ml_helper_spark.session import get_spark

        load_all_operators()
        spark = get_spark(app_name="smhs-baseline-bands", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")

        from spark_ml_helper_spark.benchlib import (
            make_runners,
            run_interleaved,
        )
        from spark_ml_helper_spark.operators.graph_bench import (
            SYNTH_GRAPH_BENCH,
        )

        def materialize(name: str) -> None:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        def measure(name: str) -> list:
            if name in SYNTH_GRAPH_BENCH:
                # pinned synthetic fixpoint row (round 14): inputs are
                # built + checkpointed OUTSIDE the timed runs — the band
                # times the loop, matching bench.py's same-named row
                run = SYNTH_GRAPH_BENCH[name](spark)
            else:
                run = lambda: materialize(name)  # noqa: B023
            run()  # warm-up: JIT, file listing, code cache
            runs = []
            for _ in range(n_runs):
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                run()
                runs.append(time.perf_counter() - t0)
            return runs

        # sentinel PAIR FIRST: the box-temperature reading at band-draw
        # time. Cheap + heavy bracket the box factor (round 14 — the
        # cheap one alone over-reads scheduler heat ~1.35x vs heavy
        # plans, measured round 13).
        sentinel = statistics.median(measure(SENTINEL_QUERY))
        heavy_sentinel = statistics.median(measure(HEAVY_SENTINEL_QUERY))
        print(f"sentinel {SENTINEL_QUERY} median={sentinel:.2f}s; "
              f"heavy sentinel {HEAVY_SENTINEL_QUERY} "
              f"median={heavy_sentinel:.2f}s",
              file=sys.stderr, flush=True)

        # INTERLEAVED passes (round 14): a sequential draw (n runs per
        # query, queries back to back) entangles ROW POSITION with the
        # box's slow thermal/scheduler swings — measured this round as
        # two opposite-sign gradients hours apart (draw A: start
        # sentinel 1.44x band, LATE rows inflated to 2x their
        # fresh-session solo values; draw B: start sentinel hot at
        # 0.84 s, END sentinel 0.29 s = 0.35x start, EARLY rows
        # inflated 2.9x). Round-robin passes make every row sample the
        # same box trajectory, so box state is common-mode across rows
        # and the median-of-ratios normalization actually removes it.
        # The loop itself lives in benchlib, SHARED with bench.py, so
        # bench and band sampling cannot drift apart.
        all_runs = run_interleaved(
            spark, make_runners(spark, HEADLINE, materialize), HEADLINE,
            n_runs,
        )
        rows = []
        for name in HEADLINE:
            runs = all_runs[name]
            med = statistics.median(runs)
            rows.append((name, min(runs), max(runs), med, 1.5 * med))
            print(
                f"| `{name}` | {min(runs):.2f}-{max(runs):.2f} | {med:.2f} "
                f"| {1.5 * med:.2f} |",
                file=sys.stderr,
                flush=True,
            )
        # END-of-draw sentinel pair (round 14): a 40-query draw is ~10
        # minutes of sustained 32-thread load, and the box heats UNDER
        # the draw itself (measured: late rows read up to 2x their
        # fresh-session solo values while the start sentinels read only
        # ~1.4x). Recording the pair again at the end turns that
        # intra-draw drift into a number the adjudication can cite.
        sentinel_end = statistics.median(measure(SENTINEL_QUERY))
        heavy_end = statistics.median(measure(HEAVY_SENTINEL_QUERY))
        print(f"end sentinels: {SENTINEL_QUERY} {sentinel_end:.2f}s "
              f"({sentinel_end / sentinel:.2f}x draw-start), "
              f"{HEAVY_SENTINEL_QUERY} {heavy_end:.2f}s "
              f"({heavy_end / heavy_sentinel:.2f}x)",
              file=sys.stderr, flush=True)
        with open(PENDING_PATH, "w") as fh:
            json.dump({"sf_dir": sf_dir, "cpus": cpus, "n_runs": n_runs,
                       "sentinel": sentinel,
                       "heavy_sentinel": heavy_sentinel,
                       "sentinel_end": sentinel_end,
                       "heavy_sentinel_end": heavy_end, "rows": rows}, fh)

    old, old_sentinel, old_heavy = _prev_block()
    movers, tags, diag = compute_movers(
        rows, old, sentinel, old_sentinel,
        heavy_new=heavy_sentinel, heavy_old=old_heavy,
    )
    if diag["masking"] and "box" not in adjudicated:
        # Round-14 advice: a median box estimate far above BOTH fixed
        # sentinels means the suite moved together while the controls
        # stayed flat — a uniform real regression that median
        # normalization absorbs (compute_movers would flag ZERO movers
        # and the table would emit silently rebased). Refuse; after
        # adjudicating the global move, re-emit these same measurements
        # with --adjudicate box=<cause>.
        print(f"REFUSING to emit the band table: {diag['masking']}\n"
              "After adjudicating (solo re-measures + a named cause), "
              f"re-emit THESE measurements (saved to {PENDING_PATH}) "
              "with --emit-pending --adjudicate box=<cause>.",
              file=sys.stderr)
        sys.exit(3)
    missing = adjudication_gate(movers, adjudicated)
    if missing:
        print(
            f"REFUSING to emit the band table: {len(missing)} median(s) "
            f"moved >{DIFF_THRESHOLD}× (box-normalized) vs the "
            "previous table without an adjudication. Re-measure each solo "
            "(python -m tools.bench_isolated -n 5 <name>), name a cause, "
            "then emit THESE measurements (saved to "
            f"{PENDING_PATH}) with --emit-pending --adjudicate name=cause:",
            file=sys.stderr,
        )
        for name, o, m, raw, norm in movers:
            if name in missing:
                print(f"- {name}: {o:.2f} → {m:.2f} s ({raw:.2f}× raw, "
                      f"{norm:.2f}× normalized)", file=sys.stderr)
        sys.exit(2)

    print(f"<!-- generated: python -m tools.gen_baseline_bands -n {n_runs}, "
          f"sf={sf_dir}, local[{cpus}] -->")
    print(f"<!-- sentinel {SENTINEL_QUERY} median={sentinel:.2f}s"
          + (f"; heavy sentinel {HEAVY_SENTINEL_QUERY} "
             f"median={heavy_sentinel:.2f}s" if heavy_sentinel else "")
          + (f"; prev sentinel {old_sentinel:.2f}s (box ratio "
             f"{sentinel / old_sentinel:.2f}×)" if old_sentinel else "")
          + (f"; prev heavy {old_heavy:.2f}s (heavy ratio "
             f"{heavy_sentinel / old_heavy:.2f}×)"
             if old_heavy and heavy_sentinel else "")
          + " -->")
    if sentinel_end:
        print(f"<!-- intra-draw drift: sentinel {sentinel:.2f}→"
              f"{sentinel_end:.2f}s ({sentinel_end / sentinel:.2f}×)"
              + (f", heavy {heavy_sentinel:.2f}→{heavy_end:.2f}s "
                 f"({heavy_end / heavy_sentinel:.2f}×)" if heavy_end else "")
              + " -->")
    print("| bench query | isolated band (s) | median (s) | watch ≥ (s) "
          "| vs prev band |")
    print("|---|---|---|---|---|")
    for name, lo, hi, med, watch in rows:
        print(f"| `{name}` | {lo:.2f}-{hi:.2f} | {med:.2f} | {watch:.2f} "
              f"| {tags[name]} |")
    total = sum(r[3] for r in rows)
    print(f"\nMedian-sum across the {len(rows)}-query suite: {total:.1f} s.")
    if diag["masking"]:
        print(f"\n**Masking disagreement ADJUDICATED before emission** "
              f"({diag['masking']}) — cause: {adjudicated['box']}")
    if movers:
        print(f"\n**Regeneration diff — box-normalized medians moved "
              f">{DIFF_THRESHOLD}× vs the previous band table (each "
              "solo-adjudicated before this table was emitted):**")
        for name, o, m, raw, norm in movers:
            print(f"- `{name}`: {o:.2f} → {m:.2f} s ({raw:.2f}× raw, "
                  f"{norm:.2f}× normalized) — ADJUDICATED: "
                  f"{adjudicated[name]}")
    else:
        print(f"\nRegeneration diff: no box-normalized median moved "
              f">{DIFF_THRESHOLD}× vs the previous band table.")


if __name__ == "__main__":
    main()
