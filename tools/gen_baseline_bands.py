"""Generate the BASELINE.md current-band table.

Runs every bench.py HEADLINE query in ISOLATION (one warm-up, then N
timed runs with GC between, the bench_isolated protocol) and prints a
markdown table: per-query isolated band (min-max), median, and the
watch threshold (1.5x median — an in-bench or isolated draw above it
triggers the drift protocol: re-measure alone, diff the plan only if
the isolated number also moved).

Usage: python -m tools.gen_baseline_bands [-n RUNS]   (default 3)
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS. Prints markdown to
stdout (pipe into BASELINE.md by hand — the table is a measurement,
reviewed before committing, not a build artifact).

Regeneration DIFF (round-12 protocol): the output includes an
old-vs-new median ratio column read from BASELINE.md's current band
table, and a closing list of queries whose median moved >1.25x in
either direction. Those moves REQUIRE solo adjudication (re-measure
with tools/bench_isolated -n 5 on an idle box, name a cause) before
the new band is committed — regenerating bands silently rebases the
watch thresholds, which is how dedup_substring's 1.02->1.44 s move
slipped through in round 11.
"""

from __future__ import annotations

import gc
import os
import re
import statistics
import sys
import time

DIFF_THRESHOLD = 1.25


def _old_medians() -> dict:
    """Median column of the LAST generated band table in BASELINE.md."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.md"
    )
    try:
        text = open(path).read()
    except OSError:
        return {}
    # take the final generated block (earlier rounds' tables may remain)
    blocks = text.split("<!-- generated: python -m tools.gen_baseline_bands")
    out = {}
    for m in re.finditer(
        r"^\| `(\w+)` \| [\d.]+-[\d.]+ \| ([\d.]+) \| [\d.]+ \|", blocks[-1], re.M
    ):
        out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE

    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
    from spark_ml_helper_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="smhs-baseline-bands", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: str) -> None:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    rows = []
    for name in HEADLINE:
        materialize(name)
        runs = []
        for _ in range(n_runs):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            materialize(name)
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        rows.append((name, min(runs), max(runs), med, 1.5 * med))
        print(
            f"| `{name}` | {min(runs):.2f}-{max(runs):.2f} | {med:.2f} "
            f"| {1.5 * med:.2f} |",
            file=sys.stderr,
            flush=True,
        )

    old = _old_medians()
    print(f"<!-- generated: python -m tools.gen_baseline_bands -n {n_runs}, "
          f"sf={sf_dir}, local[{cpus}] -->")
    print("| bench query | isolated band (s) | median (s) | watch ≥ (s) "
          "| vs prev band |")
    print("|---|---|---|---|---|")
    movers = []
    for name, lo, hi, med, watch in rows:
        if name in old and old[name] > 0:
            ratio = med / old[name]
            tag = f"{ratio:.2f}×"
            if ratio > DIFF_THRESHOLD or ratio < 1 / DIFF_THRESHOLD:
                tag += " ⚠"
                movers.append((name, old[name], med, ratio))
        else:
            tag = "new"
        print(f"| `{name}` | {lo:.2f}-{hi:.2f} | {med:.2f} | {watch:.2f} | {tag} |")
    total = sum(r[3] for r in rows)
    print(f"\nMedian-sum across the {len(rows)}-query suite: {total:.1f} s.")
    if movers:
        print(f"\n**Regeneration diff — medians moved >{DIFF_THRESHOLD}× vs the "
              "previous band table (solo adjudication REQUIRED before "
              "committing the new bands):**")
        for name, o, m, r in movers:
            print(f"- `{name}`: {o:.2f} → {m:.2f} s ({r:.2f}×)")
    else:
        print(f"\nRegeneration diff: no median moved >{DIFF_THRESHOLD}× vs the "
              "previous band table.")


if __name__ == "__main__":
    main()
