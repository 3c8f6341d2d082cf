"""Box-normalized bench-vs-band comparison (round-13 protocol).

Reads a driver bench record (BENCH_r{N}.json or a raw bench.py JSON
line) and BASELINE.md's current band table, estimates the box-state
ratio between the two, and reports each query's band multiple BOTH raw
and normalized. A query is a WATCH crossing only if its NORMALIZED
time exceeds the 1.5x-median watch threshold — the raw comparison
generated a spurious adjudication hunt in round 11 AND round 12
(controls elevated equally, code byte-identical: global box
temperature, not plans).

Box estimate: MEDIAN-OF-RATIOS over all matched queries (bench[q] /
band_median[q]), not the single cheap sentinel. Measured motivation
(round 13, this box): after a 19-minute pytest run the `agg_group`
sentinel read 1.64x its band-draw value while the 40 heavy queries'
median ratio was ~1.10x — cheap sub-second plans feel scheduler/JVM
heat far more than CPU-bound ones. Dividing by the sentinel alone
over-corrects ~1.5x, which in the masking direction would let a real
~1.4x heavy-query regression normalize to under-band and pass silently.
The median of 40 per-query ratios is robust to any few genuine
regressions (they're outliers against the median, so they survive
normalization and still flag), costs nothing extra to measure, and the
sentinel is kept as a cross-check: when the two estimates disagree
>1.25x either way the report says so loudly —
  sentinel >> median: cheap-plan-sensitive drift (today's case; trust
                      the median);
  median >> sentinel: the heavy queries moved TOGETHER while the cheap
                      control stayed flat — that is what a real global
                      code/config regression looks like; do NOT trust
                      the normalization until adjudicated.

Usage: python -m tools.bench_compare BENCH_r13.json
Pure file parsing — no SparkSession. Exit 1 if any normalized watch
crossing exists (so the round's closing gate can assert cleanliness).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

from tools.measure import SENTINEL_QUERY, parse_prev_block

#: Below this many matched queries the median-of-ratios is too fragile
#: (one regression IS the median at n=1-2) — fall back to the sentinel.
MIN_QUERIES_FOR_MEDIAN = 5

#: Sentinel-vs-median disagreement that triggers the loud cross-check.
DISAGREE_THRESHOLD = 1.25


def load_bench(path: str) -> dict:
    """Accepts the driver's wrapper ({'parsed': {...}}) or a raw line."""
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def load_bands(baseline_path: str) -> tuple[dict, float | None]:
    """{query: (median, watch)} of the last generated table + sentinel."""
    text = open(baseline_path).read()
    blocks = text.split("<!-- generated: python -m tools.gen_baseline_bands")
    bands = {}
    for m in re.finditer(
        r"^\| `(\w+)` \| [\d.]+-[\d.]+ \| ([\d.]+) \| ([\d.]+) \|",
        blocks[-1],
        re.M,
    ):
        bands[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    _, sentinel = parse_prev_block(text)
    return bands, sentinel


def compare(
    bench: dict, bands: dict, band_sentinel: float | None
) -> tuple[list, float, dict]:
    """[(name, sec, norm_sec, median, watch, crossed)], box_ratio, diag.

    box_ratio is the median of per-query bench/band ratios when >=
    MIN_QUERIES_FOR_MEDIAN queries match, else the sentinel ratio, else
    1.0 (raw). diag carries {'source', 'sentinel_ratio'} so callers can
    print the cross-check.
    """
    sent = bench.get("box_sentinel", {})
    sentinel_ratio = (
        sent["sec"] / band_sentinel
        if band_sentinel
        and sent.get("query") == SENTINEL_QUERY
        and sent.get("sec")
        else None
    )
    matched = [
        (name, sec, bands[name])
        for name, sec in bench.get("queries", {}).items()
        if name in bands
    ]
    ratios = [sec / med for _, sec, (med, _) in matched if med > 0]
    if len(ratios) >= MIN_QUERIES_FOR_MEDIAN:
        box, source = statistics.median(ratios), "median-of-ratios"
    elif sentinel_ratio:
        box, source = sentinel_ratio, "sentinel"
    else:
        box, source = 1.0, "raw"
    rows = [
        (name, sec, sec / box, med, watch, sec / box > watch)
        for name, sec, (med, watch) in matched
    ]
    return rows, box, {"source": source, "sentinel_ratio": sentinel_ratio}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "BENCH_r12.json"
    )
    bench = load_bench(bench_path)
    bands, band_sentinel = load_bands(os.path.join(here, "BASELINE.md"))
    rows, box, diag = compare(bench, bands, band_sentinel)
    if band_sentinel is None:
        print("NOTE: band table carries no sentinel header (pre-r13).",
              file=sys.stderr)
    sr = diag["sentinel_ratio"]
    print(f"box ratio ({diag['source']}): {box:.2f}×"
          + (f"; sentinel ratio: {sr:.2f}×" if sr else ""))
    if sr and box and max(sr / box, box / sr) > DISAGREE_THRESHOLD:
        if sr > box:
            print(f"NOTE: sentinel ({sr:.2f}×) well above query median "
                  f"({box:.2f}×) — cheap-plan-sensitive box drift; the "
                  f"median estimate is the trustworthy one.")
        else:
            print(f"WARNING: query median ({box:.2f}×) well above sentinel "
                  f"({sr:.2f}×) — heavies moved together while the cheap "
                  f"control stayed flat. That is the signature of a REAL "
                  f"global regression; adjudicate before trusting the "
                  f"normalized column.")
    crossings = [r for r in rows if r[5]]
    for name, sec, norm, med, watch, crossed in sorted(
        rows, key=lambda r: -r[2] / r[3]
    ):
        flag = " WATCH" if crossed else ""
        if (
            crossed
            and name == SENTINEL_QUERY
            and sr
            and sr / box > DISAGREE_THRESHOLD
        ):
            # the sentinel crossing its own watch while reading far above
            # the query median IS the cheap-plan drift the note above
            # describes — solo-adjudicate (tools/bench_isolated), don't
            # hunt the plan
            flag += " (sentinel itself — consistent with the drift note)"
        print(f"{name:28s} bench {sec:6.2f}s  norm {norm:6.2f}s  "
              f"band med {med:5.2f}  watch {watch:5.2f}  "
              f"{norm / med:4.2f}×{flag}")
    n = len(rows)
    print(f"\n{n} queries compared; {len(crossings)} normalized watch "
          f"crossing(s).")
    sys.exit(1 if crossings else 0)


if __name__ == "__main__":
    main()
