"""Sentinel-normalized bench-vs-band comparison (round-13 protocol).

Reads a driver bench record (BENCH_r{N}.json or a raw bench.py JSON
line) and BASELINE.md's current band table, divides the bench's
box_sentinel by the band table's sentinel header to get the box ratio,
and reports each query's band multiple BOTH raw and normalized. A
query is a WATCH crossing only if its NORMALIZED time exceeds the
1.5x-median watch threshold — the raw comparison generated a spurious
adjudication hunt in round 11 AND round 12 (controls elevated equally,
code byte-identical: global box temperature, not plans).

Usage: python -m tools.bench_compare BENCH_r13.json
Pure file parsing — no SparkSession. Exit 1 if any normalized watch
crossing exists (so the round's closing gate can assert cleanliness).
"""

from __future__ import annotations

import json
import os
import re
import sys

from tools.measure import SENTINEL_QUERY, parse_prev_block


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


def compare(bench: dict, bands: dict, band_sentinel: float | None) -> tuple[list, float]:
    """[(name, sec, norm_sec, median, watch, crossed)], box_ratio."""
    sent = bench.get("box_sentinel", {})
    box = (
        sent["sec"] / band_sentinel
        if band_sentinel and sent.get("query") == SENTINEL_QUERY and sent.get("sec")
        else 1.0
    )
    rows = []
    for name, sec in bench.get("queries", {}).items():
        if name not in bands:
            continue
        med, watch = bands[name]
        norm = sec / box
        rows.append((name, sec, norm, med, watch, norm > watch))
    return rows, box


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "BENCH_r12.json"
    )
    bench = load_bench(bench_path)
    bands, band_sentinel = load_bands(os.path.join(here, "BASELINE.md"))
    rows, box = compare(bench, bands, band_sentinel)
    if band_sentinel is None:
        print("NOTE: band table carries no sentinel header (pre-r13) — "
              "raw comparison only.", file=sys.stderr)
    print(f"box ratio (bench sentinel / band sentinel): {box:.2f}×")
    crossings = [r for r in rows if r[5]]
    for name, sec, norm, med, watch, crossed in sorted(
        rows, key=lambda r: -r[2] / r[3]
    ):
        flag = " WATCH" if crossed else ""
        print(f"{name:28s} bench {sec:6.2f}s  norm {norm:6.2f}s  "
              f"band med {med:5.2f}  watch {watch:5.2f}  "
              f"{norm / med:4.2f}×{flag}")
    n = len(rows)
    print(f"\n{n} queries compared; {len(crossings)} normalized watch "
          f"crossing(s).")
    sys.exit(1 if crossings else 0)


if __name__ == "__main__":
    main()
