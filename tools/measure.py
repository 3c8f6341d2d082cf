"""Shared measurement-protocol logic for the band/adjudication tools.

Round-13 box-state calibration: every investigated bench "regression" in
rounds 11 AND 12 was global box-state drift (controls elevated the same
1.3-1.5x, code byte-identical since the band commit). The fix is a
SENTINEL — a fixed cheap plan-stable query (agg_group) timed at the top
of every band draw and isolated re-measure — recorded with the table /
adjudication record, so two measurements taken on different-temperature
boxes compare through the ratio of their sentinels instead of spawning
another adjudication hunt.

Pure functions only (regex + arithmetic) so the protocol itself is unit
tested without a SparkSession (tests/test_pipeline.py); the Spark-side
callers are tools/gen_baseline_bands.py and tools/bench_isolated.py.
"""

from __future__ import annotations

import re

DIFF_THRESHOLD = 1.25
SENTINEL_QUERY = "agg_group"  # cheapest, most plan-stable headline row


def parse_prev_block(baseline_text: str) -> tuple[dict, float | None]:
    """(median-by-query, sentinel) of the LAST generated band table in
    BASELINE.md. Earlier rounds' tables may remain above it; pre-r13
    tables carry no sentinel header → (medians, None)."""
    blocks = baseline_text.split(
        "<!-- generated: python -m tools.gen_baseline_bands"
    )
    medians = {}
    for m in re.finditer(
        r"^\| `(\w+)` \| [\d.]+-[\d.]+ \| ([\d.]+) \| [\d.]+ \|", blocks[-1], re.M
    ):
        medians[m.group(1)] = float(m.group(2))
    sm = re.search(
        r"sentinel " + re.escape(SENTINEL_QUERY) + r" median=([\d.]+)s",
        blocks[-1],
    )
    return medians, float(sm.group(1)) if sm else None


#: Minimum common queries for the median-of-ratios box estimate; below
#: this a single genuine mover IS the median, so fall back to sentinels.
MIN_COMMON_FOR_MEDIAN = 5


def compute_movers(
    rows: list,
    old_medians: dict,
    sentinel_new: float | None,
    sentinel_old: float | None,
    threshold: float = DIFF_THRESHOLD,
) -> tuple[list, dict]:
    """``rows``: [(name, lo, hi, median, watch)]. Returns
    (movers, tags): movers = [(name, old, new, raw_ratio, norm_ratio)]
    whose BOX-NORMALIZED median moved >threshold in either direction;
    tags[name] = the "vs prev band" cell text.

    Box estimate between the two table draws: the MEDIAN of per-query
    new/old median ratios over the common rows (same estimator as
    tools/bench_compare, same measured reason: a cheap sentinel
    over-reads scheduler heat ~1.35× vs the heavy rows, which in the
    masking direction hides a real heavy mover). Falls back to the
    sentinel ratio under MIN_COMMON_FOR_MEDIAN common rows, then to raw
    (pre-r13 tables) — each fallback strictly more conservative."""
    import statistics

    ratios = sorted(
        med / old_medians[name]
        for name, _lo, _hi, med, _watch in rows
        if name in old_medians and old_medians[name] > 0
    )
    if len(ratios) >= MIN_COMMON_FOR_MEDIAN:
        box = statistics.median(ratios)
    elif sentinel_new and sentinel_old:
        box = sentinel_new / sentinel_old
    else:
        box = 1.0
    movers, tags = [], {}
    for name, _lo, _hi, med, _watch in rows:
        if name not in old_medians or old_medians[name] <= 0:
            tags[name] = "new"
            continue
        raw = med / old_medians[name]
        norm = raw / box
        tag = f"{raw:.2f}×" + (f" ({norm:.2f}× norm)" if box != 1.0 else "")
        if norm > threshold or norm < 1 / threshold:
            tag += " ⚠"
            movers.append((name, old_medians[name], med, raw, norm))
        tags[name] = tag
    return movers, tags


def adjudication_gate(movers: list, adjudicated: dict) -> list:
    """Round-13 CI gate (judge item 6, extending the round-12 diff
    protocol): regenerating bands silently rebases every watch
    threshold, so a table with un-adjudicated >threshold movers must
    not be emitted at all. Returns the mover names MISSING an
    adjudication (--adjudicate name=cause); empty list = safe to emit."""
    return [m[0] for m in movers if m[0] not in adjudicated]
