"""Time-series smoothing and imputation operators over `events`:
exponentially-weighted moving averages and linear gap interpolation.

Both are single-shuffle shapes: the EWMA windows partition on user_id
(parallel per-user frames, no global sort); interpolation runs on the
hour×type grid — a bounded aggregate, thousands of rows at any corpus
size — so the corpus-scale work is only the one hash agg that builds the
observed series.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table

_ALPHA = 0.3  # EWMA smoothing; weight of lag j is (1-alpha)^j
_SPAN = 20  # truncation: lags beyond this carry < 0.1% weight at alpha=0.3


@query(
    "win_ewma",
    oracle=f"""
        WITH framed AS (
            SELECT event_id, user_id, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_SPAN - 1} PRECEDING AND CURRENT ROW
                   ) AS xs
            FROM events
        )
        SELECT event_id, user_id, round(value, 6) AS value,
               round(
                   list_sum(list_transform(range(1, len(xs) + 1),
                            i -> xs[i] * pow({1 - _ALPHA}, len(xs) - i)))
                   / list_sum(list_transform(range(1, len(xs) + 1),
                            i -> pow({1 - _ALPHA}, len(xs) - i))),
                   6) AS ewma
        FROM framed
    """,
    family="timeseries",
)
def win_ewma(spark, sf_dir):
    """Truncated exponentially-weighted moving average of `value` per
    user (alpha=0.3, last 20 events): the standard smoothing pass over
    per-entity metric streams. The recursive EWMA definition is
    deliberately truncated to a fixed frame so it stays a pure window
    expression — weight below the cutoff is < 0.1% — making it (a)
    shuffle-once on user_id with no sequential dependency and (b)
    bit-reproducible on both engines (identical weighted-sum arithmetic
    over the identical frame, 6-dp rounded). The frame is materialized
    with a windowed collect_list in frame order (oldest → newest) and
    folded with an indexed transform + aggregate — all JVM higher-order
    functions, no UDF."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_SPAN - 1), 0)
    )
    framed = e.select(
        "event_id", "user_id", "value", F.collect_list("value").over(w).alias("xs")
    )
    q = 1 - _ALPHA
    num = F.expr(
        f"aggregate(transform(xs, (x, i) -> x * pow({q}, size(xs) - 1 - i)), 0D, (a, v) -> a + v)"
    )
    den = F.expr(
        f"aggregate(transform(xs, (x, i) -> pow({q}, size(xs) - 1 - i)), 0D, (a, v) -> a + v)"
    )
    return framed.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.round(num / den, 6).alias("ewma"),
    )


_EPOCH = "TIMESTAMP '2024-01-01'"


@query(
    "ts_interpolate",
    oracle=f"""
        WITH obs AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   round(avg(value), 6) AS v
            FROM events
            WHERE CAST(json_extract(props, '$.k') AS INT) < 10
            GROUP BY event_type, hr
        ),
        bounds AS (SELECT min(date_trunc('hour', ts)) AS mn, max(date_trunc('hour', ts)) AS mx FROM events),
        spine AS (
            SELECT t.event_type, g.hr
            FROM (SELECT DISTINCT event_type FROM events) t,
                 (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr FROM bounds) g
        ),
        grid AS (
            SELECT s.event_type, s.hr, obs.v,
                   datediff('hour', {_EPOCH}, s.hr) AS h
            FROM spine s LEFT JOIN obs ON s.event_type = obs.event_type AND s.hr = obs.hr
        ),
        filled AS (
            SELECT event_type, hr, v, h,
                   last_value(v IGNORE NULLS) OVER w_prev AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w_prev AS ph,
                   first_value(v IGNORE NULLS) OVER w_next AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w_next AS nh
            FROM grid
            WINDOW w_prev AS (PARTITION BY event_type ORDER BY hr
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w_next AS (PARTITION BY event_type ORDER BY hr
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, hr, (v IS NOT NULL) AS observed,
               CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN pv IS NOT NULL AND nv IS NOT NULL
                       THEN pv + (nv - pv) * (h - ph) / (nh - ph)
                   ELSE coalesce(pv, nv)
               END AS v_interp
        FROM filled
    """,
    family="timeseries",
)
def ts_interpolate(spark, sf_dir):
    """Linear interpolation over a sparse hourly series: the mean `value`
    per (event_type, hour) on a ~10% slice (props.k < 10) leaves most
    grid hours empty; every gap is filled by interpolating between the
    nearest observed neighbors (edges fall back to nearest-value
    extrapolation). Complements ts_gap_fill (zero-fill): this is the
    imputation variant sensor/metrics pipelines need. Observations are
    6-dp rounded BEFORE interpolating so both engines feed bit-identical
    doubles through the identical IEEE interpolation arithmetic; the
    OUTPUT is deliberately NOT rounded — dyadic hour ratios make exact
    rounding-boundary ties common (e.g. 44.8790625), where the engines'
    double round() half-handling disagrees, while the unrounded doubles
    are bitwise equal. Plan shape: one
    corpus-sized hash agg → generated hour spine (never collected,
    broadcast) → two frame-bounded windows per type carrying the
    last/next observation forward — partitioned by event_type, so at
    scale each series interpolates independently in parallel."""
    e = table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    obs = (
        e.filter(F.get_json_object("props", "$.k").cast("int") < 10)
        .groupBy(F.col("event_type"), hr.alias("hr"))
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    bounds = e.agg(F.min(hr).alias("mn"), F.max(hr).alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    types = e.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(spine))
        .join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            "v",
            F.expr(f"timestampdiff(HOUR, {_EPOCH}, hr)").alias("h"),
        )
    )
    w_prev = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_next = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    filled = grid.select(
        "event_type",
        "hr",
        "v",
        "h",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("nh"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("h") - F.col("ph"))
            / (F.col("nh") - F.col("ph")),
        )
        .otherwise(F.coalesce("pv", "nv"))
    )
    return filled.select(
        "event_type",
        "hr",
        F.col("v").isNotNull().alias("observed"),
        interp.alias("v_interp"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
        WITH r AS (
            SELECT date_trunc('hour', ts) AS hr, value, ts, event_id,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT hr,
               round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
               round(max(value), 6)                             AS high,
               round(min(value), 6)                             AS low,
               round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
               count(*)                                         AS n_events,
               round(sum(value), 6)                             AS volume
        FROM r GROUP BY hr
    """,
    family="timeseries",
)
def ts_resample_ohlc(spark, sf_dir):
    """OHLC downsampling — the canonical time-series resample: per hourly
    bar, the first (open) and last (close) observation by (ts, event_id)
    — the id tie-break makes first/last deterministic under equal
    timestamps — plus high/low/count/volume. One window pass partitioned
    by the bar key feeds one hash aggregate on the same key, so the
    shuffle count is one and AQE coalesces the bar partitions; at 100 TB
    the bar key is time-prefixed, so a date-partitioned source prunes to
    the requested range before the window runs."""
    e = table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts")).alias("hr")
    r = e.select(hr, "value", "ts", "event_id")
    w_a = Window.partitionBy("hr").orderBy("ts", "event_id")
    w_d = Window.partitionBy("hr").orderBy(F.desc("ts"), F.desc("event_id"))
    r = r.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return r.groupBy("hr").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias("close"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("volume"),
    )
