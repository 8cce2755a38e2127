"""Temporal-window registry queries (SURVEY §2.10): group_by_dynamic
(tumbling + sliding), rolling-by-time, upsample — over the events table.

Reference: DynamicGroupOptions polars-time/src/group_by/dynamic.rs:22,
RollingGroupOptions :57, upsample polars-time/src/upsample.rs:117.

Spark mapping: F.window(ts, period, every) for dynamic grouping (epoch-
aligned in both engines, closed='left' == Spark's [start,end)); a
rangeBetween window over microseconds for rolling ((t-period, t], polars
closed='right'); a per-group exploded sequence for the upsample spine.
All shuffles are keyed by (group, window) — no global windows.
"""

from __future__ import annotations

from polars_spark.queries import ltable, query

import polars_spark as pl


@query(
    "tmp_tumbling_1h",
    oracle="""
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS ts,
           round(sum(value), 4) AS total, count(*) AS n
    FROM events WHERE ts IS NOT NULL GROUP BY event_type, 2
    """,
)
def tmp_tumbling_1h(spark, sf_dir):
    ev = ltable(spark, sf_dir, "events")
    return (
        ev.group_by_dynamic("ts", every="1h", group_by="event_type")
        .agg(pl.col("value").sum().round(4).alias("total"), pl.len().alias("n"))
        .to_spark()
    )


@query(
    "tmp_tumbling_15m",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS ts,
           round(sum(value), 4) AS total,
           round(min(value), 2) AS lo, round(max(value), 2) AS hi, count(*) AS n
    FROM events WHERE ts IS NOT NULL GROUP BY 1
    """,
)
def tmp_tumbling_15m(spark, sf_dir):
    ev = ltable(spark, sf_dir, "events")
    return (
        ev.group_by_dynamic("ts", every="15m")
        .agg(
            pl.col("value").sum().round(4).alias("total"),
            pl.col("value").min().round(2).alias("lo"),
            pl.col("value").max().round(2).alias("hi"),
            pl.len().alias("n"),
        )
        .to_spark()
    )


@query(
    "tmp_sliding_30m_1h",
    oracle="""
    SELECT s AS ts, round(sum(value), 4) AS total, count(*) AS n
    FROM (SELECT * FROM events WHERE ts IS NOT NULL) events,
         unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS t(s)
    GROUP BY s
    """,
)
def tmp_sliding_30m_1h(spark, sf_dir):
    """Sliding windows (period > every): each row lands in ceil(period/every)
    = 2 windows; the oracle enumerates both starts per row explicitly."""
    ev = ltable(spark, sf_dir, "events")
    return (
        ev.group_by_dynamic("ts", every="30m", period="1h")
        .agg(pl.col("value").sum().round(4).alias("total"), pl.len().alias("n"))
        .to_spark()
    )


@query(
    "tmp_rolling_30m",
    oracle="""
    SELECT event_id,
           count(value) OVER w AS n_30m,
           round(sum(value) OVER w, 4) AS sum_30m
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1799999999 microseconds' PRECEDING
                           AND CURRENT ROW)
    """,
)
def tmp_rolling_30m(spark, sf_dir):
    """Rolling-by-time (t-30m, t] per row, partitioned by user_id.  The
    oracle's frame is 1µs narrower than 30m to reproduce polars' exclusive
    left boundary."""
    ev = ltable(spark, sf_dir, "events")
    out = ev.rolling("ts", period="30m", group_by="user_id").agg(
        pl.col("value").count().alias("n_30m"),
        pl.col("value").sum().round(4).alias("sum_30m"),
    )
    # rolling returns (user_id, ts, aggs); join event_id back via ts+user
    evf = ev.select("event_id", "user_id", "ts")
    return (
        evf.join(out, on=["user_id", "ts"], how="inner")
        .select("event_id", "n_30m", "sum_30m")
        .to_spark()
    )


@query(
    "tmp_upsample_1h",
    oracle="""
    WITH bounds AS (
      SELECT user_id, min(ts) AS lo, max(ts) AS hi FROM events GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS ts
      FROM bounds
    )
    SELECT s.user_id, count(*) AS n_slots, count(e.event_id) AS n_hits
    FROM spine s LEFT JOIN events e ON s.user_id = e.user_id AND s.ts = e.ts
    GROUP BY s.user_id
    """,
)
def tmp_upsample_1h(spark, sf_dir):
    ev = ltable(spark, sf_dir, "events")
    up = ev.upsample("ts", every="1h", group_by="user_id")
    return (
        up.group_by("user_id")
        .agg(pl.len().alias("n_slots"), pl.col("event_id").count().alias("n_hits"))
        .to_spark()
    )


@query(
    "tmp_session_windows",
    # session_window replayed as SQL gaps-and-islands: break when the gap
    # to the previous event EXCEEDS 30m (Spark merges an event landing
    # exactly at the session-end boundary — verified in test_temporal.py),
    # session id = running sum of breaks, end = last event + gap.
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE ts IS NOT NULL
    ), g AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS total
    FROM g GROUP BY user_id, sid
    """,
)
def tmp_session_windows(spark, sf_dir):
    """Batch sessionization (LazyFrame.group_by_sessions -> F.session_window):
    variable-length gap-merged windows, one shuffle on the user key."""
    ev = ltable(spark, sf_dir, "events")
    return (
        ev.group_by_sessions("ts", gap="30m", group_by="user_id")
        .agg(
            pl.len().alias("n_events"),
            pl.col("value").sum().round(4).alias("total"),
        )
        .to_spark()
    )


@query(
    "tmp_closed_both",
    oracle="""
    WITH t AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS ts, value
               FROM events WHERE ts IS NOT NULL),
    a AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, value FROM t),
    b AS (SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL 1 HOUR AS w, value FROM t
          WHERE epoch_us(ts) % 3600000000 = 0),
    u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
    SELECT w AS ts, round(sum(value), 4) AS total, count(*) AS n
    FROM u GROUP BY w
    """,
)
def tmp_closed_both(spark, sf_dir):
    """group_by_dynamic closed='both': rows exactly on an hour boundary
    belong to BOTH adjacent windows (ts truncated to 15m first so ~1/4 of
    rows sit on boundaries — the oracle replays the duplication as an
    explicit union)."""
    ev = ltable(spark, sf_dir, "events").with_columns(
        pl.col("ts").dt.truncate("15m").alias("ts")
    )
    return (
        ev.group_by_dynamic("ts", every="1h", closed="both")
        .agg(pl.col("value").sum().round(4).alias("total"), pl.len().alias("n"))
        .to_spark()
    )


@query(
    "tmp_closed_none",
    oracle="""
    WITH t AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS ts, value FROM events),
    a AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, value FROM t
          WHERE epoch_us(ts) % 3600000000 != 0)
    SELECT w AS ts, round(sum(value), 4) AS total, count(*) AS n
    FROM a GROUP BY w
    """,
)
def tmp_closed_none(spark, sf_dir):
    """group_by_dynamic closed='none': open interval — rows exactly on a
    window start belong to NO window."""
    ev = ltable(spark, sf_dir, "events").with_columns(
        pl.col("ts").dt.truncate("15m").alias("ts")
    )
    return (
        ev.group_by_dynamic("ts", every="1h", closed="none")
        .agg(pl.col("value").sum().round(4).alias("total"), pl.len().alias("n"))
        .to_spark()
    )


@query(
    "evt_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ), step2 AS (
      SELECT e.user_id, p.t_view,
             min(CASE WHEN e.event_type = 'click' AND e.ts > p.t_view THEN e.ts END) AS t_click
      FROM events e JOIN per_user p USING (user_id)
      GROUP BY e.user_id, p.t_view
    ), step3 AS (
      SELECT e.user_id, s.t_view, s.t_click,
             min(CASE WHEN e.event_type = 'purchase' AND e.ts > s.t_click THEN e.ts END) AS t_buy
      FROM events e JOIN step2 s USING (user_id)
      GROUP BY e.user_id, s.t_view, s.t_click
    )
    SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END)  AS n_view,
           count(CASE WHEN t_click IS NOT NULL THEN 1 END) AS n_click,
           count(CASE WHEN t_buy IS NOT NULL THEN 1 END)   AS n_purchase,
           floor(count(CASE WHEN t_buy IS NOT NULL THEN 1 END)
                 / CAST(count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS DOUBLE)
                 * 1e9 + 0.5) / 1e9 AS conversion
    FROM step3
    """,
)
def evt_funnel(spark, sf_dir):
    """Ordered funnel analysis (view -> click-after-view -> purchase-after-
    click), the classic event-analytics op: three chained per-user window
    minima sharing ONE user_id exchange (consecutive Window ops over the
    same partitioning reuse the shuffle), then a global conversion rollup."""
    ev = ltable(spark, sf_dir, "events")
    t1 = pl.when(pl.col("event_type") == "view").then(pl.col("ts")).min().over("user_id")
    stage1 = ev.with_columns(t1.alias("t_view"))
    t2 = (
        pl.when((pl.col("event_type") == "click") & (pl.col("ts") > pl.col("t_view")))
        .then(pl.col("ts"))
        .min()
        .over("user_id")
    )
    stage2 = stage1.with_columns(t2.alias("t_click"))
    t3 = (
        pl.when((pl.col("event_type") == "purchase") & (pl.col("ts") > pl.col("t_click")))
        .then(pl.col("ts"))
        .min()
        .over("user_id")
    )
    stage3 = stage2.with_columns(t3.alias("t_buy"))
    per_user = stage3.unique(subset="user_id", keep="any").select(
        "user_id", "t_view", "t_click", "t_buy"
    )
    out = per_user.select(
        pl.col("t_view").count().alias("n_view"),
        pl.col("t_click").count().alias("n_click"),
        pl.col("t_buy").count().alias("n_purchase"),
    )
    import pyspark.sql.functions as F

    from polars_spark.queries import fround

    # try_divide: NULL on a zero funnel head (ANSI `/` would raise; DuckDB
    # division by zero is NULL, so the oracle agrees on empty input)
    return out.to_spark().withColumn(
        "conversion", fround(F.try_divide(F.col("n_purchase"), F.col("n_view")), 9)
    )


@query(
    "evt_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(date_diff('day', DATE '2024-01-01', min(ts)) / 7) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id,
             CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7) AS BIGINT) AS week
      FROM events
    )
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY f.cohort_week, a.week - f.cohort_week
    """,
)
def evt_retention(spark, sf_dir):
    """Weekly cohort retention matrix: cohort = week of first activity,
    cell (cohort, offset) = distinct users active offset weeks later.
    Two user-keyed aggregations + one join — no window, no collect."""
    ev = ltable(spark, sf_dir, "events")
    week = (
        (pl.col("ts").cast(pl.Date) - pl.lit("2024-01-01").cast(pl.Date))
        .dt.total_days()
        .floordiv(7)
    )
    firsts = (
        ev.group_by("user_id")
        .agg(pl.col("ts").min().alias("first_ts"))
        .with_columns(
            (
                (pl.col("first_ts").cast(pl.Date) - pl.lit("2024-01-01").cast(pl.Date))
                .dt.total_days()
                .floordiv(7)
            ).alias("cohort_week")
        )
        .select("user_id", "cohort_week")
    )
    active = ev.select("user_id", week.alias("week")).unique()
    out = (
        active.join(firsts, on="user_id")
        .with_columns((pl.col("week") - pl.col("cohort_week")).alias("week_offset"))
        .group_by("cohort_week", "week_offset")
        .agg(pl.col("user_id").n_unique().alias("n_users"))
    )
    return out.to_spark()


@query(
    "evt_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def evt_transitions(spark, sf_dir):
    """First-order journey transition matrix (event -> next event per
    user): one partitioned lead window + one pair-keyed aggregation — the
    Markov-chain input for journey modeling."""
    ev = ltable(spark, sf_dir, "events").set_sorted("ts", "event_id")
    out = (
        ev.with_columns(
            pl.col("event_type").shift(-1).over("user_id").alias("next_type")
        )
        .filter(pl.col("next_type").is_not_null())
        .group_by("event_type", "next_type")
        .agg(pl.len().alias("n"))
    )
    return out.to_spark()


@query(
    "evt_json_props",
    oracle="""
    SELECT event_type,
           CAST(coalesce(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)), 0) AS BIGINT) AS k_sum,
           count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50 THEN 1 END) AS k_hi,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events GROUP BY event_type
    """,
)
def evt_json_props(spark, sf_dir):
    """Semi-structured payload analytics: JSON property extraction
    (str.json_path_match -> get_json_object, pushed into the scan
    projection) feeding a keyed aggregation — the ClickBench-style
    JSON-at-scale shape."""
    ev = ltable(spark, sf_dir, "events")
    k = pl.col("props").str.json_path_match("$.k").cast(pl.Int64)
    return (
        ev.group_by("event_type")
        .agg(
            k.sum().alias("k_sum"),
            (k >= 50).sum().alias("k_hi"),
            k.max().alias("k_max"),
        )
        .to_spark()
    )


@query(
    "tmp_int_dynamic",
    # integer-index dynamic windows (every=1000i, period=3000i, closed left):
    # row i belongs to aligned starts s in {i - i%1000 - j*1000, j=0..2}
    # with s <= i < s+3000 — replayed literally via unnest
    oracle="""
    WITH e AS (SELECT event_id AS i, value FROM events),
    w AS (
      SELECT i, value,
             unnest([i - (i % 1000), i - (i % 1000) - 1000, i - (i % 1000) - 2000]) AS s
      FROM e
    )
    SELECT s AS event_id, count(*) AS n,
           floor(sum(value) * 10000 + 0.5) / 10000 AS total
    FROM w WHERE i >= s AND i < s + 3000
    GROUP BY s
    """,
)
def tmp_int_dynamic(spark, sf_dir):
    """group_by_dynamic over an INTEGER index column ('i' units, polars
    dynamic.rs integer path): sliding 3000-wide windows every 1000 ids.
    Window assignment is a map-side explode of the aligned candidate
    starts; one keyed shuffle."""
    ev = ltable(spark, sf_dir, "events")
    return (
        ev.group_by_dynamic("event_id", every="1000i", period="3000i")
        .agg(
            pl.len().alias("n"),
            (pl.col("value").sum() * 10000 + 0.5).floor().truediv(10000).alias("total"),
        )
        .to_spark()
    )
