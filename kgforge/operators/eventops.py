"""Event-analytics operators over the ``events`` table — the three
classic time-join shapes a large-scale event pipeline needs that plain
equi-joins cannot express, each as an oracle-gated query:

- ``asof_join`` — for every ``purchase`` event, the latest strictly-prior
  ``click`` by the same user (the time-series as-of join: trades vs
  quotes, conversions vs impressions).
- ``interval_join`` — for every ``error`` event, how many ``click``
  events (any user) landed inside its 5-minute impact window (the
  interval-containment / range join).
- ``funnel_counts`` — how many users completed each prefix of the
  ordered signup -> click -> purchase funnel (strictly increasing
  timestamps; the sequential-pattern aggregation).

Scale shapes (the reason these exist as bespoke plans, not naive joins):

* The as-of join is NOT a join at all: both streams union into one
  table, shuffle ONCE on user_id, and a running ``last(ignorenulls)``
  window over the merged time order carries the latest click forward
  into each purchase row.  Cost is one exchange + one sort over
  n_purchases + n_clicks rows — the per-row candidate scan of the
  lateral/self-join formulation (which the DuckDB oracle uses, making it
  an independent derivation) never happens, and there is no O(n^2)
  blow-up on power users.
* The interval join buckets time into interval-width buckets: each
  5-minute window covers exactly two bucket cells, so exploding the
  interval side x2 turns containment into a bucket EQUI-join (shuffle
  hash/SMJ) with the range predicate applied inside the matched bucket.
  The naive formulation is a BroadcastNestedLoopJoin — O(intervals x
  events) comparisons; the bucketed plan touches only same-bucket pairs.
  A plan test pins "no nested-loop, no cartesian".  The oracle uses the
  correlated containment subquery — independent of the bucketing.
* The funnel is three chained (filter -> per-user min -> co-partitioned
  join) steps; every shuffle is keyed on user_id so AQE coalesces the
  chain, and each step's input shrinks monotonically (users surviving
  step k-1).  No window over the full event stream is ever taken.

Division semantics note (round-3 advisor item, checked and refuted):
Spark's ``div`` truncates toward zero, and DuckDB's INTEGER ``//`` ALSO
truncates toward zero (floor semantics apply only to its float ``//``):
``select -1 // 604800000000`` = 0 in DuckDB 1.0, equal to ``-1 div
604800000000`` in Spark.  So the bucket/day/week ids below agree between
the engines for ALL inputs, including pre-1970 negative-epoch
timestamps — pinned by test_div_truncation_agrees_with_duckdb.

Timestamps are compared in integer MICROSECONDS (``unix_micros`` /
``epoch_us``) end-to-end: both engines do exact int64 arithmetic, so the
driver's value hash is immune to float rounding on time deltas.  The
parquet column reads as TIMESTAMP_NTZ; the session pins
``spark.sql.session.timeZone=UTC`` (kgforge/session.py, asserted by
tests), so casting NTZ -> TIMESTAMP preserves the wall-clock instant and
``unix_micros`` equals DuckDB's ``epoch_us`` on the naive value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .registry import ROUND, query, table

ASOF_A = "purchase"  # the probe stream (gets enriched)
ASOF_B = "click"  # the reference stream (carried forward)
WINDOW_US = 300_000_000  # 5-minute impact window, microseconds
FUNNEL = ("signup", "click", "purchase")


def _events(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "events")


def _us(col) -> F.Column:
    """TIMESTAMP_NTZ -> int64 microseconds since epoch (UTC session)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


# ------------------------------------------------------------- as-of join
@query(
    "asof_join",
    oracle=f"""
    with a as (select * from events where event_type = '{ASOF_A}'),
    b as (select * from events where event_type = '{ASOF_B}'),
    best as (
      select a.event_id, b.event_id as click_event_id,
             epoch_us(a.ts) - epoch_us(b.ts) as gap_us,
             row_number() over (partition by a.event_id
                                order by b.ts desc, b.event_id desc) as rn
      from a join b on b.user_id = a.user_id and b.ts < a.ts
    )
    select a.event_id, a.user_id, best.click_event_id, best.gap_us
    from a left join (select * from best where rn = 1) best using (event_id)
    """,
)
def asof_join(spark, sf_dir):
    """As-of join via union-merge: tag both streams, shuffle once on
    user_id, order by (ts, tag, event_id) with probe rows sorting BEFORE
    reference rows at equal ts (strictly-prior semantics), and carry the
    latest reference row forward with last(ignorenulls).  Ties among
    same-timestamp clicks resolve to the max event_id on both sides.
    Purchases with no prior click keep null enrichment columns."""
    ev = _events(spark, sf_dir)
    cols = ["user_id", "ts", "event_id"]
    # tag 0 = probe (purchase), 1 = reference (click): at equal ts the
    # probe sorts first, so an equal-ts click is NOT visible to it.
    a = ev.where(F.col("event_type") == ASOF_A).select(*cols, F.lit(0).alias("tag"))
    b = ev.where(F.col("event_type") == ASOF_B).select(*cols, F.lit(1).alias("tag"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_eid = F.when(F.col("tag") == 1, F.col("event_id"))
    ref_ts = F.when(F.col("tag") == 1, F.col("ts"))
    merged = a.unionByName(b).select(
        "*",
        F.last(ref_eid, ignorenulls=True).over(w).alias("click_event_id"),
        F.last(ref_ts, ignorenulls=True).over(w).alias("b_ts"),
    )
    return merged.where(F.col("tag") == 0).select(
        "event_id",
        "user_id",
        "click_event_id",
        (_us("ts") - _us("b_ts")).alias("gap_us"),
    )


# ----------------------------------------------------------- interval join
@query(
    "interval_join",
    oracle=f"""
    with err as (select event_id, epoch_us(ts) as t0 from events
                 where event_type = 'error'),
    c as (select epoch_us(ts) as ct from events where event_type = '{ASOF_B}')
    select err.event_id,
           (select count(*) from c
            where c.ct > err.t0 and c.ct <= err.t0 + {WINDOW_US})::BIGINT
             as n_clicks
    from err
    """,
)
def interval_join(spark, sf_dir):
    """Bucketized interval-containment join: clicks inside each error's
    (t0, t0 + 5 min] window, counted per error (zero kept).  Bucket width
    equals the window width, so every interval covers exactly buckets
    b and b+1 — the x2 explode turns containment into an equi-join and
    the range predicate evaluates only within the matched bucket.
    Integer `div` on microseconds keeps bucket ids exact in both engines."""
    ev = _events(spark, sf_dir)
    err = (
        ev.where(F.col("event_type") == "error")
        .select("event_id", _us("ts").alias("t0"))
        .select(
            "event_id",
            "t0",
            F.explode(
                F.array(
                    F.expr(f"t0 div {WINDOW_US}"),
                    F.expr(f"t0 div {WINDOW_US}") + F.lit(1),
                )
            ).alias("bucket"),
        )
    )
    clicks = ev.where(F.col("event_type") == ASOF_B).select(
        _us("ts").alias("ct"),
        F.expr(f"unix_micros(cast(ts as timestamp)) div {WINDOW_US}").alias("bucket"),
    )
    hits = (
        err.join(clicks, "bucket")
        .where((F.col("ct") > F.col("t0")) & (F.col("ct") <= F.col("t0") + WINDOW_US))
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = ev.where(F.col("event_type") == "error").select("event_id")
    return base.join(hits, "event_id", "left").select(
        "event_id", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_clicks")
    )


# ---------------------------------------------------------------- funnel
def _sql_funnel_steps() -> str:
    parts = [
        f"""s1 as (select user_id, min(ts) as t from events
             where event_type = '{FUNNEL[0]}' group by user_id)"""
    ]
    for i in range(1, len(FUNNEL)):
        parts.append(
            f"""s{i+1} as (
              select e.user_id, min(e.ts) as t from events e
              join s{i} on s{i}.user_id = e.user_id and e.ts > s{i}.t
              where e.event_type = '{FUNNEL[i]}' group by e.user_id)"""
        )
    return ",\n".join(parts)


@query(
    "funnel_counts",
    oracle=f"""
    with {_sql_funnel_steps()}
    {" union all ".join(
        f"select {i+1}::BIGINT as step, '{t}' as event_type, "
        f"(select count(*) from s{i+1})::BIGINT as n_users"
        for i, t in enumerate(FUNNEL)
    )}
    """,
)
def funnel_counts(spark, sf_dir):
    """Ordered-funnel completion counts: users whose first signup precedes
    some click which precedes some purchase (strictly increasing ts; each
    step anchored at the EARLIEST qualifying time, the standard
    first-touch funnel).  Emits one row per step with the surviving user
    count."""
    ev = _events(spark, sf_dir)
    step = (
        ev.where(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    out = [
        step.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).cast("long").alias("step"),
            F.lit(FUNNEL[0]).alias("event_type"),
            "n_users",
        )
    ]
    for i, etype in enumerate(FUNNEL[1:], start=2):
        nxt = ev.where(F.col("event_type") == etype).select(
            "user_id", F.col("ts").alias("ets")
        )
        step = (
            nxt.join(step, "user_id")
            .where(F.col("ets") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ets").alias("t"))
        )
        out.append(
            step.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).cast("long").alias("step"),
                F.lit(etype).alias("event_type"),
                "n_users",
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


# --------------------------------------------------------- moving window
DAY_US = 86_400_000_000


@query(
    "rolling_7d",
    oracle=f"""
    with daily as (
      select user_id, epoch_us(ts) // {DAY_US} as day, count(*) as n
      from events group by user_id, epoch_us(ts) // {DAY_US}
    )
    select user_id, day, n::BIGINT as n_events,
           (sum(n) over (partition by user_id order by day
                         range between 6 preceding and current row))::BIGINT
             as n_7d
    from daily
    """,
)
def rolling_7d(spark, sf_dir):
    """Rolling 7-day activity per user: daily event counts plus a RANGE
    window sum over the integer day index — gaps in the calendar are
    handled by the range frame (a rows frame would silently span missing
    days).  All-integer arithmetic end-to-end: day ids by int64 div,
    counts summed exactly — no float ever enters the cross-engine hash.
    Scale: one user-keyed shuffle for the daily agg, and the window
    reuses that partitioning (no second exchange)."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.select("user_id", F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "user_id", "day", "n_events", F.sum("n_events").over(w).alias("n_7d")
    )


# --------------------------------------------------------- cohort retention
# Weekly cohort retention: users are grouped by the ISO week of their
# FIRST event (the cohort), and each later week they show any activity
# increments that (cohort, offset) cell; retention = active / cohort
# size.  The product-analytics staple that composes two shuffles the
# reference has no vocabulary for: a per-user min (first touch) and a
# distinct (user, week) activity grid, joined back on user_id — both
# keyed on user_id, so AQE coalesces them into one exchange chain.  At
# scale the (user, week) distinct is the only corpus-sized aggregate;
# cohort sizes are |users| and the final cell grid is tiny.  Weeks are
# int64 indices (epoch_us of the Monday div WEEK_US) per the module's
# no-float-no-date hashing convention.
WEEK_US = 7 * 86_400_000_000


@query(
    "cohort_retention",
    oracle=f"""
    with act as (
      select distinct user_id, epoch_us(date_trunc('week', ts)) // {WEEK_US} as week
      from events
    ),
    first as (select user_id, min(week) as cohort_week from act group by user_id),
    size_ as (select cohort_week, count(*)::BIGINT as cohort_n from first group by cohort_week),
    cells as (
      select f.cohort_week, a.week - f.cohort_week as week_offset, count(*)::BIGINT as n_active
      from act a join first f on f.user_id = a.user_id
      group by 1, 2
    )
    select c.cohort_week, c.week_offset, c.n_active,
           round(c.n_active / s.cohort_n, {ROUND}) as retention
    from cells c join size_ s on s.cohort_week = c.cohort_week
    """,
)
def cohort_retention(spark, sf_dir):
    """(cohort_week, week_offset) activity cells with retention rate;
    weeks and offsets are exact int64 epoch arithmetic (no float dates)."""
    ev = _events(spark, sf_dir)
    week = F.expr(f"unix_micros(date_trunc('week', cast(ts as timestamp))) div {WEEK_US}")
    act = ev.select("user_id", week.alias("week")).distinct()
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    size = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_n"))
    cells = (
        act.join(first, "user_id")
        .select("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(F.broadcast(size), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") / F.col("cohort_n"), ROUND).alias("retention"),
    )


# ------------------------------------------------------- robust outliers
# Median/MAD outlier flagging per event type: the robust z-score
# (|x - median| / MAD) is the standard anomaly cut that survives the
# heavy-tailed value distributions a mean/stddev z-score is wrecked by.
# Exact interpolated medians on both engines (Spark ``percentile`` ==
# DuckDB ``quantile_cont``), never approx_percentile — approximate
# quantiles are sketch-dependent and would break the cross-engine hash.
# Scale: two type-keyed aggregates (median, then MAD of residuals) and
# one broadcast join back — the event stream is never sorted globally,
# and the per-type percentile is a single-pass sort-agg within each
# type's partition.
OUTLIER_Z = 3.0


@query(
    "value_outliers",
    oracle=f"""
    with med as (
      select event_type, quantile_cont(value, 0.5) as med
      from events group by event_type
    ),
    mad as (
      select e.event_type, quantile_cont(abs(e.value - m.med), 0.5) as mad
      from events e join med m using (event_type) group by e.event_type
    )
    select e.event_id, e.event_type,
           round(abs(e.value - m.med) / d.mad, {ROUND}) as z
    from events e
    join med m using (event_type)
    join mad d using (event_type)
    where d.mad > 0
      and round(abs(e.value - m.med) / d.mad, {ROUND}) > {OUTLIER_Z}
    """,
)
def value_outliers(spark, sf_dir):
    """Events whose robust z-score exceeds {z} MADs from their type's
    median.  The cut compares the ROUNDED score so the boundary row set
    is engine-stable.""".format(z=OUTLIER_Z)
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    resid = ev.join(F.broadcast(med), "event_type")
    mad = resid.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    z = F.round(F.abs(F.col("value") - F.col("med")) / F.col("mad"), ROUND)
    return (
        resid.join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (z > OUTLIER_Z))
        .select("event_id", "event_type", z.alias("z"))
    )
