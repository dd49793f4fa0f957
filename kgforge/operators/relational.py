"""Relational operators over the TPC-H-ish star schema + events table —
the joins/aggregations/top-k/set-ops of SURVEY.md §2.4-2.7 exercised at
engine level:

- hash aggregations with partial/map-side combine (A1-A8 family)
- dimension broadcast joins (J3/J7/J8), anti/semi joins (P7/P8)
- TakeOrderedAndProject top-k (K1) and ranking windows (K2/K3)
- set ops: intersect, symmetrize+selfloops+distinct (U2/U5)
- time-window aggregation and gap sessionization over ``events``
  (lead/lag analytic windows — beyond the reference, standard engine
  surface).

Scale notes: every query below shuffles only on its aggregation key; the
dimension tables (region/nation/customer at this SF) sit under the
broadcast threshold so Catalyst picks BroadcastHashJoin — verified in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import ROUND, query, table


@query(
    "q1_pricing_summary",
    oracle=f"""
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) as sum_qty,
           round(sum(l_extendedprice), 2) as sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
           round(avg(l_quantity), {ROUND}) as avg_qty,
           round(avg(l_discount), {ROUND}) as avg_disc,
           count(*)::BIGINT as count_order
    from lineitem
    where l_shipdate <= DATE '1998-09-02'
    group by l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical partial+final hash aggregation; the
    shipdate predicate must push into the parquet scan (test_plans)."""
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), ROUND).alias("avg_qty"),
            F.round(F.avg("l_discount"), ROUND).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "top_orders_by_revenue",
    oracle="""
    select o.o_orderkey, o.o_orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue
    from orders o join lineitem l on o.o_orderkey = l.l_orderkey
    group by o.o_orderkey, o.o_orderdate
    order by revenue desc, o_orderkey
    limit 10
    """,
)
def top_orders_by_revenue(spark, sf_dir):
    """K1 top-k after a join+agg: Catalyst executes the final sort+limit as
    TakeOrderedAndProject (no full sort)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "revenue_by_nation",
    oracle="""
    select n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue,
           count(distinct c.c_custkey)::BIGINT as n_customers
    from lineitem l
    join orders o on l.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    join nation n on c.c_nationkey = n.n_nationkey
    group by n.n_name
    """,
)
def revenue_by_nation(spark, sf_dir):
    """J7/J8 dimension-enrichment chain: customer/nation are broadcast-side,
    the fact table never shuffles until the final groupBy."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count_distinct(F.col("c_custkey")).alias("n_customers"),
        )
    )


@query(
    "topk_per_group",
    oracle="""
    select l_returnflag, l_orderkey, l_linenumber, l_extendedprice
    from (
      select l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() over (partition by l_returnflag
                                order by l_extendedprice desc, l_orderkey, l_linenumber) as rn
      from lineitem
    ) where rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """K2: per-group top-k via ranking window (the reference's per-query
    top-n loop, /root/reference/experiments/uaz_documents_comparison.py:127-132)."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "argmax_per_group",
    oracle="""
    select o_custkey, o_orderkey, o_totalprice
    from (
      select o_custkey, o_orderkey, o_totalprice,
             row_number() over (partition by o_custkey
                                order by o_totalprice desc, o_orderkey) as rn
      from orders
    ) where rn = 1
    """,
)
def argmax_per_group(spark, sf_dir):
    """K3: per-group argmax (the reference's best-row-per-concept,
    /root/reference/experiments/uaz_indicators_comparison.py:192-193)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "customers_without_orders",
    oracle="""
    select c_custkey, c_name from customer
    where not exists (select 1 from orders o where o.o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark, sf_dir):
    """P7-analog anti join (blacklist filtering as left_anti)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "nations_with_both",
    oracle="""
    select c_nationkey as nationkey from customer
    intersect
    select s_nationkey from supplier
    """,
)
def nations_with_both(spark, sf_dir):
    """U2: DataFrame intersect of two key universes."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "edge_symmetrize",
    oracle="""
    with e as (select n_nationkey as src, n_regionkey + 100 as dst from nation)
    select src, dst from e
    union
    select dst, src from e
    union
    select src, src from e
    union
    select dst, dst from e
    """,
)
def edge_symmetrize(spark, sf_dir):
    """U5: reciprocal edges + self-loops + distinct — the reference's
    adjacency symmetrization (/root/reference/data/wm_ontology.py:50-69)
    as pure edge-table set ops."""
    n = table(spark, sf_dir, "nation")
    e = n.select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.col("n_regionkey") + 100).cast("long").alias("dst"),
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    self_src = e.select("src", F.col("src").alias("dst"))
    self_dst = e.select(F.col("dst").alias("src"), "dst")
    return e.union(rev).union(self_src).union(self_dst).distinct()


@query(
    "events_hourly",
    oracle=f"""
    select time_bucket(INTERVAL '1 hour', ts) as win_start, event_type,
           count(*)::BIGINT as n_events, round(sum(value), 2) as sum_value,
           count(distinct user_id)::BIGINT as n_users
    from events
    group by 1, 2
    """,
)
def events_hourly(spark, sf_dir):
    """Tumbling time-window aggregation over events (batch form; the same
    plan runs under Structured Streaming — see kgforge/streaming)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value", "n_users")
    )


@query(
    "json_props",
    oracle="""
    select event_id, (props::JSON->>'k')::BIGINT as k,
           case when (props::JSON->>'k')::BIGINT >= 50 then 'high' else 'low' end as k_band
    from events
    """,
)
def json_props(spark, sf_dir):
    """S1/S2: nested-JSON column scan + flatten (the reference's JSONL
    record extraction, /root/reference/data/indicators.py:8-18) via
    get_json_object — JVM-side JSON path, no UDF."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "event_sessions",
    oracle="""
    with g as (
      select user_id, ts,
             case when ts - lag(ts) over (partition by user_id order by ts, event_id)
                       > INTERVAL '30 minutes' or
                       lag(ts) over (partition by user_id order by ts, event_id) is null
                  then 1 else 0 end as new_session
      from events
    )
    select user_id, sum(new_session)::BIGINT as n_sessions, count(*)::BIGINT as n_events
    from g group by user_id
    """,
)
def event_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag + running
    indicator — the analytic-window surface the reference lacks."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------- skew profile
# Heavy-hitter / key-skew diagnostics: the FIRST query anyone runs before
# choosing a join strategy at 100 TB — "is this key salted-repartition
# material or broadcast material?".  Top-N keys by frequency with each
# key's share and the running cumulative share of the head.  One hash
# aggregate (map-side partial combine collapses the hot key BEFORE the
# shuffle — profiling a skewed key must not itself skew) + a top-N cut;
# the cumulative window runs over N rows only.
SKEW_TOPN = 20


@query(
    "heavy_hitters",
    oracle=f"""
    with c as (
      select l_partkey::BIGINT as key, count(*)::BIGINT as n
      from lineitem group by l_partkey
    ),
    tot as (select sum(n) as t, count(*) as n_keys from c),
    top as (
      select key, n, row_number() over (order by n desc, key) as rank
      from c
    )
    select rank, key, n,
           round(n / tot.t, {ROUND}) as share,
           round(sum(n) over (order by rank) / tot.t, {ROUND}) as cum_share
    from top, tot where rank <= {SKEW_TOPN}
    """,
)
def heavy_hitters(spark, sf_dir):
    """Top-{n} heaviest lineitem part keys with share + cumulative share
    of total rows.""".format(n=SKEW_TOPN)
    li = table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").cast("long").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.agg(F.sum("n").cast("double").alias("t"))
    # global top-N via orderBy+limit -> TakeOrderedAndProject; the rank /
    # cumulative window then runs over SKEW_TOPN rows on one task.
    top = c.orderBy(F.desc("n"), F.asc("key")).limit(SKEW_TOPN)
    w_rank = Window.orderBy(F.desc("n"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn("share", F.round(F.col("n") / F.col("t"), ROUND))
        .withColumn(
            "cum_share",
            F.round(F.sum("n").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)) / F.col("t"), ROUND),
        )
        .select("rank", "key", "n", "share", "cum_share")
    )
