"""SQL entry point (SURVEY.md §3.2): the reference's multi-engine REPL
dispatches one corpus to several engines (/root/reference/main.py:14-76);
the Spark-native equivalent is temp views + ``spark.sql`` — any engine in
the registry is reachable as SQL text over the same tables.

``register_views`` registers every driver testdata table as a temp view;
the queries below are routed THROUGH ``spark.sql`` (SQL text, not the
DataFrame API) to prove the surface end-to-end, and are oracle-checked like
every other query.  Spark SQL and DuckDB dialects agree on this subset, so
each query is one shared ANSI string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import ROUND, query

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp-view registration for the SQL entry point (idempotent)."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


# One shared ANSI string per query: the Spark side executes it via
# spark.sql, the driver's DuckDB oracle executes the same text.
SQL_TOP_SUPPLIERS = f"""
select s.s_name as supplier, n.n_name as nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), {ROUND}) as revenue
from lineitem l
join supplier s on l.l_suppkey = s.s_suppkey
join nation n on s.s_nationkey = n.n_nationkey
group by s.s_name, n.n_name
order by revenue desc, supplier
limit 10
"""

SQL_ORDER_PRIORITY = """
select o_orderpriority as priority, count(*) as n_orders
from orders
where o_orderdate >= timestamp '1995-01-01 00:00:00'
  and o_orderdate < timestamp '1995-04-01 00:00:00'
group by o_orderpriority
"""


@query("sql_top_suppliers", oracle=SQL_TOP_SUPPLIERS)
def sql_top_suppliers(spark, sf_dir):
    """Revenue-ranked suppliers, executed as SQL TEXT via spark.sql over
    registered temp views — the §3.2 SQL surface.  Catalyst plans the
    text identically to the DataFrame API (broadcast dims, partial aggs,
    TakeOrderedAndProject for the order+limit)."""
    return sql(spark, sf_dir, SQL_TOP_SUPPLIERS)


@query("sql_order_priority", oracle=SQL_ORDER_PRIORITY)
def sql_order_priority(spark, sf_dir):
    """TPC-H Q4-shaped priority counts through the SQL surface; the date
    predicates reach the parquet scan as pushed filters."""
    return sql(spark, sf_dir, SQL_ORDER_PRIORITY)


SQL_REVENUE_ROLLUP = f"""
select coalesce(t.nation, 'ALL') as nation,
       coalesce(t.oyear, -1) as oyear,
       cast(grouping(t.nation) as BIGINT) as is_nation_total,
       cast(grouping(t.oyear) as BIGINT) as is_year_total,
       round(sum(t.rev), {ROUND}) as revenue,
       count(*) as n_items
from (
  select n.n_name as nation,
         cast(year(o.o_orderdate) as BIGINT) as oyear,
         l.l_extendedprice * (1 - l.l_discount) as rev
  from lineitem l
  join orders o on l.l_orderkey = o.o_orderkey
  join customer c on o.o_custkey = c.c_custkey
  join nation n on c.c_nationkey = n.n_nationkey
) t
group by rollup (t.nation, t.oyear)
"""


@query("sql_revenue_rollup", oracle=SQL_REVENUE_ROLLUP)
def sql_revenue_rollup(spark, sf_dir):
    """Hierarchical subtotals via GROUP BY ROLLUP (nation, year): detail
    rows, per-nation subtotals, and the grand total in ONE pass — Spark
    plans rollup as a single Expand + hash aggregate, so the three levels
    cost one shuffle, not three scans.  grouping() flags disambiguate
    subtotal rows from real values; one shared ANSI string serves both
    engines."""
    return sql(spark, sf_dir, SQL_REVENUE_ROLLUP)
