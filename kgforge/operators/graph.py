"""Graph analytics over the materialized concept graph — the consumer-side
operators a KG is built FOR: degree statistics and a fixed-iteration
PageRank over the symmetrized concept co-occurrence edges (the kg_doc_pairs
output re-used as input, the way a downstream ranking job would).

PageRank is the canonical iterative DataFrame algorithm: contributions =
rank/out-degree flow along edges, one shuffle per iteration, lineage
truncated per round at scale (the CC stage's localCheckpoint pattern).
Iterations are FIXED (3) and unrolled identically in the DuckDB oracle, so
the driver hash-gates the whole computation — the same determinism trick
as the rounded-score total orders.

Scale notes: contributions are one groupBy per iteration (AQE-skew-safe);
the per-node degree factor is computed once and joined into the edge list
before iterating, so each round touches only (src, dst, w) + the rank
vector.  No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .kgdocs import SQL_DOC_PAIRS, _doc_mentions, _doc_pairs
from .registry import ROUND, query

DAMPING = 0.85
PR_ITERS = 3

_SQL_EDGES = f"""
sym as (
  select c1 as src, c2 as dst from ({SQL_DOC_PAIRS})
  union all
  select c2 as src, c1 as dst from ({SQL_DOC_PAIRS})
),
nodes as (select distinct src as node from sym),
nn as (select count(*)::DOUBLE as n from nodes),
deg as (select src, count(*)::DOUBLE as d from sym group by src),
w as (select sym.src, sym.dst, 1.0 / deg.d as w from sym join deg using (src))
"""


def _sql_pr_iter(prev: str, cur: str) -> str:
    return f"""
    {cur} as (
      select nodes.node,
             (1 - {DAMPING}) / (select n from nn)
             + {DAMPING} * coalesce(s.contrib, 0) as r
      from nodes left join (
        select w.dst as node, sum(w.w * {prev}.r) as contrib
        from w join {prev} on {prev}.node = w.src
        group by w.dst
      ) s using (node)
    )"""


_SQL_PR_CHAIN = ",".join(
    [" r0 as (select node, 1.0 / (select n from nn) as r from nodes)"]
    + [_sql_pr_iter(f"r{i}", f"r{i+1}") for i in range(PR_ITERS)]
)


@query(
    "concept_degrees",
    oracle=f"""
    with {_SQL_EDGES}
    select src as concept, d::BIGINT as degree from deg
    """,
)
def concept_degrees(spark, sf_dir):
    """Degree per concept node of the symmetrized co-occurrence graph."""
    pairs = _doc_pairs(_doc_mentions(spark, sf_dir))
    sym = pairs.select(F.col("c1").alias("src"), F.col("c2").alias("dst")).unionAll(
        pairs.select(F.col("c2").alias("src"), F.col("c1").alias("dst"))
    )
    return sym.groupBy(F.col("src").alias("concept")).agg(
        F.count(F.lit(1)).alias("degree")
    )


@query(
    "concept_pagerank",
    oracle=f"""
    with {_SQL_EDGES},
    {_SQL_PR_CHAIN}
    select node as concept, round(r, {ROUND}) as rank
    from r{PR_ITERS}
    """,
)
def concept_pagerank(spark, sf_dir):
    """PR_ITERS-iteration PageRank (damping 0.85) over the concept graph,
    initialized uniform; iterations unrolled identically in the oracle's
    CTE chain; rounded for the cross-engine hash."""
    pairs = _doc_pairs(_doc_mentions(spark, sf_dir))
    sym = pairs.select(F.col("c1").alias("src"), F.col("c2").alias("dst")).unionAll(
        pairs.select(F.col("c2").alias("src"), F.col("c1").alias("dst"))
    ).cache()  # sym feeds deg AND the join leg — uncached it computes twice
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
    w = sym.join(deg, "src").select("src", "dst", (F.lit(1.0) / F.col("d")).alias("w")).cache()
    nodes = sym.select(F.col("src").alias("node")).distinct().cache()
    n = nodes.count()

    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            w.join(ranks, w["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("w") * F.col("r")).alias("contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1 - DAMPING) / n)
                + F.lit(DAMPING) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("r"),
        )
        # at scale: ranks = ranks.localCheckpoint() per round (CC pattern);
        # at concept-vocabulary size the unrolled lineage is fine and keeps
        # the plan equal to the oracle's CTE chain
    return ranks.select(F.col("node").alias("concept"), F.round("r", ROUND).alias("rank"))