"""Graph analytics over materialized KG output — the consumer-side
operators a KG is built FOR: degree statistics and fixed-iteration
PageRank (the /root/reference/experiments/uaz_documents_comparison.py:54-66
concept-ranking consumer, generalized).

Two registered graph inputs:

- the concept co-occurrence graph (kg_doc_pairs output re-used as input) —
  tiny, and its oracle UNROLLS the iterations as a CTE chain, so the
  driver hash-gates the whole computation (``concept_pagerank``);
- the REAL pipeline triple graph: ``entity_pagerank`` runs the full
  mentions -> links -> components -> materialize pipeline over the
  deterministic synthetic corpus, derives the entity edge set from the
  emitted (subj, pred, obj) triples, and ranks entities with the SCALE
  path (lineage truncated per round via localCheckpoint — the CC stage's
  pattern).  Its oracle recomputes the same ranks in DuckDB from the
  committed twin triple fixture, so the iterative job is still hard
  value-hash-gated.

Scale notes: ``pagerank`` takes any (src, dst) edge DataFrame;
contributions are one groupBy per iteration (AQE-skew-safe); the per-node
out-degree factor is computed once and joined into the edge list before
iterating, so each round touches only (src, dst, w) + the rank vector.
With ``checkpoint=True`` every round's rank vector is localCheckpointed,
truncating lineage so iteration count never grows the plan — required on
a million-entity graph, measured at 1M-file scale in bench/scaling.py.
Intermediates are cached through cachectl so a long-lived session can
release them after the plan is forced.  No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cachectl import tracked_cache


def _pinned_checkpoint(df: "DataFrame") -> "DataFrame":
    """``localCheckpoint`` that actually PRESERVES the hash layout.

    Under AQE, ``Dataset.localCheckpoint`` captures the
    ``AdaptiveSparkPlan``'s outputPartitioning — which is *unknown*
    before the final plan is installed — so the resulting LogicalRDD
    forgets it is hash-partitioned and every downstream agg/co-located
    join re-exchanges the full table (measured round 4: a groupBy over
    a ``repartition("src").localCheckpoint()`` table re-planned an
    E-row ``Exchange hashpartitioning``; the identical checkpoint built
    with AQE off planned ZERO exchanges, pinned by
    tests/test_graph.py).  Building just the checkpoint with AQE
    momentarily disabled keeps the iterative kernels' layout-reuse
    contract; AQE stays on for everything else.  The disabled window
    also stops AQE from coalescing the checkpoint's partitions, which
    would otherwise change the partition count between rounds and break
    round-to-round co-partitioning."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
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


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = DAMPING,
    checkpoint: bool = False,
    partitioned: bool = False,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed (src, dst) edge DataFrame.

    Sink nodes (dst-only) are kept in the node set and receive inbound
    mass, but their own mass is NOT redistributed (the standard
    no-dangling-redistribution simplification) — so total rank is only
    conserved on out-degree-complete graphs.  Both registered callers
    symmetrize their edges, which makes every node a source.  An empty
    edge set returns an empty rank table rather than dividing by zero.

    ``checkpoint=True`` localCheckpoints the rank vector every
    ``checkpoint_every`` rounds — truncating lineage so plan size stays
    O(checkpoint_every) in iteration count (mandatory at entity-graph
    scale; left False for the toy concept query whose oracle unrolls the
    identical CTE chain).

    ``partitioned=True`` selects the co-partitioned shuffle plan instead
    of broadcasting the rank vector: ``w`` and ``nodes`` are hash-
    partitioned ONCE on their per-round join keys and cached, the
    per-round joins are hinted shuffle-hash, and only the V-row
    rank/contribution tables move per round — through parallel
    exchanges, not a driver-serialized broadcast build.  At 1M+ nodes
    the per-round broadcast (collect V rows, build ONE hash table on the
    driver, re-ship it) is a serial Amdahl term; exchanges parallelize
    with cores.  Same arithmetic shape, same results — choose by |V|:
    broadcast below ~10^5 nodes, partitioned above (measured in
    bench/graph_scaling.py).
    """
    sym = tracked_cache(edges)  # feeds deg AND the join leg
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
    w = sym.join(deg, "src").select("src", "dst", (F.lit(1.0) / F.col("d")).alias("w"))
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
    )
    if partitioned:
        # one-time layout: both loop-invariant tables land hash-partitioned
        # on their per-round join keys, so every round's joins reuse the
        # cached partitioning and exchange only the rank-vector side
        w = w.repartition("src")
        nodes = nodes.repartition("node")
    w = tracked_cache(w)
    nodes = tracked_cache(nodes)
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("r"))

    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("r"))
    # Per-round plan (audited): the rank vector broadcasts into the edge
    # join (the edge table is NEVER reshuffled), and the contribution
    # groupBy partial-aggregates map-side, so the only shuffle per round
    # moves O(V x partitions) rows, not O(E).  A repartition("src")+cache
    # of w was measured and REJECTED: with ranks broadcast it only adds
    # exchanges.  (If V outgrows the broadcast threshold, pre-partitioning
    # w by src becomes the right knob — AQE will flip the join to SMJ.)
    for i in range(iters):
        r = ranks.hint("shuffle_hash") if partitioned else ranks
        contrib = (
            w.join(r, w["src"] == r["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("w") * F.col("r")).alias("contrib"))
        )
        if partitioned:
            contrib = contrib.hint("shuffle_hash")
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("r"),
        )
        if checkpoint and (i + 1) % checkpoint_every == 0:
            # partitioned mode: the rank vector leaves the round hash(node)-
            # partitioned (the nodes-side join layout), which is exactly the
            # next round's join distribution — pin it through the checkpoint
            # (a plain localCheckpoint under AQE forgets it and re-exchanges
            # V rows every round; see _pinned_checkpoint)
            ranks = _pinned_checkpoint(ranks) if partitioned else ranks.localCheckpoint()
    return ranks


def _concept_edges(spark, sf_dir) -> DataFrame:
    pairs = _doc_pairs(_doc_mentions(spark, sf_dir))
    return pairs.select(F.col("c1").alias("src"), F.col("c2").alias("dst")).unionAll(
        pairs.select(F.col("c2").alias("src"), F.col("c1").alias("dst"))
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
    return _concept_edges(spark, sf_dir).groupBy(F.col("src").alias("concept")).agg(
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
    ranks = pagerank(_concept_edges(spark, sf_dir))
    return ranks.select(F.col("node").alias("concept"), F.round("r", ROUND).alias("rank"))


# -------------------------------------------------- pipeline entity graph
# PageRank over the REAL KG output: the full pipeline runs on the synthetic
# corpus, the edge set is the emitted triple graph itself (subj -> obj of
# every non-identity triple, symmetrized, deduped), and ranking uses the
# scale path (per-round localCheckpoint).  The oracle re-derives the same
# edges from the committed twin triple fixture (fixtures/twin_triples.parquet,
# drift-guarded) and unrolls the identical PR chain in SQL — so the
# iterative job over pipeline output is hard value-hash-gated end-to-end.

_SQL_ENTITY_EDGES_TMPL = """
tri as (select subj, obj from read_parquet('{path}') where subj <> obj),
und as (select distinct subj as src, obj as dst from tri
        union
        select distinct obj as src, subj as dst from tri),
sym as (select src, dst from und),
nodes as (select distinct src as node from sym),
nn as (select count(*)::DOUBLE as n from nodes),
deg as (select src, count(*)::DOUBLE as d from sym group by src),
w as (select sym.src, sym.dst, 1.0 / deg.d as w from sym join deg using (src))
"""


def triple_edges(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj) triples -> symmetrized distinct (src, dst) edges.
    Self-loops dropped (an entity citing its own definition carries no
    ranking signal); union (not unionAll) + distinct dedups parallel
    predicates between the same endpoints."""
    tri = triples.where(F.col("subj") != F.col("obj")).select("subj", "obj")
    return (
        tri.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .unionByName(tri.select(F.col("obj").alias("src"), F.col("subj").alias("dst")))
        .distinct()
    )


def _entity_pr_oracle() -> str:
    from ..oracle.fixtures import fixture_path

    return f"""
    with {_SQL_ENTITY_EDGES_TMPL.format(path=fixture_path('triples'))},
    {_SQL_PR_CHAIN}
    select node as entity, round(r, {ROUND}) as rank
    from r{PR_ITERS}
    """


@query("entity_pagerank", oracle=_entity_pr_oracle())
def entity_pagerank(spark, sf_dir):
    """PageRank over the pipeline's emitted triple graph (consumer-side
    entity ranking, /root/reference/experiments/uaz_documents_comparison.py:
    54-66 generalized to the code KG).  Runs the REAL pipeline — packed
    mention extraction, LSH-blocked linking, distributed CC, materialize —
    then ranks with the scale path (localCheckpoint per round)."""
    from ..stages import canonical, embed, link, materialize, mentions
    from .kgdocs import _synth

    men_packed = mentions.extract_mentions_packed(_synth(spark))
    men = mentions.explode_mentions(men_packed)
    links = link.candidate_links(embed.embed_mentions(men))
    ents = canonical.connected_components(links)
    triples = materialize.triples_from_packed(men_packed, ents)
    ranks = pagerank(triple_edges(triples), checkpoint=True)
    return ranks.select(F.col("node").alias("entity"), F.round("r", ROUND).alias("rank"))


# ------------------------------------------------------- triangle counting
# Per-node triangle counts over a REAL-SIZE graph: parts co-occurring in
# the same order (the co-purchase graph, ~10^5 edges at sf0.01).  The
# Spark side uses the degree-ordered orientation (each canonical edge is
# directed from its lower-(degree, id) endpoint), so every triangle has
# exactly ONE vertex with two out-edges and is closed exactly once — the
# standard arboricity bound that keeps wedge generation O(m^1.5) instead
# of O(sum deg^2) on skewed graphs.  The oracle enumerates x<y<z triangles
# directly, which is orientation-free — so the driver hash-gates the
# orientation trick against an independent derivation.


@query(
    "triangle_count",
    oracle="""
    with e as (
      select distinct l1.l_partkey::BIGINT as a, l2.l_partkey::BIGINT as b
      from lineitem l1 join lineitem l2
        on l1.l_orderkey = l2.l_orderkey and l1.l_partkey < l2.l_partkey
    ),
    tri as (
      select e1.a as x, e1.b as y, e2.b as z
      from e e1
      join e e2 on e2.a = e1.b
      join e e3 on e3.a = e1.a and e3.b = e2.b
    ),
    corners as (
      select x as node from tri
      union all select y from tri
      union all select z from tri
    )
    select node, count(*)::BIGINT as n_triangles
    from corners group by node
    """,
)
def triangle_count(spark, sf_dir):
    """Triangles per node of the co-ordered-parts graph.  The per-order
    pair explosion is bounded (TPC-H orders have <= 7 lines); the wedge
    join runs over ORIENTED out-edges so the heaviest hub contributes
    out-degree^2 ~ O(m) wedges, not degree^2."""
    from .registry import table as _table

    li = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").cast("long").alias("a"),
            F.col("y.l_partkey").cast("long").alias("b"),
        )
        .distinct()
    )
    return count_triangles(e)


def count_triangles(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over canonical (a < b) undirected edges.

    Edge-iterator with adjacency-array intersection: build each node's
    neighbor array once, join both endpoints' arrays onto every edge
    (broadcast — the adjacency table is nodes x avg-degree longs, ~20 MB
    at bench scale), and count common neighbors per edge with ONE
    ``array_intersect``.  A triangle at node v is seen by exactly its two
    incident edges, so n_triangles(v) = sum of per-edge counts over v's
    edges / 2.

    Measured 3x faster warm (3.2 s vs 9.4 s at sf0.1, 1.2M edges) than
    the degree-oriented wedge join this replaces: the wedge stream
    materialized 41M rows through a shuffle before probing; the
    intersection does the same O(sum_edges d(x)+d(y)) element work inside
    one codegen stage and never materializes a wedge.  Scale valves: past
    broadcast size drop the hint (shuffle join on the edge key — rows
    moved stay O(m), arrays ride along); a web-scale hub whose array
    outgrows a task is the one case the oriented-wedge plan handles
    better — split by a degree threshold and route hubs there."""
    e = tracked_cache(edges)
    nbrs = (
        e.select(F.col("a").alias("v"), F.col("b").alias("n"))
        .unionByName(e.select(F.col("b").alias("v"), F.col("a").alias("n")))
        .groupBy("v")
        .agg(F.collect_list("n").alias("nb"))
    )
    na = nbrs.select(F.col("v").alias("a"), F.col("nb").alias("na"))
    nb = nbrs.select(F.col("v").alias("b"), F.col("nb").alias("nbb"))
    t = (
        e.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select("a", "b", F.size(F.array_intersect("na", "nbb")).alias("t"))
    )
    corners = t.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("node"), F.col("t")),
                F.struct(F.col("b").alias("node"), F.col("t")),
            )
        ).alias("s")
    ).select("s.node", "s.t")
    return (
        corners.groupBy("node")
        .agg((F.sum("t") / 2).cast("long").alias("n_triangles"))
        .where(F.col("n_triangles") > 0)
    )


# -------------------------------------------------- k-core / communities
# Two more consumer-side analytics over the concept co-occurrence graph,
# both FIXED-ROUND so the oracle can unroll the identical computation as
# a CTE chain (the concept_pagerank gating pattern):
#
# - ``kcore``: KCORE_ROUNDS of degree-K peeling (the standard iterative
#   k-core reduction; at fixpoint extra rounds are no-ops, so the fixed
#   unrolling equals the true k-core whenever the peel converges within
#   the budget — both engines compute the identical fixed-round set
#   either way).  Per round: one map-side-combined degree agg + two
#   semi-joins against the (shrinking, broadcastable) survivor set; with
#   many rounds at entity scale, localCheckpoint per round (the pagerank
#   pattern) caps lineage.
# - ``label_propagation``: LP_ITERS synchronous rounds of
#   most-frequent-neighbor-label with deterministic min-label
#   tie-breaking — the classic community detector, made hash-gateable by
#   the deterministic tie rule.  Per round: one edge-label equi-join +
#   one (node, label) count agg + one per-node argmax window.

KCORE_K = 2
KCORE_ROUNDS = 4
LP_ITERS = 3


def _sql_kcore_chain() -> str:
    parts = ["g0 as (select src, dst from sym)"]
    for i in range(KCORE_ROUNDS):
        parts.append(
            f"""v{i+1} as (select src from g{i} group by src
                 having count(*) >= {KCORE_K})"""
        )
        parts.append(
            f"""g{i+1} as (select g.src, g.dst from g{i} g
                 join v{i+1} a on g.src = a.src
                 join v{i+1} b on g.dst = b.src)"""
        )
    return ",\n".join(parts)


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    partitioned: bool = False,
    checkpoint_every: int = 1,
    anti: bool = False,
    cumulative: bool = False,
    delta: bool = False,
    adjacency: bool = False,
    layout: str = "hash",
    layout_partitions: int | None = None,
) -> DataFrame:
    """``rounds`` peels of degree-<k vertices over a SYMMETRIZED (src, dst)
    edge DataFrame; returns the surviving (node, core_degree) table.

    ``partitioned=False`` broadcasts the survivor set into both per-round
    semi-joins — right when survivors fit a broadcast (the toy concept
    graph).  At entity scale the survivor set IS the node set (~1M rows):
    building + shipping two ~40 MB broadcasts per round from the driver
    is a serial Amdahl term — measured 0.41 paired scaling efficiency at
    43.7M edges (bench/graph_scaling.py, round 4).  ``partitioned=True``
    hints both semi-joins shuffle-hash instead: the survivor table moves
    through parallel exchanges and the edge side, already hash-shuffled
    on the same key by the degree agg, co-locates.  The initial edge set
    is laid out hash(src) so round 1's degree agg and src semi-join
    reuse it without an E-row exchange (the checkpoint is built via
    ``_pinned_checkpoint`` — a plain localCheckpoint under AQE FORGETS
    the hash layout and re-exchanges, measured round 4).

    Lineage control: ``edges`` is consumed TWICE per round (degree agg +
    semi-join) and feeds every later round, so without truncation round
    r re-derives the whole upstream plan ~2^r times — measured
    101 s -> ~2 s at sf0.1 on the concept graph (whose edge derivation
    is the doc-pair self-join), and a lineage bomb at entity scale
    regardless.  Each eager localCheckpoint is also a per-round DRIVER
    action (a serial barrier the paired-scaling runs can see), so
    ``checkpoint_every=j`` truncates only every j-th round and caches
    the rounds between (a lazy cache dedups the double consumption
    without a driver round-trip; plan size stays O(2^j), fine for the
    small j a fixed-round peel uses).

    ``anti=True`` is the zero-exchange formulation (round-4, after the
    43.7M-edge paired run measured kcore_part at 0.41-0.56 efficiency):
    instead of semi-joining the ~|V|-row SURVIVOR set into both edge
    columns (the dst side re-exchanges every surviving edge by ``dst``,
    and the next round's degree agg exchanges them straight back to
    hash(src) — two E-row shuffles per round), broadcast the per-round
    REMOVED set (``0 < deg < k`` among current srcs) into two
    anti-joins.  On a symmetrized edge table every current node appears
    as a src, so removed = current \\ keep and the anti-join is
    set-identical to the keep semi-join (pinned by test).  Removed is
    large only in round 1 of a power-law graph (the degree-1/2 fringe);
    afterwards it is thousands of rows, so the per-round broadcast cost
    that sank the keep-broadcast plan (two ~|V|-row builds EVERY round)
    decays geometrically.  Both anti-joins are map-side, so the edge
    table keeps its initial hash(src) layout for the whole peel: the
    degree agg never exchanges, and per-round cost is one parallel
    O(E/p) pass + one small broadcast.

    Web-scale note: round 1's removed set is the only one that can
    outgrow a broadcast (billions of nodes -> a degree-1/2 fringe of
    hundreds of millions).  There, run round 1 with the
    ``partitioned=True`` semi-join shape (pay the one dst exchange) and
    switch to ``anti`` from round 2 on — the fringe shrinks
    geometrically; at this harness's 1M-node graph the round-1 removed
    set broadcasts fine, so the pure-anti path is what is measured.

    ``cumulative=True`` (round-4, after the paired run measured even the
    anti peel at 0.30-0.71 efficiency) removes the remaining wall: the
    anti peel still REBUILDS the ~E-row edge table every
    ``checkpoint_every`` rounds (a full-table materialization whose
    write bandwidth both parallelism levels contend for, plus a
    per-round driver barrier).  Cumulative mode never rebuilds the edge
    table at all.  The base table is laid out hash(src) and
    checkpointed ONCE; each round anti-joins the base against the
    broadcast UNION of every prior round's removed set, so the physical
    plan has CONSTANT depth (base scan + two map-side broadcast
    anti-joins + zero-exchange degree agg) no matter the round index.
    The only per-round materialization is the new removed set itself —
    thousands of rows after round 1 — and the peel exits early at the
    fixpoint (no new removals), which the fixed-round oracle chain is
    insensitive to by construction.  Per-round cost: one parallel
    O(E/p) in-memory scan; nothing E-sized is ever written.

    ``layout`` picks the base-table layout for cumulative mode, because
    a power-law entity graph makes the obvious choice WRONG:
    ``repartition("src")`` puts every edge of a hub entity in ONE
    partition (the benched 1M-node graph's top hub holds 1.0M of 43.6M
    edges, and the max hash(src)%%32 bucket is 2.5x the mean), so the
    straggler partition floors every stage wall at high parallelism —
    measured 0.37-0.48 paired efficiency on the zero-exchange degree
    agg itself.  ``layout="hash"`` keeps the zero-exchange plan and
    dilutes the skew across ``layout_partitions`` (a hub's edges are
    irreducibly co-located; more partitions only shrink the non-hub
    remainder).  ``layout="even"`` round-robins the base so every scan
    is perfectly balanced and lets the degree agg run as map-side
    partial agg + a balanced exchange of partials (~sum(min(deg, P))
    rows, half of E here) — the textbook skew answer; at web scale the
    balanced exchange beats the straggler whenever a hub outweighs
    E/cores.

    ``delta=True`` (round 5 — the formulation that finally removed the
    measured serial term) changes WHAT is maintained, not just how it
    is laid out: a V-row DEGREE table, decremented per round, instead
    of an E-row edge table re-aggregated per round.  The per-stage
    decomposition of the cumulative peel (BENCH_SCALING_GRAPH_K16)
    showed each E-row materialization leg carries ~0.6-1.6 s of
    driver/action latency while its parallel portion scales nearly
    perfectly — so the peel's efficiency is set by the NUMBER of
    materialized legs.  Delta mode has three kinds of leg:

    - one-time: cache the base edge table and aggregate initial
      degrees deg(v) once;
    - per cascade round: ``dec = base ⋈ broadcast(removed_r on dst)
      → groupBy(src).count`` — one parallel E-scan whose OUTPUT is only
      the edges incident to the round's removed set, then a V-row
      update ``deg' = (deg ∖ removed_r) left-join dec`` and the next
      removed set off the V-row table.  Everything is lazily cached;
      the ONLY driver action per round is one count() (the fixpoint
      probe), which materializes the whole round's chain as one job.
    - after the cascade dies (removed_r = ∅): NO E-scan at all —
      the fixpoint probe reads the V-row degree table only, and the
      survivors' core degrees are already sitting in it (the E-row
      final aggregation the other formulations pay, measured eff 0.56,
      does not exist here).

    Correctness: deg_r(v) for alive v equals v's degree in the round-r
    induced subgraph by induction — each base edge (v, u) is
    decremented from deg(v) exactly once, in the round u is removed
    (removed sets are disjoint), and edges between two same-round
    removed nodes decrement only already-dead rows, which the
    anti-join discards.  A surviving node whose degree reached 0
    (every neighbor peeled) is filtered at the end, matching the
    groupBy-over-edges semantics of the other formulations (pinned
    cross-formulation by tests/test_graph.py).  At web scale the
    removed set can outgrow a broadcast only in round 1 (the
    degree-fringe argument above): run round 1's dec as a shuffle join
    there, then broadcast from round 2 on — at this harness's graph
    every round broadcasts fine.

    ``delta=True, adjacency=True`` (round 5 — the formulation that
    cleared the gate) additionally removes the per-round E-ROW SCAN.
    The stage decomposition of plain delta mode
    (BENCH_SCALING_GRAPH_DELTA kcore_delta_stages) localized the whole
    scaling deficit to the dec leg: probing 44M cached edge rows
    against a broadcast hash of the removed set costs ~4 s at BOTH
    parallelism levels (a warm full cached scan alone is 0.23 s — the
    constant is the random hash-probe's memory-latency wall, which a
    single box cannot parallelize past ~2 threads), and it recurs
    EVERY cascade round even when the round's output is 3.6k rows.
    Adjacency mode pays one extra one-time build — group the packed
    edges by dst into V-row neighbor lists,
    ``adj(d1,d2) -> [struct(h1,h2)...]`` — and each round's dec becomes
    a V-ROW probe (1.2M rows, not 44M) + explode of ONLY the removed
    nodes' lists: measured 0.74 s (round 1, 312k removals) and 0.46 s
    (3.5k removals) at local[8] vs the E-scan's flat ~4 s.  The build
    itself is an ordinary partial-agg shuffle and scales at 0.91
    paired; ``size(nb)`` doubles as the initial degree (the edge table
    is symmetrized, so indegree = outdegree), which deletes the
    separate string-keyed degree aggregation the plain-delta mode
    paid.  The group-by carries ``first(dst)`` so the V-row table owns
    the node string from birth; no E-row pass ever touches strings
    again.  collect_list aggregation needs
    ``spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold``
    above the per-task group count (session.py sets 8M engine-wide;
    the Spark default of 128 silently degrades the build to sort-based
    — measured 21 s vs 10.7 s at local[8]).  Multiplicity, zero-degree
    filtering and the fixed-round fixpoint semantics are identical to
    plain delta (pinned cross-formulation by tests/test_graph.py)."""
    if delta and adjacency:
        adj = tracked_cache(
            edges.groupBy(
                F.xxhash64("dst").alias("h1"),
                F.xxhash64(F.lit("k2"), F.col("dst")).alias("h2"),
            ).agg(
                F.collect_list(
                    F.struct(
                        F.xxhash64("src").alias("h1"),
                        F.xxhash64(F.lit("k2"), F.col("src")).alias("h2"),
                    )
                ).alias("nb"),
                F.first("dst").alias("node"),
            )
        )
        deg = tracked_cache(
            adj.select("node", "h1", "h2", F.size("nb").alias("c"))
        )
        for _ in range(rounds):
            removed = tracked_cache(
                deg.where(F.col("c") < k).select("h1", "h2")
            )
            if removed.count() == 0:  # the only driver action per round
                break
            dec = (
                adj.join(F.broadcast(removed), ["h1", "h2"])
                .select(F.explode("nb").alias("s"))
                .groupBy(F.col("s.h1").alias("h1"), F.col("s.h2").alias("h2"))
                .agg(F.count(F.lit(1)).alias("d"))
            )
            deg = tracked_cache(
                deg.join(F.broadcast(removed), ["h1", "h2"], "left_anti")
                .join(F.broadcast(dec), ["h1", "h2"], "left")
                .select(
                    "node",
                    "h1",
                    "h2",
                    (F.col("c") - F.coalesce(F.col("d"), F.lit(0))).alias("c"),
                )
            )
        return deg.where(F.col("c") > 0).select(
            "node", F.col("c").alias("core_degree")
        )
    if delta:
        # Fixed-width discipline (the call_graph packed-key lesson,
        # measured eff 0.49 -> 0.88 there): node ids are STRINGS, and a
        # string-keyed E-row pass per round is the shared-JVM alloc wall.
        # Hash both endpoints to a two-seed 128-bit key ONCE (one 64-bit
        # key birthday-collides ~1e4 times at the 1e12-file target —
        # codegraph._h2's bound; two seeds ~1.5e-15, treated as exact),
        # cache the edge table as four longs, and key every round's
        # join/agg on the longs.  The node STRING is touched by exactly
        # one E-row aggregation (the initial degree count, which carries
        # it into the V-row table) and never again — the output re-reads
        # it from the V-row table for free.
        h = [
            F.xxhash64("src").alias("h1"),
            F.xxhash64(F.lit("k2"), F.col("src")).alias("h2"),
            F.xxhash64("dst").alias("d1"),
            F.xxhash64(F.lit("k2"), F.col("dst")).alias("d2"),
        ]
        base = edges.select(*h)
        if layout.startswith("salted"):
            s = int(layout.split(":")[1]) if ":" in layout else 8
            n_p = layout_partitions or 32
            base = base.repartition(n_p, "h1", F.pmod(F.col("d1"), F.lit(s)))
        base = tracked_cache(base)
        deg = tracked_cache(
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                "src",
                F.xxhash64("src").alias("h1"),
                F.xxhash64(F.lit("k2"), F.col("src")).alias("h2"),
                "c",
            )
        )
        for _ in range(rounds):
            # alias() detaches exprIds so the deg-derived filter can
            # join back against deg/base without self-join ambiguity
            removed = tracked_cache(
                deg.where(F.col("c") < k).select(
                    F.col("h1").alias("h1"), F.col("h2").alias("h2")
                )
            )
            if removed.count() == 0:  # the only driver action per round
                break
            rm_dst = removed.select(F.col("h1").alias("d1"), F.col("h2").alias("d2"))
            dec = (
                base.join(F.broadcast(rm_dst), ["d1", "d2"])
                .groupBy("h1", "h2")
                .agg(F.count(F.lit(1)).alias("d"))
            )
            deg = tracked_cache(
                deg.join(F.broadcast(removed), ["h1", "h2"], "left_anti")
                .join(dec, ["h1", "h2"], "left")
                .select(
                    "src",
                    "h1",
                    "h2",
                    (F.col("c") - F.coalesce(F.col("d"), F.lit(0))).alias("c"),
                )
            )
        return deg.where(F.col("c") > 0).select(
            F.col("src").alias("node"), F.col("c").alias("core_degree")
        )
    if cumulative:
        if layout == "even":
            n_even = layout_partitions or edges.sparkSession.sparkContext.defaultParallelism * 4
            base = edges.repartition(n_even).localCheckpoint()
        elif layout.startswith("salted"):
            # salt the layout key with hash(dst)%s: a hub's edges spread
            # over at most s partitions (no straggler), while the degree
            # agg's partial-exchange volume stays bounded by
            # sum(min(deg, s)) rows — the middle ground between the
            # zero-exchange-but-skewed hash layout and the
            # balanced-but-E/2-exchange even layout (both measured).
            s = int(layout.split(":")[1]) if ":" in layout else 8
            n_p = layout_partitions or 32
            base = edges.repartition(
                n_p, "src", F.pmod(F.xxhash64("dst"), F.lit(s))
            ).localCheckpoint()
        elif layout_partitions:
            base = _pinned_checkpoint(edges.repartition(layout_partitions, "src"))
        else:
            base = _pinned_checkpoint(edges.repartition("src"))
        removed_parts: list[DataFrame] = []
        cur = base
        for _ in range(rounds):
            new_removed = (
                cur.groupBy("src")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") < k)
                .select("src")
            ).localCheckpoint()
            if not new_removed.head(1):
                break  # fixpoint: later rounds remove nothing
            removed_parts.append(new_removed)
            rm = removed_parts[0]
            for p in removed_parts[1:]:
                rm = rm.unionAll(p)
            cur = base.join(F.broadcast(rm), "src", "left_anti").join(
                F.broadcast(rm.select(F.col("src").alias("dst"))), "dst", "left_anti"
            )
        return cur.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("core_degree")
        )
    ckpt = _pinned_checkpoint if (partitioned or anti) else (lambda d: d.localCheckpoint())
    if partitioned or anti:
        edges = edges.repartition("src")
    edges = ckpt(edges)
    for i in range(rounds):
        if anti:
            removed = (
                edges.groupBy("src")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") < k)
                .select("src")
            )
            edges = edges.join(F.broadcast(removed), "src", "left_anti").join(
                F.broadcast(removed.select(F.col("src").alias("dst"))), "dst", "left_anti"
            )
            if (i + 1) % checkpoint_every == 0 or i == rounds - 1:
                edges = ckpt(edges)
            else:
                edges = tracked_cache(edges)
            continue
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= k)
            .select("src")
        )
        if partitioned:
            keep = keep.hint("shuffle_hash")
            edges = edges.join(keep, "src", "left_semi").join(
                keep.select(F.col("src").alias("dst")).hint("shuffle_hash"), "dst", "left_semi"
            )
        else:
            edges = edges.join(F.broadcast(keep), "src", "left_semi").join(
                F.broadcast(keep.select(F.col("src").alias("dst"))), "dst", "left_semi"
            )
        if (i + 1) % checkpoint_every == 0 or i == rounds - 1:
            edges = ckpt(edges)
        else:
            edges = tracked_cache(edges)
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


@query(
    "kcore",
    oracle=f"""
    with {_SQL_EDGES},
    {_sql_kcore_chain()}
    select src as concept, count(*)::BIGINT as core_degree
    from g{KCORE_ROUNDS} group by src
    """,
)
def kcore(spark, sf_dir):
    """{KCORE_ROUNDS}-round {KCORE_K}-core peel of the concept graph;
    emits survivors with their in-core degree."""
    out = kcore_peel(_concept_edges(spark, sf_dir), KCORE_K, KCORE_ROUNDS)
    return out.select(F.col("node").alias("concept"), "core_degree")


def _sql_lp_chain() -> str:
    parts = ["l0 as (select node, node as lab from nodes)"]
    for i in range(LP_ITERS):
        parts.append(
            f"""c{i} as (select s.dst as node, l{i}.lab, count(*) as c
                 from sym s join l{i} on l{i}.node = s.src
                 group by s.dst, l{i}.lab)"""
        )
        parts.append(
            f"""l{i+1} as (select node, min(lab) as lab from (
                   select node, lab, c, max(c) over (partition by node) as mx
                   from c{i}) t
                 where c = mx group by node)"""
        )
    return ",\n".join(parts)


def label_propagation(edges: DataFrame, iters: int, checkpoint: bool = False) -> DataFrame:
    """``iters`` synchronous label-propagation rounds over a symmetrized
    (src, dst) edge DataFrame: each node takes its neighbors' most frequent
    label, ties to the MIN label (deterministic — required for the
    cross-engine hash).  Labels start as the node ids.  Every node of a
    symmetrized pair graph has >= 1 neighbor, so coverage is total.

    The edge table is consumed every round — localCheckpoint it once so
    an expensive upstream derivation (here the doc-pair self-join) is
    not re-run per iteration; ``checkpoint=True`` additionally truncates
    the label table per round (the pagerank scale pattern)."""
    from pyspark.sql import Window

    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("lab", F.col("node"))
    )
    w = Window.partitionBy("node")
    for _ in range(iters):
        cnt = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("mx", F.max("c").over(w))
            .where(F.col("c") == F.col("mx"))
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        if checkpoint:
            # labels leave the round hash(node)-partitioned (the final
            # groupBy layout) — exactly the next round's join/window
            # distribution; pin it through the truncation
            labels = _pinned_checkpoint(labels)
    return labels


@query(
    "label_propagation",
    oracle=f"""
    with {_SQL_EDGES},
    {_sql_lp_chain()}
    select node as concept, lab as community from l{LP_ITERS}
    """,
)
def label_propagation_query(spark, sf_dir):
    """LP_ITERS-round deterministic label propagation over the concept
    graph; emits each concept's final community label."""
    labels = label_propagation(_concept_edges(spark, sf_dir), LP_ITERS)
    return labels.select(F.col("node").alias("concept"), F.col("lab").alias("community"))


# ------------------------------------------------- multi-source BFS levels
# Shortest hop distance from a seed set — the reachability primitive
# behind ontology-rooted concept depth (data/wm_ontology.py:40-71 builds
# exactly this adjacency for its matrix walk) and "within-k-hops of a
# trusted node" corpus filters.  Runs over the REAL-SIZE co-purchase
# graph (the triangle_count edge set, ~10^5 edges at sf0.01), not the
# 10-node concept toy.
#
# Scale shape: classic frontier-expansion BFS — each round is ONE
# equi-join of the (shrinking) frontier against the edge table
# partitioned by src, an anti-join against the visited set, and a
# localCheckpoint to truncate lineage (the canonical.py CC pattern).
# Work per round is |frontier| x avg-degree, never O(V^2); the visited
# set only ever grows by the new frontier, so the union chain is flat.
# The oracle re-derives the same levels with a bounded recursive CTE —
# an independent formulation (set-semantics closure vs frontier loop).
BFS_SEED_MAX = 3   # seeds: part ids <= 3 present in the graph
BFS_MAX_HOPS = 3   # bounded exploration depth


def bfs_levels_frontier(
    edges: DataFrame, seeds: DataFrame, max_hops: int, partitioned: bool = False
) -> DataFrame:
    """(node, dist) shortest hop distances from ``seeds`` over symmetrized
    ``edges(src, dst)``, exploring at most ``max_hops`` rounds.  Each
    round's new frontier is checkpointed so the plan stays flat.

    ``partitioned=True`` hints the per-hop joins shuffle-hash: on an
    expander-ish graph the frontier and the visited set reach ~|V| rows
    within two hops, and broadcasting them per hop (what AQE picks while
    they sit under the 64 MB threshold) serializes ~40 MB broadcast
    builds on the driver — measured 0.37 paired scaling efficiency at
    43.7M edges / 1M nodes (bench/graph_scaling.py, round 4).  The edge
    table is additionally hash-partitioned on ``src`` ONCE before
    caching, so every hop's expansion join reuses the cached layout and
    exchanges only the frontier (~V rows), never the E-row edge side —
    without this the shuffle-hash hint re-exchanges all E edges per hop.
    Keep the default broadcast path for genuinely small explorations
    (the sf-toy oracle query); at entity scale a production caller would
    switch per hop on the measured frontier size."""
    edges = tracked_cache(edges.repartition("src") if partitioned else edges)
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist")).localCheckpoint()
    frontier = dist.select("node")
    for hop in range(1, max_hops + 1):
        fr = frontier.hint("shuffle_hash") if partitioned else frontier
        nxt = (
            fr.join(edges, fr["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.hint("shuffle_hash") if partitioned else dist, "node", "left_anti")
            .select("node", F.lit(hop).cast("long").alias("dist"))
        )
        # partitioned mode: nxt leaves the hop hash(node)-partitioned (the
        # distinct's layout), which the next hop's expansion join and the
        # anti-join both want — pin it through the truncation
        nxt = _pinned_checkpoint(nxt) if partitioned else nxt.localCheckpoint()
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    return dist


@query(
    "bfs_levels",
    oracle=f"""
    with recursive e0 as (
      select distinct l1.l_partkey::BIGINT as a, l2.l_partkey::BIGINT as b
      from lineitem l1 join lineitem l2
        on l1.l_orderkey = l2.l_orderkey and l1.l_partkey < l2.l_partkey
    ),
    e as (select a as src, b as dst from e0 union all select b, a from e0),
    walk(node, dist) as (
      select distinct src as node, 0 as dist from e where src <= {BFS_SEED_MAX}
      union
      select e.dst, w.dist + 1 from walk w join e on e.src = w.node
      where w.dist < {BFS_MAX_HOPS}
    )
    select node, min(dist)::BIGINT as dist from walk group by node
    """,
)
def bfs_levels(spark, sf_dir):
    """Hop distance (<= BFS_MAX_HOPS) from the seed parts over the
    co-purchase graph.  Same edge derivation as triangle_count; the
    per-order pair explosion is bounded by TPC-H's <= 7 lines/order."""
    from .registry import table as _table

    li = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e0 = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").cast("long").alias("a"),
            F.col("y.l_partkey").cast("long").alias("b"),
        )
        .distinct()
    )
    edges = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .where(F.col("node") <= BFS_SEED_MAX)
        .distinct()
    )
    return bfs_levels_frontier(edges, seeds, BFS_MAX_HOPS)


# --------------------------------------------------------- TextRank keywords
# TextRank (Mihalcea & Tarau 2004): keyword extraction = PageRank over
# the token-adjacency co-occurrence graph.  Composes two library pieces
# end-to-end — the corpus tokenizer (text.py lockstep regex) and the
# generic ``pagerank`` kernel — and the oracle re-derives BOTH: bigram
# edges via aligned list unnests, ranks via the unrolled _SQL_PR_CHAIN.
#
# Scale shape: the edge build is one explode + a lead() window that
# reuses the doc-keyed partitioning (no second exchange), then a distinct
# on (t1, t2) — bounded by the corpus bigram vocabulary, NOT the token
# count.  The rank loop inherits pagerank's audited per-round plan.
TEXTRANK_TOPK = 20

_SQL_TEXTRANK_EDGES = r"""
toks as (
  select doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '') as ts
  from documents
),
bi as (
  select distinct t1, t2 from (
    select unnest(ts[1:len(ts) - 1]) as t1, unnest(ts[2:len(ts)]) as t2
    from toks where len(ts) >= 2
  ) where t1 <> t2
),
sym as (select t1 as src, t2 as dst from bi union select t2, t1 from bi),
nodes as (select distinct src as node from sym),
nn as (select count(*)::DOUBLE as n from nodes),
deg as (select src, count(*)::DOUBLE as d from sym group by src),
w as (select sym.src, sym.dst, 1.0 / deg.d as w from sym join deg using (src))
"""


@query(
    "keyword_textrank",
    oracle=f"""
    with {_SQL_TEXTRANK_EDGES},
    {_SQL_PR_CHAIN}
    select term, rank from (
      select node as term, round(r, {ROUND}) as rank,
             row_number() over (order by round(r, {ROUND}) desc, node) as rn
      from r{PR_ITERS}
    ) where rn <= {TEXTRANK_TOPK}
    """,
)
def keyword_textrank(spark, sf_dir):
    """Top-{k} corpus keywords by PageRank over the undirected
    token-adjacency graph.""".format(k=TEXTRANK_TOPK)
    from pyspark.sql import Window

    from .registry import table as _table
    from .text import _tokens_col

    docs = _table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.posexplode(_tokens_col()).alias("pos", "t1"))
    nxt = F.lead("t1").over(Window.partitionBy("doc_id").orderBy("pos"))
    bi = (
        tok.withColumn("t2", nxt)
        .where(F.col("t2").isNotNull() & (F.col("t1") != F.col("t2")))
        .select("t1", "t2")
        .distinct()
    )
    edges = (
        bi.select(F.col("t1").alias("src"), F.col("t2").alias("dst"))
        .unionByName(bi.select(F.col("t2").alias("src"), F.col("t1").alias("dst")))
        .distinct()
    )
    ranks = pagerank(edges).select(
        F.col("node").alias("term"), F.round("r", ROUND).alias("rank")
    )
    return ranks.orderBy(F.desc("rank"), F.asc("term")).limit(TEXTRANK_TOPK)
