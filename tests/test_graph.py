"""Contract tests for the public pagerank(edges) API beyond the oracle
queries: empty input and genuinely directed graphs (sink nodes)."""

from __future__ import annotations

import pytest

from kgforge.operators.graph import pagerank


def test_pagerank_empty_edges_returns_empty(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges)
    assert out.columns == ["node", "r"]
    assert out.count() == 0


def test_pagerank_reports_sink_nodes(spark):
    # 1 -> 2: node 2 has no out-edge but must appear in the output with the
    # inbound mass it received (no-dangling-redistribution semantics).
    edges = spark.createDataFrame([("1", "2")], "src string, dst string")
    ranks = {r["node"]: r["r"] for r in pagerank(edges, iters=1).collect()}
    assert set(ranks) == {"1", "2"}
    # n=2, uniform init 0.5; damping d: r(1) = (1-d)/2, r(2) = (1-d)/2 + d*0.5
    d = 0.85
    assert ranks["1"] == pytest.approx((1 - d) / 2)
    assert ranks["2"] == pytest.approx((1 - d) / 2 + d * 0.5)


def _sym(spark, und_pairs):
    rows = [(a, b) for a, b in und_pairs] + [(b, a) for a, b in und_pairs]
    return spark.createDataFrame(rows, "src string, dst string")


def test_kcore_peel_matches_bruteforce(spark):
    """Fixed-round peel vs a Python reference peel on a graph with a
    planted 3-core (K4), a pendant chain, and a triangle hanging off it."""
    from kgforge.operators.graph import kcore_peel

    und = [
        # K4 on a,b,c,d (3-core)
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        # bridge d - e - f: e has degree 2 (d, f) so it survives k=2
        ("d", "e"), ("e", "f"),
        # triangle f - g - h - f (2-core that survives)
        ("f", "g"), ("g", "h"), ("h", "f"),
        # true pendant p off d: degree 1, peeled in round 1; its removal
        # must NOT cascade (d keeps degree >= 2)
        ("d", "p"),
    ]
    k, rounds = 2, 6

    # brute-force peel
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for _ in range(rounds):
        dead = {n for n, ns in adj.items() if len(ns) < k}
        if not dead:
            break
        for n in dead:
            adj.pop(n)
        for ns in adj.values():
            ns.difference_update(dead)
    want = {n: len(ns) for n, ns in adj.items() if ns}

    got = {
        r["node"]: r["core_degree"]
        for r in kcore_peel(_sym(spark, und), k, rounds).collect()
    }
    assert got == want
    assert "p" not in got  # pendant peeled
    assert "e" in got  # bridge node survives (degree exactly k)
    got_delta = {
        r["node"]: r["core_degree"]
        for r in kcore_peel(_sym(spark, und), k, rounds, delta=True).collect()
    }
    assert got_delta == want
    got_adj = {
        r["node"]: r["core_degree"]
        for r in kcore_peel(_sym(spark, und), k, rounds, delta=True, adjacency=True).collect()
    }
    assert got_adj == want


def test_label_propagation_deterministic_and_total(spark):
    """Two disjoint triangles: every node must adopt its component's min
    label, and repeated runs are identical (deterministic tie-breaks)."""
    from kgforge.operators.graph import label_propagation

    und = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x")]
    edges = _sym(spark, und)
    got1 = {r["node"]: r["lab"] for r in label_propagation(edges, 3).collect()}
    got2 = {r["node"]: r["lab"] for r in label_propagation(edges, 3).collect()}
    assert got1 == got2
    assert set(got1) == {"a", "b", "c", "x", "y", "z"}
    assert {got1[n] for n in "abc"} == {"a"}
    assert {got1[n] for n in "xyz"} == {"x"}


def test_cc_incremental_merge_semantics(spark):
    """The star-forest argument, explicitly: old mapping + new edges must
    reproduce the full recompute when a new edge MERGES two old
    components, when new edges form a brand-new component, and when an
    old component is untouched."""
    from kgforge.stages.canonical import connected_components

    old = [(1, 2), (2, 3), (10, 11), (20, 21)]  # components {1,2,3} {10,11} {20,21}
    new = [(3, 10), (30, 31)]  # merge {1..3}+{10,11}; brand-new {30,31}

    def df(pairs):
        return spark.createDataFrame(pairs, "a long, b long")

    m_old = connected_components(df(old), local_threshold=0)
    star = m_old.selectExpr("entity_id as a", "canonical_id as b")
    m_inc = connected_components(star.unionByName(df(new)), local_threshold=0)

    m_full = connected_components(df(old + new), local_threshold=0)

    def mapping(m, verts):
        rows = {int(r["entity_id"]): int(r["canonical_id"]) for r in m.collect()}
        return {v: rows.get(v, v) for v in verts}

    verts = sorted({x for p in old + new for x in p})
    assert mapping(m_inc, verts) == mapping(m_full, verts)
    got = mapping(m_inc, verts)
    assert got[11] == 1  # merged across the new edge down to the global min
    assert got[30] == 30 and got[31] == 30  # new-only component
    assert got[20] == 20 and got[21] == 20  # untouched old component


def test_bfs_levels_frontier_shortest_hops(spark):
    """Path graph 1-2-3-4-5 plus a shortcut 1-4: BFS from {1} must take
    the 1-hop shortcut to 4 (not the 3-hop path) and stop at max_hops."""
    from kgforge.operators.graph import bfs_levels_frontier

    undirected = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (6, 7)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_levels_frontier(edges, seeds, max_hops=2).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}  # 6,7 unreachable


def test_bfs_levels_frontier_multi_source_min(spark):
    """Two seeds: each node gets the distance to its NEAREST seed."""
    from kgforge.operators.graph import bfs_levels_frontier

    undirected = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_levels_frontier(edges, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}


def _random_sym_graph(spark, n_nodes=400, n_edges=2500, seed=13):
    import random

    from pyspark.sql import functions as F

    rng = random.Random(seed)
    rows = [
        (f"e{rng.randrange(n_nodes)}", f"e{rng.randrange(n_nodes)}") for _ in range(n_edges)
    ]
    e = spark.createDataFrame([(a, b) for a, b in rows if a != b], "src string, dst string")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def test_partitioned_variants_match_broadcast_plans(spark):
    """The scale variants (shuffle-hash joins instead of per-round
    broadcast builds — pagerank partitioned mode, kcore_peel partitioned,
    bfs partitioned) must be output-identical to the broadcast plans;
    only the physical exchange strategy differs.  These are the plans the
    1M-node scaling bench (bench/graph_scaling.py) runs."""
    from pyspark.sql import functions as F

    from kgforge.operators.graph import bfs_levels_frontier, kcore_peel, pagerank

    sym = _random_sym_graph(spark)
    a = {r.node: round(r.r, 6) for r in pagerank(sym, checkpoint=True).collect()}
    b = {
        r.node: round(r.r, 6)
        for r in pagerank(sym, checkpoint=True, partitioned=True, checkpoint_every=2).collect()
    }
    assert a == b
    ka = {(r.node, r.core_degree) for r in kcore_peel(sym, 3, 4).collect()}
    kb = {(r.node, r.core_degree) for r in kcore_peel(sym, 3, 4, partitioned=True).collect()}
    assert ka == kb
    kc = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, partitioned=True, checkpoint_every=2).collect()
    }
    assert ka == kc
    seeds = sym.select(F.col("src").alias("node")).distinct().orderBy("node").limit(10)
    xa = {(r.node, r.dist) for r in bfs_levels_frontier(sym, seeds, 3).collect()}
    xb = {
        (r.node, r.dist)
        for r in bfs_levels_frontier(sym, seeds, 3, partitioned=True).collect()
    }
    assert xa == xb


def test_kcore_anti_matches_and_round_is_exchange_free(spark):
    """anti=True peels by broadcasting the per-round REMOVED set into two
    anti-joins.  On a symmetrized graph removed = current-srcs \\ keep, so
    the output must be set-identical to the keep semi-join plans; and a
    peel round over hash(src)-laid-out edges must plan with ZERO shuffle
    exchanges (both prunes map-side broadcast anti-joins, the degree agg
    reusing the layout) — that is the whole point of the variant."""
    from pyspark.sql import functions as F

    from kgforge.operators.graph import _pinned_checkpoint, kcore_peel

    sym = _random_sym_graph(spark, seed=7)
    ka = {(r.node, r.core_degree) for r in kcore_peel(sym, 3, 4).collect()}
    kd = {(r.node, r.core_degree) for r in kcore_peel(sym, 3, 4, anti=True).collect()}
    assert ka == kd
    kd2 = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, anti=True, checkpoint_every=2).collect()
    }
    assert ka == kd2
    # cumulative mode: base checkpointed once, per-round broadcast of the
    # UNION of all removed sets, constant plan depth, fixpoint early-exit
    kcum = {(r.node, r.core_degree) for r in kcore_peel(sym, 3, 4, cumulative=True).collect()}
    assert ka == kcum
    # layout variants are physical-only: even round-robin base (partial-agg
    # degree rounds) and wider hash layout must not change the answer
    keven = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, cumulative=True, layout="even").collect()
    }
    assert ka == keven
    kp = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, cumulative=True, layout_partitions=16).collect()
    }
    assert ka == kp
    ks = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, cumulative=True, layout="salted:4").collect()
    }
    assert ka == ks
    # delta mode maintains a V-row degree table (decrements instead of
    # E-row re-aggregation) — must be output-identical in every layout
    kdelta = {(r.node, r.core_degree) for r in kcore_peel(sym, 3, 4, delta=True).collect()}
    assert ka == kdelta
    kdelta_ar = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, delta=True, layout="asread").collect()
    }
    assert ka == kdelta_ar
    kdelta_s = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, delta=True, layout="salted:4").collect()
    }
    assert ka == kdelta_s
    # adjacency-delta mode probes V-row neighbor lists instead of E rows
    # per round — must be output-identical too
    kdelta_adj = {
        (r.node, r.core_degree)
        for r in kcore_peel(sym, 3, 4, delta=True, adjacency=True).collect()
    }
    assert ka == kdelta_adj
    # fixpoint early-exit must not change the answer vs a huge round budget
    kcum_many = {
        (r.node, r.core_degree) for r in kcore_peel(sym, 3, 50, cumulative=True).collect()
    }
    assert {(r.node, r.core_degree) for r in kcore_peel(sym, 3, 50).collect()} == kcum_many
    assert {
        (r.node, r.core_degree) for r in kcore_peel(sym, 3, 50, delta=True).collect()
    } == kcum_many

    # _pinned_checkpoint is load-bearing: a PLAIN localCheckpoint under
    # AQE forgets the hash layout (AdaptiveSparkPlan's outputPartitioning
    # is unknown pre-final), and this very plan re-exchanges — measured.
    laid = _pinned_checkpoint(sym.repartition("src"))
    removed = (
        laid.groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") < 3)
        .select("src")
    )
    one_round = laid.join(F.broadcast(removed), "src", "left_anti").join(
        F.broadcast(removed.select(F.col("src").alias("dst"))), "dst", "left_anti"
    )
    plan = one_round._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_pagerank_partitioned_has_no_per_round_rank_broadcast(spark):
    """The partitioned plan's point: the rank vector moves through
    shuffle-hash exchanges, never a per-round broadcast build.  The only
    BroadcastExchange allowed in the full plan is the one-time degree
    join inside the cached w build."""
    sym = _random_sym_graph(spark, seed=14)
    plan = (
        pagerank(sym, partitioned=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan
    assert plan.count("BroadcastExchange") <= 1
