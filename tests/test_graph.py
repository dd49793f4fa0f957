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
