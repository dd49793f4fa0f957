"""The rate-limited external-enrichment stage (S15 analog,
kgforge/operators/enrichment.py): limiter paces without changing output,
and the stub service honors the reference's maxHits/threshold contract."""

from __future__ import annotations

import hashlib
import time

import pytest

from kgforge.operators import enrichment


@pytest.fixture(scope="module")
def qdf(spark):
    from kgforge.operators.ontology import ontology_query_strings

    return ontology_query_strings(spark, "unused").cache()


def _nodes():
    return [n for n, _ in enrichment.parse_ontology()[0]]


def test_stub_threshold_and_topk():
    nodes = _nodes()
    hits = enrichment._stub_ground("precipitation, rainfall", nodes)
    assert 0 < len(hits) <= enrichment.UAZ_MAX_HITS
    assert all(s >= enrichment.UAZ_THRESHOLD for _, s in hits)
    assert hits == sorted(hits, key=lambda t: (-t[1], t[0]))
    # independent replay of one hit's score
    g, s = hits[0]
    hv = int(hashlib.md5(f"precipitation, rainfall|{g}".encode()).hexdigest()[:8], 16)
    assert s == hv / enrichment._HASH_SPACE


def test_rate_limiter_paces_and_output_invariant(spark, qdf):
    nodes = _nodes()
    free = enrichment.enrich_queries(qdf, nodes).orderBy("name", "rank").collect()
    n_queries = qdf.count()
    assert len(free) > 0

    t0 = time.monotonic()
    paced = (
        enrichment.enrich_queries(qdf.coalesce(1), nodes, rate=20.0)
        .orderBy("name", "rank")
        .collect()
    )
    elapsed = time.monotonic() - t0
    assert paced == free  # limiter must never change results
    assert elapsed >= (n_queries - 1) / 20.0  # and must actually pace
