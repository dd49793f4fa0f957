"""Ontology-tree operator tests: the recursive parser against the committed
YAML, and the derived node sets' structural invariants.  Cross-engine value
equality is covered by tests/test_oracles.py (four oracle rows)."""

from __future__ import annotations

from kgforge.operators import ontology


def test_parse_shape():
    nodes, edges = ontology.parse_ontology()
    names = [n for n, _ in nodes]
    assert names[0] == "software_system"  # DFS order: root first
    assert len(names) == len(set(names)), "node names must be unique ids"
    # every edge endpoint is a known node
    for s, d in edges:
        assert s in names and d in names
    # tree: every node except the root has exactly one parent
    children = [d for _, d in edges]
    assert len(children) == len(set(children)) == len(names) - 1
    # a node without an 'examples' key parses as empty tuple
    by_name = dict(nodes)
    assert by_name["query_engine"] == ()


def test_leaves_and_validity(spark):
    nodes, edges = ontology.parse_ontology()
    parents = {s for s, _ in edges}
    expected_leaves = {n for n, _ in nodes} - parents

    leaves = {r["name"] for r in ontology.ontology_leaf_nodes(spark, "").collect()}
    assert leaves == expected_leaves

    with open(ontology.BLACKLIST_PATH) as f:
        bl = {ln.strip() for ln in f if ln.strip()}
    valid = {r["name"] for r in ontology.ontology_valid_nodes(spark, "").collect()}
    assert valid == expected_leaves - bl
    # the blacklist must actually bite (fixture sanity)
    assert expected_leaves & bl


def test_query_string_projection(spark):
    got = {
        r["name"]: r["query_string"]
        for r in ontology.ontology_query_strings(spark, "").collect()
    }
    # name prepended with underscores spaced (reference :114-120)
    assert got["join_strategy"] == "join strategy, hash_join, merge_join, broadcast"
    # no-examples node projects to just the spaced name
    assert got["query_engine"] == "query engine"


def test_adjacency_symmetric_with_loops(spark):
    adj = {(r["src"], r["dst"]) for r in ontology.ontology_adjacency(spark, "").collect()}
    nodes, edges = ontology.parse_ontology()
    for s, d in edges:
        assert (s, d) in adj and (d, s) in adj
    for n, _ in nodes:
        assert (n, n) in adj
    assert len(adj) == 2 * len(edges) + len(nodes)
