"""Connected-components (large-star/small-star) unit tests."""

from pyspark.sql import functions as F

from kgforge.stages.canonical import canonicalize, connected_components


def _links(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0, 0) for a, b in pairs], "a string, b string, score double, bucket long"
    )


def _cc(spark, pairs):
    rows = connected_components(_links(spark, pairs)).collect()
    return {r["entity_id"]: r["canonical_id"] for r in rows}


def test_single_edge(spark):
    assert _cc(spark, [("a", "b")]) == {"b": "a"}


def test_chain_collapses_transitively(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"b": "a", "c": "a", "d": "a"}


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    assert got == {"b": "a", "y": "x", "z": "x"}


def test_star_and_cycle(spark):
    got = _cc(spark, [("m", "n"), ("m", "o"), ("m", "p"), ("n", "p")])
    assert got == {"n": "m", "o": "m", "p": "m"}


def test_long_chain_needs_iterations(spark):
    nodes = [f"n{i:02d}" for i in range(12)]
    got = _cc(spark, list(zip(nodes, nodes[1:])))
    assert set(got.values()) == {"n00"} and len(got) == 11


def test_canonicalize_identity_for_unmapped(spark):
    mapping = _links(spark, []).sparkSession.createDataFrame(
        [("b", "a")], "entity_id string, canonical_id string"
    )
    df = spark.createDataFrame([("b",), ("q",)], "obj string")
    got = {r["obj"] for r in canonicalize(df, mapping, "obj").collect()}
    assert got == {"a", "q"}


def test_deterministic_across_partitioning(spark):
    pairs = [(f"v{i}", f"v{i+1}") for i in range(0, 40, 2)] + [("v1", "v2"), ("v5", "v6")]
    a = _cc(spark, pairs)
    b_df = _links(spark, pairs).repartition(13)
    rows = connected_components(b_df).collect()
    b = {r["entity_id"]: r["canonical_id"] for r in rows}
    assert a == b
