"""Connected-components (large-star/small-star) unit tests."""

from pyspark.sql import functions as F

from kgforge.stages.canonical import canonicalize, connected_components


import pytest


def _links(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0, 0) for a, b in pairs], "a string, b string, score double, bucket long"
    )


@pytest.fixture(params=[0, 1_000_000], ids=["distributed", "local"])
def local_threshold(request):
    """Run every CC test through BOTH the large/small-star loop and the
    driver-side union-find fast path — outputs must be identical."""
    return request.param


def _cc(spark, pairs, local_threshold=0):
    rows = connected_components(_links(spark, pairs), local_threshold=local_threshold).collect()
    return {r["entity_id"]: r["canonical_id"] for r in rows}


def test_single_edge(spark, local_threshold):
    assert _cc(spark, [("a", "b")], local_threshold) == {"b": "a"}


def test_chain_collapses_transitively(spark, local_threshold):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")], local_threshold)
    assert got == {"b": "a", "c": "a", "d": "a"}


def test_two_components(spark, local_threshold):
    got = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z")], local_threshold)
    assert got == {"b": "a", "y": "x", "z": "x"}


def test_star_and_cycle(spark, local_threshold):
    got = _cc(spark, [("m", "n"), ("m", "o"), ("m", "p"), ("n", "p")], local_threshold)
    assert got == {"n": "m", "o": "m", "p": "m"}


def test_long_chain_needs_iterations(spark, local_threshold):
    nodes = [f"n{i:02d}" for i in range(12)]
    got = _cc(spark, list(zip(nodes, nodes[1:])), local_threshold)
    assert set(got.values()) == {"n00"} and len(got) == 11


def test_canonicalize_identity_for_unmapped(spark):
    mapping = _links(spark, []).sparkSession.createDataFrame(
        [("b", "a")], "entity_id string, canonical_id string"
    )
    df = spark.createDataFrame([("b",), ("q",)], "obj string")
    got = {r["obj"] for r in canonicalize(df, mapping, "obj").collect()}
    assert got == {"a", "q"}


def test_numeric_and_string_rounds_agree(spark):
    """The xxhash64-encoded rounds (HashAggregate) must emit exactly the
    string rounds' (SortAggregate) mapping — same components, same
    lexicographic-min representatives."""
    pairs = (
        [(f"c{i}", f"c{i+1}") for i in range(15)]          # one long chain
        + [("hub", f"leaf{i}") for i in range(8)]          # one star
        + [("p0", "p1"), ("p1", "p2"), ("p0", "p2")]       # one cycle
    )
    links = _links(spark, pairs)
    num = {
        r["entity_id"]: r["canonical_id"]
        for r in connected_components(links, local_threshold=0, numeric_rounds=True).collect()
    }
    st = {
        r["entity_id"]: r["canonical_id"]
        for r in connected_components(links, local_threshold=0, numeric_rounds=False).collect()
    }
    assert num == st
    assert len(num) == 25  # chain: 15 mapped, star: 8 (rep 'hub'), cycle: 2
    # every representative is the lexicographic min of its component
    comps: dict[str, set[str]] = {}
    for k, v in num.items():
        comps.setdefault(v, set()).add(k)
    for rep, members in comps.items():
        assert rep == min(members | {rep})


def test_deterministic_across_partitioning(spark):
    pairs = [(f"v{i}", f"v{i+1}") for i in range(0, 40, 2)] + [("v1", "v2"), ("v5", "v6")]
    a = _cc(spark, pairs)
    b_df = _links(spark, pairs).repartition(13)
    rows = connected_components(b_df).collect()
    b = {r["entity_id"]: r["canonical_id"] for r in rows}
    assert a == b
