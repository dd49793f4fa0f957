"""Stage 4 — canonicalization: candidate_links -> entities (connected
components via alternating large-star/small-star, Kiveris et al.,
"Connected Components in MapReduce and Beyond").

The reference only canonicalizes pairwise (swap so c1 >= c2,
/root/reference/experiments/uaz_documents_comparison.py:237-238) and builds
a driver-side adjacency matrix (/root/reference/data/wm_ontology.py:40-71);
transitive canonicalization over a distributed edge set is the genuinely
new strategy SURVEY.md §4 N4 calls for.

Scale notes:
- O(log n) rounds; every round is two groupBy-join passes over the edge
  set — pure DataFrame ops, AQE-skew-safe.
- ``localCheckpoint`` each round truncates lineage (SURVEY.md §7.2(b));
  convergence is detected by an order-insensitive edge-set fingerprint
  (count + sum of xxhash64), one tiny aggregate per round.
- Node ids are strings; min == lexicographic min, deterministic across
  partition counts.  An xxhash64-encoded numeric-rounds variant exists
  (``numeric_rounds=True``) but measured SLOWER end-to-end (bench/cc_bench.py;
  see connected_components for the numbers) and is off by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dedup(edges: DataFrame) -> DataFrame:
    return edges.where(F.col("src") != F.col("dst")).distinct()


def large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect strictly-larger neighbors to
    min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .withColumn("m", F.least(F.col("_mn"), F.col("src")))
        .select("src", "m")
    )
    out = (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    return _dedup(out)


def small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect all smaller-or-equal neighbors (and u) to
    the minimum of that set."""
    orient = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = orient.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        orient.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("src"), F.col("m").alias("dst")))
    )
    return _dedup(out)


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _local_components(spark, rows) -> DataFrame:
    """Driver-side union-find for small edge sets (bounded collect).

    The adaptive fast path: when the candidate-link graph fits comfortably
    on the driver, log(n) distributed rounds are pure overhead — one
    collect + one createDataFrame beats ~10 shuffle stages.  Output is
    identical to the iterative path (tests assert equivalence)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    out = [(x, find(x)) for x in parent if find(x) != x]
    return spark.createDataFrame(out, "entity_id string, canonical_id string")


def connected_components(
    links: DataFrame,
    max_iter: int = 20,
    local_threshold: int = 1_000_000,
    numeric_rounds: bool = False,
) -> DataFrame:
    """CANDIDATE_LINKS(a, b, ...) -> ENTITIES(entity_id, canonical_id).

    Adaptive: edge sets under ``local_threshold`` run driver-side
    union-find (one job); larger ones run the distributed
    large-star/small-star loop.  Nodes that never appear in a link are
    their own canonical entity and are NOT emitted here; consumers use
    ``canonicalize`` (left join + coalesce) so the mapping table stays
    proportional to the linked subgraph, not the full entity universe —
    that is what makes the canonical dictionary broadcast-able (north_rule).
    """
    edges = _dedup(links.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    # Bounded probe: a limit(T+1).count() decides the path without moving
    # rows to the driver — when the graph is LARGE this costs one scalar
    # instead of shipping T rows through the driver on every invocation;
    # when small, the follow-up collect is a cheap second scan (and in the
    # pipeline the links table is checkpointed parquet, so the re-scan is
    # a columnar read, not a recompute).
    if local_threshold > 0:
        probe_n = edges.limit(local_threshold + 1).count()
        if probe_n <= local_threshold:
            return _local_components(links.sparkSession, edges.collect())

    if numeric_rounds:
        numeric = _components_numeric(edges, max_iter)
        if numeric is not None:
            return numeric
        # hash collision detected (p ~ n^2/2^64): fall back to exact
        # string rounds below rather than risk merging two components.

    # DEFAULT: string rounds.  groupBy-min on STRING ids means
    # SortAggregate (var-length agg buffers disable hash aggregation) —
    # measured and ACCEPTED: the numeric_rounds experiment (bench/cc_bench.py,
    # 2M nodes / 3M edges, warmed, order-alternated) clocked the hashed
    # variant at 52.2s vs 43.1s for strings, because its extra
    # vertex-distinct, collision-check and representative-recovery passes
    # are each proportional to the graph and together outweigh the
    # per-round hash-vs-sort aggregate savings (~6 rounds at this
    # diameter).  Sort-based aggregation also spills gracefully, and the
    # edge set shrinks every round.  Numbers in BASELINE.md §Measured.
    edges = edges.localCheckpoint()
    prev = _fingerprint(edges)
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint()
        cur = _fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    # Converged edge set is a star forest pointing at component minima.
    orient = edges.select(
        F.greatest("src", "dst").alias("entity_id"), F.least("src", "dst").alias("canonical_id")
    )
    return orient.groupBy("entity_id").agg(F.min("canonical_id").alias("canonical_id"))


def _components_numeric(edges: DataFrame, max_iter: int) -> DataFrame | None:
    """Distributed rounds on xxhash64-encoded node ids.

    Round 1 measured the string-keyed rounds as the slowest plan in the
    repo: a var-length min() buffer downgrades every round's aggregation
    to SortAggregate.  Hashing node ids to longs makes every round a
    numeric HashAggregate; the lexicographic-min STRING representative the
    twin/tests require is recovered afterwards with ONE string-min
    aggregate per component (instead of one per round).

    Correctness guard: xxhash64 must be injective over the actual vertex
    set.  One tiny aggregate checks count(distinct id) == count(distinct
    hash); on collision (p ~ n^2 / 2^64) returns None and the caller runs
    the exact string rounds.
    """
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("h", F.xxhash64("id"))
        .localCheckpoint()
    )
    chk = verts.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("h").alias("nh")
    ).collect()[0]
    if int(chk["n"]) != int(chk["nh"]):
        return None

    e = edges.select(
        F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
    ).localCheckpoint()
    prev = _fingerprint(e)
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint()
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur

    # Star forest on hashes: member -> component-min-HASH (min over the
    # hash order, which is NOT the lexicographic string order — it is only
    # a component KEY, never the emitted representative).
    assign = (
        e.select(F.greatest("src", "dst").alias("h"), F.least("src", "dst").alias("comp"))
        .groupBy("h")
        .agg(F.min("comp").alias("comp"))
    )
    members = assign.unionByName(
        assign.select(F.col("comp").alias("h"), "comp").distinct()
    )
    named = members.join(verts, "h").select("id", "comp")
    # THE one string aggregate: lexicographic-min member name per component.
    reps = named.groupBy("comp").agg(F.min("id").alias("canonical_id"))
    return (
        named.join(reps, "comp")
        .where(F.col("id") != F.col("canonical_id"))
        .select(F.col("id").alias("entity_id"), "canonical_id")
    )


def canonicalize(df: DataFrame, mapping: DataFrame, col: str, broadcast: bool = True) -> DataFrame:
    """Replace ``col`` with its canonical id (identity when unmapped).

    The mapping is broadcast when it fits (north_rule: "broadcast of the
    canonical-entity dictionary when it fits") — pass broadcast=False to
    fall back to a shuffled join for huge dictionaries.
    """
    m = mapping.withColumnRenamed("entity_id", col)
    if broadcast:
        m = F.broadcast(m)
    return (
        df.join(m, col, "left")
        .withColumn(col, F.coalesce(F.col("canonical_id"), F.col(col)))
        .drop("canonical_id")
    )
