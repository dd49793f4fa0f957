"""Stage 5 — graph materialization: mentions + canonical map -> triples,
plus per-partition lineage/metrics rows.

Output is the canonical (subj, pred, obj, evidence, score) edge table —
the analog of the reference's ranked-links CSV
(/root/reference/experiments/uaz_documents_comparison.py:181-192) with the
evidence-set squash of :380-389 expressed as a groupBy.

Scale notes:
- One groupBy(subj, pred, obj) shuffle; evidence squash keeps min (stable
  representative) instead of collect_set to bound row width at 10^12 scale.
- The canonical-map join is broadcast (see canonical.canonicalize).
- Output is partitioned by pred — partition pruning for per-predicate
  consumers (SURVEY.md §4 N5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants
from .canonical import canonicalize

_KIND_PRED = {
    "import": constants.PRED_IMPORTS,
    "class": constants.PRED_DEFINES,
    "function": constants.PRED_DEFINES,
    "call": constants.PRED_CALLS,
}
_KIND_ETYPE = {"import": "module", "class": "class", "function": "function", "call": "function"}


def triples_from_mentions(
    mentions: DataFrame, mapping: DataFrame, broadcast_map: bool = True
) -> DataFrame:
    """MENTIONS + ENTITIES -> TRIPLES.

    subj = '<repo>:<path>' (the file node), obj = canonicalized typed
    entity id, evidence = '<repo>:<path>:<line>', score = 1.0 for lexical
    triples.  same_as triples come straight from the mapping.
    """
    pred_map = F.create_map(*[F.lit(x) for kv in _KIND_PRED.items() for x in kv])
    etype_map = F.create_map(*[F.lit(x) for kv in _KIND_ETYPE.items() for x in kv])

    m = mentions.where(F.col("kind") != "module")
    lexical = m.select(
        F.concat_ws(":", "repo", "path").alias("subj"),
        pred_map[F.col("kind")].alias("pred"),
        F.concat_ws(":", etype_map[F.col("kind")], F.col("name")).alias("obj"),
        F.col("line"),
        F.lit(1.0).alias("score"),
    )
    lexical = canonicalize(lexical, mapping, "obj", broadcast=broadcast_map)

    # Aggregate on the numeric line, not the evidence STRING: a string
    # min/max has a var-length aggregation buffer, which knocks Spark from
    # HashAggregate down to SortAggregate (full sort of every mention row,
    # map- and reduce-side — measured 3-10x wall on this stage).  For
    # lexical triples evidence == '<subj>:<line>', so min(evidence) ==
    # subj ':' min(line); rebuild the string AFTER the hash,
    # map-side-combining aggregate.
    lexical = (
        lexical.groupBy("subj", "pred", "obj")
        .agg(F.min("line").alias("_line"), F.max("score").alias("score"))
        .select(
            "subj",
            "pred",
            "obj",
            F.concat_ws(":", "subj", F.col("_line").cast("string")).alias("evidence"),
            "score",
        )
    )

    # same_as rows are already unique per (subj, pred, obj) — the mapping
    # has one row per entity_id — so union AFTER the aggregate; the string
    # evidence column never enters an agg buffer.
    same_as = mapping.select(
        F.col("entity_id").alias("subj"),
        F.lit(constants.PRED_SAME_AS).alias("pred"),
        F.col("canonical_id").alias("obj"),
        F.lit("canonicalization").alias("evidence"),
        F.lit(1.0).alias("score"),
    )

    return lexical.unionByName(same_as)


def sha_audit(rows_in: DataFrame, rows_out: DataFrame, partition_col: str = "repo") -> DataFrame:
    """Per-partition verification of the input_hint invariant: every
    (repo, path, commit) in the output carries the same content_sha256 as
    the source table.  This re-hashes the source content — a full input
    pass — so it is an explicit audit (tests + ``--audit``), not something
    silently glued onto every metrics row."""
    src = rows_in.select(partition_col, "path", "commit", "content_sha256").distinct()
    got = rows_out.select(partition_col, "path", "commit", "content_sha256").distinct()
    bad = (
        got.join(src, [partition_col, "path", "commit", "content_sha256"], "left_anti")
        .groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("_bad"))
    )
    return (
        src.select(partition_col)
        .distinct()
        .join(bad, partition_col, "left")
        .select(
            partition_col,
            (F.coalesce(F.col("_bad"), F.lit(0)) == 0).alias("content_sha_ok"),
        )
    )


def stage_metrics(
    stage: str,
    rows_in: DataFrame,
    rows_out: DataFrame,
    wall_ms: int,
    partition_col: str = "repo",
    sha_ok: DataFrame | None = None,
) -> DataFrame:
    """Per-partition lineage rows (north_rule).  Pass ``sha_ok`` (from
    ``sha_audit``) to fold invariant verdicts in; rows_in/rows_out counts
    read only the partition column (column-pruned scans)."""
    in_counts = rows_in.groupBy(partition_col).agg(F.count(F.lit(1)).alias("rows_in"))
    out_counts = rows_out.groupBy(partition_col).agg(F.count(F.lit(1)).alias("rows_out"))
    joined = in_counts.join(out_counts, partition_col, "full")
    if sha_ok is not None:
        joined = joined.join(sha_ok, partition_col, "left")
    else:
        joined = joined.withColumn("content_sha_ok", F.lit(True))
    return joined.select(
        F.lit(stage).alias("stage"),
        F.col(partition_col).cast("string").alias("partition_key"),
        F.coalesce("rows_in", F.lit(0)).alias("rows_in"),
        F.coalesce("rows_out", F.lit(0)).alias("rows_out"),
        F.coalesce("content_sha_ok", F.lit(True)).alias("content_sha_ok"),
        F.lit(int(wall_ms)).alias("wall_ms"),
    )
