"""Ontology-tree operators (SURVEY.md §2 S5/S6/P2/P8, U5 analog) — the
reference's recursive YAML ontology walk and its derived node sets
(/root/reference/data/wm_ontology.py) as DataFrame operators:

- S5: recursive YAML tree -> nodes(name, examples) + edges(src, dst)
  (:29-38,87-112).  The tree is broadcast-scale (the reference holds it in
  one dict), so the walk runs driver-side and the RESULT becomes two small
  DataFrames — exactly the SURVEY §2.1 S5 mapping.
- S6: blacklist file scan, one term per line (:78-81) — spark.read.text on
  the Spark side, read_csv on the DuckDB side, both over the SAME committed
  file (no literal duplication of the blacklist in code).
- P2: node -> query-string projection (:114-120): name with underscores
  spaced, prepended to examples unless already present, comma-joined —
  regexp_replace / array_prepend / concat_ws, pure JVM.
- P8: validity filter = leaf nodes (no children, :73-76) minus blacklisted
  names (/root/reference/experiments/uaz_documents_comparison.py:22-30) —
  two left_anti joins.
- U5: adjacency symmetrization with self-loops and clip-to-1 (:40-71) —
  union(swap) + union(self-loops) + distinct; the CSR matrix becomes an
  edge table.

The parsed tree is the INPUT (shared by both engines, like any source
table); the oracles re-derive leaves/validity/projection independently in
DuckDB SQL from node/edge literals, and the parser itself is unit-tested
against the committed YAML (tests/test_ontology.py).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import functions as F

from ..constants import DATA_DIR
from .registry import query

ONTOLOGY_PATH = os.path.join(DATA_DIR, "ontology.yml")
BLACKLIST_PATH = os.path.join(DATA_DIR, "ontology_blacklist.txt")


@lru_cache(maxsize=None)
def parse_ontology(path: str = ONTOLOGY_PATH):
    """Recursive walk of the YAML tree -> (nodes, edges).

    nodes: list[(name, tuple[str, ...] examples)] in DFS order;
    edges: list[(parent, child)].  Mirrors FlatOntology.extract_nodes
    (/root/reference/data/wm_ontology.py:87-112): every node enters the
    graph, children link parent -> child.
    """
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)[0]
    assert isinstance(data, dict), "ontology root is not a dictionary"

    nodes: list[tuple[str, tuple[str, ...]]] = []
    edges: list[tuple[str, str]] = []

    def walk(entry: dict) -> None:
        raw = entry["node"]
        name = raw["name"]
        examples = tuple(raw.get("examples", ()))
        nodes.append((name, examples))
        for child in raw.get("children", []):
            edges.append((name, child["node"]["name"]))
            walk(child)

    walk(data)
    return nodes, edges


def nodes_df(spark):
    nodes, _ = parse_ontology()
    return spark.createDataFrame(
        [(n, list(ex)) for n, ex in nodes], "name string, examples array<string>"
    )


def edges_df(spark):
    _, edges = parse_ontology()
    return spark.createDataFrame(edges, "src string, dst string")


def blacklist_df(spark):
    """S6: one term per line via spark.read.text (whitespace-trimmed)."""
    return (
        spark.read.text(BLACKLIST_PATH)
        .select(F.trim("value").alias("name"))
        .where(F.col("name") != "")
    )


# ------------------------------------------------------------------ oracles
def _sql_nodes() -> str:
    nodes, _ = parse_ontology()
    vals = ", ".join(
        "('{}', {})".format(
            n,
            "[" + ", ".join(f"'{e}'" for e in ex) + "]" if ex else "[]::VARCHAR[]",
        )
        for n, ex in nodes
    )
    return f"(values {vals}) as nodes(name, examples)"


def _sql_edges() -> str:
    _, edges = parse_ontology()
    vals = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    return f"(values {vals}) as edges(src, dst)"


_SQL_BLACKLIST = (
    f"(select trim(column0) as name from read_csv('{BLACKLIST_PATH}', header=false, "
    "delim='\\t') where trim(column0) <> '')"
)


@query(
    "ontology_query_strings",
    oracle=f"""
    select name,
           array_to_string(
             case when list_contains(examples, replace(name, '_', ' '))
                  then examples
                  else list_prepend(replace(name, '_', ' '), examples) end,
             ', ') as query_string
    from {_sql_nodes()}
    """,
)
def ontology_query_strings(spark, sf_dir):
    """P2: node -> search-query projection
    (/root/reference/data/wm_ontology.py:114-120)."""
    spaced = F.regexp_replace("name", "_", " ")
    terms = F.when(
        F.array_contains("examples", spaced), F.col("examples")
    ).otherwise(F.array_prepend("examples", spaced))
    return nodes_df(spark).select("name", F.array_join(terms, ", ").alias("query_string"))


@query(
    "ontology_leaf_nodes",
    oracle=f"""
    select name from {_sql_nodes()}
    where name not in (select src from {_sql_edges()})
    """,
)
def ontology_leaf_nodes(spark, sf_dir):
    """P8 leaf derivation: nodes that never appear as a parent
    (/root/reference/data/wm_ontology.py:73-76 'no children') — left_anti
    against the (broadcast-scale) edge table."""
    return nodes_df(spark).select("name").join(
        F.broadcast(edges_df(spark).select(F.col("src").alias("name"))), "name", "left_anti"
    )


@query(
    "ontology_valid_nodes",
    oracle=f"""
    select name from {_sql_nodes()}
    where name not in (select src from {_sql_edges()})
      and name not in (select name from {_SQL_BLACKLIST})
    """,
)
def ontology_valid_nodes(spark, sf_dir):
    """P8: the mention-detection concept set = leaves minus the blacklist
    FILE scan (/root/reference/experiments/uaz_documents_comparison.py:22-30;
    blacklist read at /root/reference/data/wm_ontology.py:78-81)."""
    return ontology_leaf_nodes(spark, sf_dir).join(
        F.broadcast(blacklist_df(spark)), "name", "left_anti"
    )


@query(
    "ontology_adjacency",
    oracle=f"""
    select src, dst from (
      select src, dst from {_sql_edges()}
      union
      select dst as src, src as dst from {_sql_edges()}
      union
      select name as src, name as dst from {_sql_nodes()}
    )
    """,
)
def ontology_adjacency(spark, sf_dir):
    """U5: symmetrized adjacency with self-loops, data clipped to 1
    (/root/reference/data/wm_ontology.py:40-71) — the CSR matrix as an edge
    table; union + distinct replaces the clip."""
    e = edges_df(spark)
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .unionByName(nodes_df(spark).select(F.col("name").alias("src"), F.col("name").alias("dst")))
        .distinct()
    )
