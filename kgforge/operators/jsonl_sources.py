"""Nested-JSONL source operators (SURVEY.md §2.1 S7/S8) — the reference's
statements and UAZ-match scans as schema-first ``spark.read.json`` plans
over committed fixtures:

- S7 statements JSONL: subj/obj concept lists from
  ``subj.concept.db_refs.WM_FLAT[*].name`` plus eidos doc ids from the
  evidence array (/root/reference/experiments/uaz_documents_comparison.py:
  291-301 get_concepts/get_docs), the concept -> doc-set inversion
  (:303-326) and the subj x obj pair extraction with evidence squash
  (:337-365 + :380-389).
- S8 UAZ-matches JSONL: per output, union the three ontology score lists
  (concepts/properties/processes, any of which may be null), node name =
  last '/' path segment, then the per-node best match — the inversion-dict
  + argmax shape (/root/reference/experiments/uaz_indicators_comparison.py:
  48-81, 192-193).

Spark side: explicit read schemas (never inference — at 10^12 lines schema
inference is a full extra pass), explode/filter as JVM expressions.
DuckDB oracle: read_json over the same committed bytes with the same
declared columns.  Doc sets are rendered as sorted CSVs for the driver's
order-insensitive hash.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..constants import DATA_DIR
from .registry import query

STATEMENTS_PATH = os.path.join(DATA_DIR, "statements.jsonl")
MATCHES_PATH = os.path.join(DATA_DIR, "indicator_matches.jsonl")

_WM = StructType(
    [
        StructField(
            "concept",
            StructType(
                [
                    StructField(
                        "db_refs",
                        StructType(
                            [
                                StructField(
                                    "WM_FLAT",
                                    ArrayType(
                                        StructType(
                                            [
                                                StructField("name", StringType()),
                                                StructField("score", DoubleType()),
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)

STATEMENTS_SCHEMA = StructType(
    [
        StructField("subj", _WM),
        StructField("obj", _WM),
        StructField(
            "evidence",
            ArrayType(
                StructType(
                    [
                        StructField("source_api", StringType()),
                        StructField("text", StringType()),
                        StructField(
                            "text_refs",
                            StructType([StructField("DART", StringType())]),
                        ),
                    ]
                )
            ),
        ),
        StructField("belief", DoubleType()),
    ]
)

MATCHES_SCHEMA = StructType(
    [
        StructField(
            "outputs",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField(
                            "ontologies",
                            StructType(
                                [
                                    StructField(
                                        k,
                                        ArrayType(
                                            StructType(
                                                [
                                                    StructField("name", StringType()),
                                                    StructField("score", DoubleType()),
                                                ]
                                            )
                                        ),
                                    )
                                    for k in ("concepts", "properties", "processes")
                                ]
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def statements_df(spark):
    return spark.read.schema(STATEMENTS_SCHEMA).json(STATEMENTS_PATH)


def matches_df(spark):
    return spark.read.schema(MATCHES_SCHEMA).json(MATCHES_PATH)


def _eidos_docs():
    """Evidence -> eidos DART doc ids (get_docs, :294-301)."""
    return F.filter(
        F.transform(
            F.filter("evidence", lambda e: e["source_api"] == F.lit("eidos")),
            lambda e: e["text_refs"]["DART"],
        ),
        lambda d: d.isNotNull(),
    )


def _actor_names(actor: str):
    return F.transform(f"{actor}.concept.db_refs.WM_FLAT", lambda c: c["name"])


# DuckDB mirrors of the two extraction kernels, over the same file.
_SQL_STATEMENTS = (
    f"read_json('{STATEMENTS_PATH}', format='newline_delimited', columns={{"
    "'subj': 'STRUCT(concept STRUCT(db_refs STRUCT(WM_FLAT STRUCT(name VARCHAR, score DOUBLE)[])))', "
    "'obj': 'STRUCT(concept STRUCT(db_refs STRUCT(WM_FLAT STRUCT(name VARCHAR, score DOUBLE)[])))', "
    "'evidence': 'STRUCT(source_api VARCHAR, text VARCHAR, text_refs STRUCT(DART VARCHAR))[]', "
    "'belief': 'DOUBLE'})"
)
_SQL_DOCS = (
    "list_filter(list_transform("
    "list_filter(evidence, e -> e.source_api = 'eidos'), e -> e.text_refs.DART), "
    "d -> d is not null)"
)
_SQL_SUBJ = "list_transform(subj.concept.db_refs.WM_FLAT, c -> c.name)"
_SQL_OBJ = "list_transform(obj.concept.db_refs.WM_FLAT, c -> c.name)"


@query(
    "stmt_concept_docs",
    oracle=f"""
    with stmts as (select {_SQL_SUBJ} as subj_names, {_SQL_OBJ} as obj_names,
                          {_SQL_DOCS} as docs
                   from {_SQL_STATEMENTS}),
    x as (select unnest(subj_names || obj_names) as concept, docs from stmts)
    select concept,
           array_to_string(list_sort(list_distinct(flatten(list(docs)))), ',') as docs_csv
    from x group by concept
    """,
)
def stmt_concept_docs(spark, sf_dir):
    """S7: concept -> distinct eidos doc-id set (the get_uaz_concepts_to_docs
    inversion, :303-326), docs as a sorted CSV."""
    st = statements_df(spark).select(
        F.concat(_actor_names("subj"), _actor_names("obj")).alias("concepts"),
        _eidos_docs().alias("docs"),
    )
    return (
        st.select(F.explode("concepts").alias("concept"), "docs")
        .select("concept", F.explode_outer("docs").alias("doc"))
        .groupBy("concept")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("doc")), ","
            ).alias("docs_csv")
        )
    )


@query(
    "stmt_concept_pairs",
    oracle=f"""
    with stmts as (select {_SQL_SUBJ} as subj_names, {_SQL_OBJ} as obj_names,
                          {_SQL_DOCS} as docs
                   from {_SQL_STATEMENTS}
                   where len({_SQL_DOCS}) > 0),
    pairs as (select unnest(subj_names) as subj, obj_names, docs from stmts),
    x as (select subj, unnest(obj_names) as obj, docs from pairs)
    select subj, obj,
           array_to_string(list_sort(list_distinct(flatten(list(docs)))), ',') as docs_csv
    from x group by subj, obj
    """,
)
def stmt_concept_pairs(spark, sf_dir):
    """S7: subj x obj concept pairs with evidence doc sets — the
    get_uaz_concept_pairs cross product (:337-365; statements with no eidos
    docs skipped) squashed per pair (A11, :380-389)."""
    st = statements_df(spark).select(
        _actor_names("subj").alias("subj_names"),
        _actor_names("obj").alias("obj_names"),
        _eidos_docs().alias("docs"),
    ).where(F.size("docs") > 0)
    return (
        st.select(F.explode("subj_names").alias("subj"), "obj_names", "docs")
        .select("subj", F.explode("obj_names").alias("obj"), "docs")
        .select("subj", "obj", F.explode("docs").alias("doc"))
        .groupBy("subj", "obj")
        .agg(F.array_join(F.array_sort(F.collect_set("doc")), ",").alias("docs_csv"))
    )


_SQL_MATCHES = (
    f"read_json('{MATCHES_PATH}', format='newline_delimited', columns={{"
    "'outputs': 'STRUCT(name VARCHAR, ontologies STRUCT("
    "concepts STRUCT(name VARCHAR, score DOUBLE)[], "
    "properties STRUCT(name VARCHAR, score DOUBLE)[], "
    "processes STRUCT(name VARCHAR, score DOUBLE)[]))[]'})"
)


@query(
    "uaz_match_inversion",
    oracle=f"""
    with outs as (select unnest(outputs) as o from {_SQL_MATCHES}),
    scored as (
      select o.name as output_name,
             unnest(coalesce(o.ontologies.concepts, [])
                 || coalesce(o.ontologies.properties, [])
                 || coalesce(o.ontologies.processes, [])) as m
      from outs
    ),
    nodes as (
      select split_part(m.name, '/', -1) as node, output_name, m.score as score
      from scored
    )
    select node, output_name as best_output, score as best_score
    from (select node, output_name, score,
                 row_number() over (partition by node
                                    order by score desc, output_name) as rn
          from nodes)
    where rn = 1
    """,
)
def uaz_match_inversion(spark, sf_dir):
    """S8 + K3: per ontology node, the best-scoring indicator output —
    union of the three (nullable) ontology lists, node = last path segment,
    argmax per node with name tiebreak (:48-81, :192-193)."""
    outs = matches_df(spark).select(F.explode("outputs").alias("o"))
    empty = F.array().cast("array<struct<name:string,score:double>>")
    scored = outs.select(
        F.col("o.name").alias("output_name"),
        F.explode(
            F.concat(
                F.coalesce(F.col("o.ontologies.concepts"), empty),
                F.coalesce(F.col("o.ontologies.properties"), empty),
                F.coalesce(F.col("o.ontologies.processes"), empty),
            )
        ).alias("m"),
    )
    nodes = scored.select(
        F.element_at(F.split(F.col("m.name"), "/"), -1).alias("node"),
        "output_name",
        F.col("m.score").alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(F.desc("score"), F.asc("output_name"))
    return (
        nodes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("node", F.col("output_name").alias("best_output"), F.col("score").alias("best_score"))
    )
