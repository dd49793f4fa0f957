"""KG-construction semantics over the driver ``documents`` table — the
SQL-oracle-checkable twin of the code pipeline, mirroring the reference's
experiment chain (/root/reference/experiments/uaz_documents_comparison.py):

- mention detection (concept token match, :153-160 retrieval analog)
- concept-pair self-join with canonical ordering (J4/J5, :162-181,237-238)
- evidence-set squash (A11, :380-389)
- triple materialization (:181-192)
- agreement counters between two pipeline variants (A9,
  /root/reference/experiments/uaz_indicators_comparison.py:139-161)

plus ORACLE-gated registrations of the real code-corpus pipeline stages
(mentions -> links -> components -> triples) over the deterministic
synthetic corpus: the iterative CC stage is not SQL-expressible, so the
DuckDB oracles read the independent pandas twin's precomputed stage outputs
(fixtures/twin_*.parquet via kgforge/oracle/fixtures.py, drift-guarded by
tests/test_twin_fixtures.py) — the same hard row/schema/value-hash check
every SQL query gets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import constants, synth
from ..stages import canonical, embed, link, materialize, mentions
from .registry import ROUND, query, table

_CONCEPTS = constants.DOC_CONCEPTS
_CONCEPT_VALUES = ", ".join(f"('{c}')" for c in _CONCEPTS)

SQL_DOC_MENTIONS = rf"""
select distinct doc_id, term as concept
from (select doc_id, unnest(regexp_split_to_array(lower(text), '\W+')) as term from documents)
where term in (values {_CONCEPT_VALUES})
"""

SQL_DOC_PAIRS = f"""
select m1.concept as c1, m2.concept as c2, count(*)::BIGINT as n_docs
from ({SQL_DOC_MENTIONS}) m1 join ({SQL_DOC_MENTIONS}) m2 using (doc_id)
where m1.concept < m2.concept
group by 1, 2
having count(*) >= {constants.DOC_PAIR_MIN_COUNT}
"""


def _doc_mentions(spark, sf_dir, quality_ok: bool = False):
    docs = table(spark, sf_dir, "documents")
    if quality_ok:
        docs = docs.where(F.length("text") >= 300)
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda t: t != "")
    concepts = F.array(*[F.lit(c) for c in _CONCEPTS])
    return docs.select(
        "doc_id", F.explode(F.array_intersect(toks, concepts)).alias("concept")
    )


def _doc_pairs(m):
    m1 = m.select("doc_id", F.col("concept").alias("c1"))
    m2 = m.select("doc_id", F.col("concept").alias("c2"))
    return (
        m1.join(m2, "doc_id")
        .where(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= constants.DOC_PAIR_MIN_COUNT)
    )


@query("kg_doc_mentions", oracle=SQL_DOC_MENTIONS)
def kg_doc_mentions(spark, sf_dir):
    """Mention detection: docs containing a dictionary concept.
    array_intersect keeps it one pass over the exploded tokens; the concept
    dictionary is a literal array (broadcast-scale, like the reference's
    ontology leaves)."""
    return _doc_mentions(spark, sf_dir)


@query("kg_doc_pairs", oracle=SQL_DOC_PAIRS)
def kg_doc_pairs(spark, sf_dir):
    """J4: self equi-join on doc_id with c1 < c2 canonical ordering — the
    '<' predicate replaces the reference's driver-side dedup set."""
    return _doc_pairs(_doc_mentions(spark, sf_dir))


@query(
    "kg_doc_evidence",
    oracle=f"""
    select m1.concept as c1, m2.concept as c2,
           array_to_string(list_sort(list(distinct m1.doc_id::VARCHAR)), ',') as evidence_csv
    from ({SQL_DOC_MENTIONS}) m1 join ({SQL_DOC_MENTIONS}) m2 using (doc_id)
    where m1.concept < m2.concept
    group by 1, 2
    """,
)
def kg_doc_evidence(spark, sf_dir):
    """A11 evidence-set squash: group pairs, union doc-id evidence sets
    (collect_set), rendered as a sorted CSV for stable comparison."""
    m = _doc_mentions(spark, sf_dir)
    m1 = m.select("doc_id", F.col("concept").alias("c1"))
    m2 = m.select("doc_id", F.col("concept").alias("c2"))
    return (
        m1.join(m2, "doc_id")
        .where(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(
            F.array_join(F.array_sort(F.collect_set(F.col("doc_id").cast("string"))), ",").alias(
                "evidence_csv"
            )
        )
    )


@query(
    "kg_doc_triples",
    oracle=f"""
    select 'concept:' || c1 as subj, 'cooccurs_with' as pred, 'concept:' || c2 as obj,
           min_doc::VARCHAR as evidence,
           round(n_docs::DOUBLE / (select count(*) from documents), {ROUND}) as score
    from (
      select m1.concept as c1, m2.concept as c2, count(*)::BIGINT as n_docs,
             min(m1.doc_id) as min_doc
      from ({SQL_DOC_MENTIONS}) m1 join ({SQL_DOC_MENTIONS}) m2 using (doc_id)
      where m1.concept < m2.concept
      group by 1, 2
      having count(*) >= {constants.DOC_PAIR_MIN_COUNT}
    )
    """,
)
def kg_doc_triples(spark, sf_dir):
    """Flagship: materialized concept co-occurrence triples with evidence
    and support score — the documents-table analog of the pipeline's
    (subj, pred, obj, evidence, score) output."""
    m = _doc_mentions(spark, sf_dir)
    n_docs_total = table(spark, sf_dir, "documents").count()
    m1 = m.select("doc_id", F.col("concept").alias("c1"))
    m2 = m.select("doc_id", F.col("concept").alias("c2"))
    pairs = (
        m1.join(m2, "doc_id")
        .where(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .where(F.col("n_docs") >= constants.DOC_PAIR_MIN_COUNT)
    )
    return pairs.select(
        F.concat(F.lit("concept:"), "c1").alias("subj"),
        F.lit("cooccurs_with").alias("pred"),
        F.concat(F.lit("concept:"), "c2").alias("obj"),
        F.col("min_doc").cast("string").alias("evidence"),
        F.round(F.col("n_docs") / F.lit(float(n_docs_total)), ROUND).alias("score"),
    )


@query(
    "kg_doc_compare",
    oracle=f"""
    with a as ({SQL_DOC_PAIRS}),
    b as (
      select m1.concept as c1, m2.concept as c2, count(*)::BIGINT as n_docs
      from (select distinct t.doc_id, t.term as concept
            from (select doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) as term
                  from documents where length(text) >= 300) t
            where t.term in (values {_CONCEPT_VALUES})) m1
      join (select distinct t.doc_id, t.term as concept
            from (select doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) as term
                  from documents where length(text) >= 300) t
            where t.term in (values {_CONCEPT_VALUES})) m2 using (doc_id)
      where m1.concept < m2.concept
      group by 1, 2
      having count(*) >= {constants.DOC_PAIR_MIN_COUNT}
    )
    select case when a.c1 is null then 'only_filtered'
                when b.c1 is null then 'only_full'
                else 'both' end as status,
           count(*)::BIGINT as n
    from a full outer join b using (c1, c2)
    group by 1
    """,
)
def kg_doc_compare(spark, sf_dir):
    """J6/A9: differential comparison of two pipeline variants (full corpus
    vs quality-filtered) — the reference's UAZ-agreement harness shape as a
    full-outer join + verdict counters."""
    a = _doc_pairs(_doc_mentions(spark, sf_dir))
    b = _doc_pairs(_doc_mentions(spark, sf_dir, quality_ok=True))
    j = a.select("c1", "c2", F.lit(1).alias("_a")).join(
        b.select("c1", "c2", F.lit(1).alias("_b")), ["c1", "c2"], "full"
    )
    return (
        j.select(
            F.when(F.col("_a").isNull(), "only_filtered")
            .when(F.col("_b").isNull(), "only_full")
            .otherwise("both")
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "concept_doc_counts",
    oracle=f"""
    select concept, count(*)::BIGINT as n_docs
    from ({SQL_DOC_MENTIONS})
    group by concept
    order by n_docs desc, concept
    limit 100
    """,
)
def concept_doc_counts(spark, sf_dir):
    """A10: per-concept document counts, top-100
    (/root/reference/experiments/uaz_documents_comparison.py:54-66)."""
    return (
        _doc_mentions(spark, sf_dir)
        .groupBy("concept")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("concept"))
        .limit(100)
    )


def _concept_cosines() -> list[tuple[str, str, float]]:
    """Deterministic pairwise cosines of the concept-name embeddings,
    computed once at import (10 concepts -> 45 pairs) and inlined as a
    literal table on BOTH engines — the concept-distance dimension of the
    reference's pair score (J9)."""
    import numpy as np

    from .. import constants as C

    names = sorted(_CONCEPTS)
    mat = C.embed_batch(names)
    out = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            out.append((names[i], names[j], round(float(mat[i] @ mat[j]), 6)))
    return out


_COS_VALUES = ", ".join(f"('{a}', '{b}', {c})" for a, b, c in _concept_cosines())


@query(
    "kg_doc_pair_scores",
    oracle=f"""
    with pairs as ({SQL_DOC_PAIRS}),
    tot as (select concept, count(*)::BIGINT as n from ({SQL_DOC_MENTIONS}) group by concept),
    cos(c1, c2, cosv) as (values {_COS_VALUES})
    select p.c1, p.c2,
           round((t1.n * t2.n)::DOUBLE / (1.0 + cos.cosv), {ROUND}) as pair_score
    from pairs p
    join tot t1 on t1.concept = p.c1
    join tot t2 on t2.concept = p.c2
    join cos on cos.c1 = p.c1 and cos.c2 = p.c2
    """,
)
def kg_doc_pair_scores(spark, sf_dir):
    """V6/J9: the reference's pair score shape score1*score2/cos(c1,c2)
    (/root/reference/experiments/uaz_documents_comparison.py:174-178) —
    support counts as scores, concept-embedding cosine as the distance
    (shifted +1 to keep the denominator positive).  The tiny cosine
    dimension table is broadcast."""
    pairs = _doc_pairs(_doc_mentions(spark, sf_dir))
    tot = (
        _doc_mentions(spark, sf_dir)
        .groupBy("concept")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cos = spark.createDataFrame(_concept_cosines(), "c1 string, c2 string, cosv double")
    t1 = tot.select(F.col("concept").alias("c1"), F.col("n").alias("n1"))
    t2 = tot.select(F.col("concept").alias("c2"), F.col("n").alias("n2"))
    return (
        pairs.join(F.broadcast(t1), "c1")
        .join(F.broadcast(t2), "c2")
        .join(F.broadcast(cos), ["c1", "c2"])
        .select(
            "c1",
            "c2",
            F.round((F.col("n1") * F.col("n2")).cast("double") / (F.lit(1.0) + F.col("cosv")), ROUND).alias(
                "pair_score"
            ),
        )
    )


# ---------------------------------------------------------- code-pipeline
# The real code-corpus pipeline stages (mentions -> links -> components ->
# triples) over the deterministic synthetic corpus.  The iterative CC stage
# is not SQL-expressible, so the DuckDB oracles read the EXPECTED stage
# outputs precomputed by the independent pandas twin
# (kgforge/oracle/fixtures.py; drift-guarded by tests/test_twin_fixtures.py).
# This gives the flagship pipeline the same hard row/schema/value-hash
# driver gate as every SQL query.
from ..oracle.fixtures import SYNTH_N as _SYNTH_N
from ..oracle.fixtures import fixture_path as _fixture_path


def _synth(spark):
    return synth.synth_files_df(spark, _SYNTH_N)


def _twin_oracle(stage: str) -> str:
    return f"select * from read_parquet('{_fixture_path(stage)}')"


@query("pipeline_mentions", oracle=_twin_oracle("mentions"))
def pipeline_mentions(spark, sf_dir):
    """Stage 1 over the 200-file synthetic corpus; ``is_first`` is a
    physical dedup flag (per-file first occurrence), not part of the
    logical mention set, so the driver-compared projection drops it."""
    return mentions.extract_mentions(_synth(spark)).drop("is_first")


@query("pipeline_links", oracle=_twin_oracle("links"))
def pipeline_links(spark, sf_dir):
    """Stage 3 (LSH-blocked linking).  The twin oracle is the EXACT
    all-pairs linker, so a green row here re-proves LSH recall 1.0 at the
    link threshold on every driver run.  ``bucket`` is physical lineage
    (which LSH bucket proposed the pair) — dropped from the comparison."""
    men = mentions.extract_mentions(_synth(spark))
    links = link.candidate_links(embed.embed_mentions(men))
    return links.select("a", "b", F.round("score", ROUND).alias("score"))


@query("pipeline_entities", oracle=_twin_oracle("entities"))
def pipeline_entities(spark, sf_dir):
    """Stage 4 (distributed connected components) vs the twin's union-find:
    same non-identity (entity_id -> lexicographic-min canonical) mapping."""
    men = mentions.extract_mentions(_synth(spark))
    links = link.candidate_links(embed.embed_mentions(men))
    return canonical.connected_components(links)


@query("pipeline_triples", oracle=_twin_oracle("triples"))
def pipeline_triples(spark, sf_dir):
    """Stage 5: the full materialized triple graph vs the twin's — the
    north_rule P/R differential, promoted to an exact-equality driver gate
    (P/R 1.0 at this scale).  Uses the single-pass packed plan, the same
    path the pipeline runs."""
    men_packed = mentions.extract_mentions_packed(_synth(spark))
    men = mentions.explode_mentions(men_packed)
    links = link.candidate_links(embed.embed_mentions(men))
    ents = canonical.connected_components(links)
    return materialize.triples_from_packed(men_packed, ents)
