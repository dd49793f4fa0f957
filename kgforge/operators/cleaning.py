"""End-to-end training-corpus cleaning — the composition the individual
text-analysis and dedup operators exist FOR: one query that applies
quality thresholds, language ID, and exact-dedup survivor selection and
emits the cleaned document set with its reject accounting.

Pipeline shape (all stages from existing operators, composed):

    documents -> token/alpha quality predicate (P6 analog)
              -> stopword language gate (lang_id)
              -> exact-dup survivor (min doc_id per md5 group, U6)

The per-doc verdict is emitted (kept + reject reason) rather than just the
survivors, because a production cleaning job must account for every
dropped document — and it makes the driver's value-hash cover the reject
logic too.  One pass for the per-doc predicates + one hash aggregate and a
broadcast-join for the dup-survivor map; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query, table

MIN_TOKENS = 40
MIN_ALPHA_RATIO = 0.55
STOPWORDS = ("the", "a", "of", "to", "in")

_SQL_STOP = str(list(STOPWORDS))


@query(
    "corpus_clean",
    oracle=rf"""
    with feat as (
      select doc_id, text,
             len(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> ''))::BIGINT as n_tokens,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
               / greatest(length(text), 1) as alpha_ratio,
             len(list_intersect(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> ''),
                                {_SQL_STOP})) as stop_hits,
             md5(text) as text_md5
      from documents
    )
    select doc_id,
           case
             when n_tokens < {MIN_TOKENS} then 'too_short'
             when alpha_ratio < {MIN_ALPHA_RATIO} then 'low_alpha'
             when stop_hits = 0 then 'not_english'
             when doc_id <> min(doc_id) over (partition by text_md5) then 'exact_dup'
             else 'kept'
           end as verdict
    from feat
    """,
)
def corpus_clean(spark, sf_dir):
    """Cleaning verdict per document: too_short / low_alpha / not_english /
    exact_dup / kept, with reject precedence in that order (a short dup is
    'too_short' — accounting should name the FIRST gate that fired).

    Dup survivorship is a min-over-md5-partition WINDOW, not a
    groupBy+self-join: the join form would compute the tokenize/feature
    subtree twice (once per join leg — the double-scan trap the triples
    stage hit); the window is one shuffle over the already-reduced feature
    rows."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda t: t != "")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    feat = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("alpha_ratio"),
        F.size(F.array_intersect(toks, stop)).alias("stop_hits"),
        F.md5("text").alias("text_md5"),
    )
    keep_doc = F.min("doc_id").over(Window.partitionBy("text_md5"))
    verdict = (
        F.when(F.col("n_tokens") < MIN_TOKENS, "too_short")
        .when(F.col("alpha_ratio") < MIN_ALPHA_RATIO, "low_alpha")
        .when(F.col("stop_hits") == 0, "not_english")
        .when(F.col("doc_id") != keep_doc, "exact_dup")
        .otherwise("kept")
    )
    return feat.select("doc_id", verdict.alias("verdict"))


@query(
    "corpus_clean_stats",
    oracle=rf"""
    with feat as (
      select doc_id, text,
             len(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> ''))::BIGINT as n_tokens,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
               / greatest(length(text), 1) as alpha_ratio,
             len(list_intersect(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> ''),
                                {_SQL_STOP})) as stop_hits,
             md5(text) as text_md5
      from documents
    )
    select verdict, count(*)::BIGINT as n_docs from (
      select case
               when n_tokens < {MIN_TOKENS} then 'too_short'
               when alpha_ratio < {MIN_ALPHA_RATIO} then 'low_alpha'
               when stop_hits = 0 then 'not_english'
               when doc_id <> min(doc_id) over (partition by text_md5) then 'exact_dup'
               else 'kept'
             end as verdict
      from feat
    ) group by 1
    """,
)
def corpus_clean_stats(spark, sf_dir):
    """The cleaning funnel: document counts per verdict (the table a data
    curator reads after every ingest)."""
    return (
        corpus_clean(spark, sf_dir)
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
