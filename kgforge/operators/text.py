"""Text / search operators over the ``documents`` table — the reference's
tf-idf engine family re-expressed relationally (SURVEY.md §2.3-2.4):

- tokenizer T1 (/root/reference/search/tf_idf_search.py:17-18)
- tf A1 / idf A2 / tf-idf A3 (/root/reference/search/tf_idf_search.py:24-46)
- query scoring A4 (:53-60) and the sklearn-normalized cosine variant A5
  (:79-85)
- doc-quality predicate P6
  (/root/reference/experiments/uaz_documents_comparison.py:33-36)
- chunking P3/P4 (/root/reference/data/corpora.py:44-51)
- plus the training-data-pipeline text analytics: language-ID heuristic,
  quality scoring, token counting, minhash document fingerprinting.

Every query has a DuckDB oracle; Catalyst runs the Spark side as hash
aggregations / broadcast joins over the exploded long-form tables — the
idiomatic columnar encoding of the reference's sparse dict-of-dict matrices
(SURVEY.md §1.2.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..cachectl import tracked_cache
from .registry import ROUND, query, table

QUERY_TERMS = ("spark", "join", "window", "fast")
STOPWORDS = ("the", "a", "of", "to", "in")
CHUNK_TOKENS = 16
FP_HASHES = 4

# ---------------------------------------------------------------- shared SQL
SQL_TOKENS = r"""
select doc_id, unnest(regexp_split_to_array(lower(text), '\W+')) as term
from documents
"""
SQL_TF = f"""
select doc_id, term, count(*)::BIGINT as tf
from ({SQL_TOKENS}) where term <> '' group by doc_id, term
"""
SQL_IDF = f"""
select term, count(*)::BIGINT as df,
       round((select count(*) from documents)::DOUBLE / count(*), {ROUND}) as idf
from ({SQL_TF}) group by term
"""
SQL_TFIDF = f"""
select t.doc_id, t.term, round(t.tf * i.idf, {ROUND}) as w
from ({SQL_TF}) t join ({SQL_IDF}) i using (term)
"""
_QUERY_VALUES = ", ".join(f"('{t}')" for t in QUERY_TERMS)


def _tokens_col(col: str = "text"):
    return F.filter(F.split(F.lower(F.col(col)), r"\W+"), lambda t: t != "")


def _tf(docs):
    return (
        docs.select("doc_id", F.explode(_tokens_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _idf(tf, n_docs: int):
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.round(F.lit(float(n_docs)) / F.count(F.lit(1)), ROUND).alias("idf"),
    )


# ------------------------------------------------------------------ queries
@query("tf_terms", oracle=SQL_TF)
def tf_terms(spark, sf_dir):
    return _tf(table(spark, sf_dir, "documents"))


@query("idf_terms", oracle=SQL_IDF)
def idf_terms(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return _idf(_tf(docs), docs.count())


@query("tfidf_weights", oracle=SQL_TFIDF)
def tfidf_weights(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    tf = _tf(docs)
    idf = _idf(tf, docs.count())
    return tf.join(idf, "term").select(
        "doc_id", "term", F.round(F.col("tf") * F.col("idf"), ROUND).alias("w")
    )


@query(
    "tfidf_search",
    oracle=f"""
    select doc_id, round(sum(w), {ROUND}) as score
    from ({SQL_TFIDF}) w
    where term in (values {_QUERY_VALUES})
    group by doc_id
    order by score desc, doc_id
    limit 20
    """,
)
def tfidf_search(spark, sf_dir):
    """A4: sparse dot product of query terms vs doc tf-idf weights, top-20.

    The inner join on term IS the sparse skip of zero-score docs
    (/root/reference/search/tf_idf_search.py:54-60, SURVEY.md §4 O7);
    Catalyst broadcasts the 4-row query side.
    """
    w = tfidf_weights(spark, sf_dir)
    q = spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")
    return (
        w.join(F.broadcast(q), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), ROUND).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "cosine_tfidf_search",
    oracle=f"""
    with w as ({SQL_TFIDF}),
    norms as (select doc_id, sqrt(sum(w*w)) as nrm from w group by doc_id),
    qv as (select term, idf as qw from ({SQL_IDF}) where term in (values {_QUERY_VALUES})),
    qn as (select sqrt(sum(qw*qw)) as qnrm from qv)
    select w.doc_id,
           round(sum(w.w * qv.qw) / (any_value(norms.nrm) * (select qnrm from qn)), {ROUND}) as score
    from w join qv using (term) join norms using (doc_id)
    group by w.doc_id
    order by score desc, doc_id
    limit 20
    """,
)
def cosine_tfidf_search(spark, sf_dir):
    """A5: sklearn-style L2-normalized tf-idf cosine
    (/root/reference/search/tf_idf_search.py:79-85)."""
    docs = table(spark, sf_dir, "documents")
    tf = _tf(docs)
    idf = tracked_cache(_idf(tf, docs.count()))
    w = tf.join(idf, "term").select(
        "doc_id", "term", F.round(F.col("tf") * F.col("idf"), ROUND).alias("w")
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    q = spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")
    qv = idf.join(F.broadcast(q), "term").select("term", F.col("idf").alias("qw"))
    qnrm = float(qv.agg(F.sqrt(F.sum(F.col("qw") * F.col("qw")))).collect()[0][0])
    return (
        w.join(F.broadcast(qv), "term")
        .join(norms, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("qw")) / (F.any_value(F.col("nrm")) * F.lit(qnrm)),
                ROUND,
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "doc_quality_filter",
    oracle=r"""
    select doc_id, length(text)::BIGINT as n_len,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT as n_alpha,
           (length(text) >= 300 and length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) >= 200) as ok
    from documents
    """,
)
def doc_quality_filter(spark, sf_dir):
    """P6 quality predicate (thresholds scaled to the testdata corpus)."""
    docs = table(spark, sf_dir, "documents")
    n_len = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    return docs.select(
        "doc_id",
        n_len.cast("long").alias("n_len"),
        n_alpha.cast("long").alias("n_alpha"),
        ((n_len >= 300) & (n_alpha >= 200)).alias("ok"),
    )


@query(
    "doc_chunks",
    oracle=rf"""
    with toks as (
      select doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '') as ts
      from documents
    )
    select doc_id, i::INT as chunk,
           array_to_string(ts[i * {CHUNK_TOKENS} + 1 : (i + 1) * {CHUNK_TOKENS}], ' ') as chunk_text
    from toks, unnest(range(((len(ts) + {CHUNK_TOKENS} - 1) // {CHUNK_TOKENS})::BIGINT)) as u(i)
    """,
)
def doc_chunks(spark, sf_dir):
    """P3/P4 chunking as posexplode of fixed token windows
    (/root/reference/data/corpora.py:44-51 key-extension semantics:
    (doc_id) -> (doc_id, chunk))."""
    docs = table(spark, sf_dir, "documents")
    # ts staged through a projection boundary (inlined it would re-run the
    # tokenizer once per chunk — see doc_fingerprint)
    ts = F.col("ts")
    n_chunks = F.ceil(F.size(ts) / F.lit(CHUNK_TOKENS)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(ts, i * CHUNK_TOKENS + 1, CHUNK_TOKENS)),
    )
    return (
        docs.select("doc_id", _tokens_col().alias("ts"))
        .where(F.size(ts) > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk", "chunk_text"))
    )


# ---------------------------------------------------- P5: sentence chunker
# The reference DECLARES this chunker and never implements it
# (/root/reference/data/dart_papers.py:52-55: "split the document on
# sentences (separated by periods)", raises NotImplementedError, with a
# TODO about abbreviation periods).  This implements the declared contract
# — split on '.', trim, drop empties (the same filter(len) rule its sibling
# chunk_paragraphs applies to newlines), key-extended (doc_id -> (doc_id,
# sent)) like every Corpus.chunk — and inherits the abbreviation TODO
# as-is.  The synthetic corpus has no punctuation, so sentence-structured
# prose is synthesized per doc in lockstep Spark/DuckDB expressions
# (SENT_TOKENS-token sentences), with three variants covering the split
# branches: no trailing period, trailing period, and a double period whose
# empty sentence must be dropped.

SENT_TOKENS = 8


def _prose_expr():
    ts = F.col("ts")
    n_sent = F.ceil(F.size(ts) / F.lit(SENT_TOKENS)).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), n_sent - 1),
        lambda i: F.concat_ws(" ", F.slice(ts, i * SENT_TOKENS + 1, SENT_TOKENS)),
    )
    joined = F.array_join(sents, ". ")
    v = F.col("doc_id") % 3
    return (
        F.when(v == 0, joined)
        .when(v == 1, F.concat(joined, F.lit(".")))
        .otherwise(
            F.when(
                F.size(sents) > 1,
                F.concat(
                    F.element_at(sents, 1),
                    F.lit(".. "),
                    F.array_join(F.slice(sents, 2, F.size(sents) - 1), ". "),
                ),
            ).otherwise(F.concat(joined, F.lit("..")))
        )
    )


_SQL_PROSE = rf"""
select doc_id,
       case doc_id % 3
         when 0 then joined
         when 1 then joined || '.'
         else case when n_sent > 1
                   then sents[1] || '.. ' || array_to_string(sents[2:n_sent], '. ')
                   else joined || '..' end
       end as prose
from (
  select doc_id, sents, len(sents) as n_sent,
         array_to_string(sents, '. ') as joined
  from (
    select doc_id,
           list_transform(range(((len(ts) + {SENT_TOKENS} - 1) // {SENT_TOKENS})::BIGINT),
                          i -> array_to_string(ts[i * {SENT_TOKENS} + 1 : (i + 1) * {SENT_TOKENS}], ' ')) as sents
    from (select doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '') as ts
          from documents)
    where len(ts) > 0
  )
)
"""


def chunk_sentences(prose_df):
    """(doc_id, prose) -> (doc_id, sent, sentence): the declared P5 rule."""
    sents = F.filter(
        F.transform(F.split("prose", r"\."), lambda s: F.trim(s)), lambda s: s != ""
    )
    return prose_df.select("doc_id", F.posexplode(sents).alias("pos", "sentence")).select(
        "doc_id", (F.col("pos") + 1).cast("int").alias("sent"), "sentence"
    )


@query(
    "doc_sentences",
    oracle=rf"""
    with prose as ({_SQL_PROSE}),
    split as (
      select doc_id,
             list_filter(list_transform(string_split(prose, '.'), s -> trim(s)),
                         s -> s <> '') as sents
      from prose
    )
    select doc_id, j::INT as sent, sents[j] as sentence
    from split, unnest(range(1, len(sents) + 1)) as r(j)
    """,
)
def doc_sentences(spark, sf_dir):
    """P5: the sentence chunker the reference declares but leaves
    unimplemented — split on periods, trim, drop empties, key-extended."""
    docs = table(spark, sf_dir, "documents")
    prose = (
        docs.select("doc_id", _tokens_col().alias("ts"))
        .where(F.size("ts") > 0)
        .select("doc_id", _prose_expr().alias("prose"))
    )
    return chunk_sentences(prose)


@query(
    "lang_id",
    oracle=rf"""
    with toks as (
      select doc_id, lang, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '') as ts
      from documents
    )
    select doc_id, lang,
           len(list_intersect(ts, {list(STOPWORDS)}))::BIGINT as stop_hits,
           case when len(list_intersect(ts, {list(STOPWORDS)})) > 0 then 'en' else 'und' end as lang_guess
    from toks
    """,
)
def lang_id(spark, sf_dir):
    """n-gram/stopword language-ID heuristic (training-data-pipeline op)."""
    docs = table(spark, sf_dir, "documents")
    ts = _tokens_col()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.array_intersect(ts, stop))
    return docs.select(
        "doc_id",
        "lang",
        hits.cast("long").alias("stop_hits"),
        F.when(hits > 0, "en").otherwise("und").alias("lang_guess"),
    )


@query(
    "quality_score",
    oracle=rf"""
    with toks as (
      select doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '') as ts
      from documents
    )
    select doc_id,
           len(ts)::BIGINT as n_tokens,
           round(len(list_filter(ts, t -> list_contains({list(STOPWORDS)}, t)))::DOUBLE
                 / greatest(len(ts), 1), {ROUND}) as stop_ratio,
           round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                 / greatest(length(text), 1), {ROUND}) as alpha_ratio
    from toks
    """,
)
def quality_score(spark, sf_dir):
    """Quality scoring: stopword/alpha ratios (training-data-pipeline op)."""
    docs = table(spark, sf_dir, "documents")
    ts = _tokens_col()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(ts)
    stop_hits = F.size(F.filter(ts, lambda t: F.array_contains(stop, t)))
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)), ROUND).alias("stop_ratio"),
        F.round(n_alpha.cast("double") / F.greatest(F.length("text"), F.lit(1)), ROUND).alias(
            "alpha_ratio"
        ),
    )


@query(
    "token_stats",
    oracle=r"""
    select doc_id,
           len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> ''))::BIGINT as ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT as bpe_tokens,
           len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '')))::BIGINT as distinct_terms
    from documents
    """,
)
def token_stats(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex + distinct terms."""
    docs = table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    dis = F.size(F.array_distinct(_tokens_col()))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        dis.cast("long").alias("distinct_terms"),
    )


@query(
    "doc_headline",
    oracle="""
    select doc_id,
           printf('doc %d [%s/%s]: %s...', doc_id, lang, source, substr(text, 1, 40)) as headline
    from documents
    """,
)
def doc_headline(spark, sf_dir):
    """P1 template projection (the reference's formatted description string,
    /root/reference/data/indicators.py:24-31) as format_string."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.format_string(
            "doc %d [%s/%s]: %s...",
            F.col("doc_id"),
            F.col("lang"),
            F.col("source"),
            F.substring("text", 1, 40),
        ).alias("headline"),
    )


def _fp_sql_sig(i: int) -> str:
    # One md5 per shingle, sliced into four independent 32-bit (8 hex char)
    # signatures — 4x less crypto than one md5 per (i, shingle); hex is
    # lowercase fixed-width so string min == numeric min in both engines.
    return (
        f"list_aggregate(list_transform(m0, x -> substr(x, {8 * i + 1}, 8)), 'min')"
        f" as sig{i}"
    )


@query(
    "doc_fingerprint",
    oracle=rf"""
    with toks as (
      select doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '') as ts
      from documents
    ),
    sh as (
      select doc_id,
             case when len(ts) >= 3
                  then list_transform(range((len(ts) - 2)::BIGINT),
                                      j -> ts[j+1] || ' ' || ts[j+2] || ' ' || ts[j+3])
                  else [array_to_string(ts, ' ')] end as sh
      from toks
    ),
    m as (select doc_id, list_transform(sh, s -> md5('0|' || s)) as m0 from sh)
    select doc_id, {', '.join(_fp_sql_sig(i) for i in range(FP_HASHES))}
    from m
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: k-minhash over 3-token shingles, md5-keyed —
    the rolling-hash fingerprint of the training-data pipeline, built from
    JVM-side expressions only (no UDF)."""
    docs = table(spark, sf_dir, "documents")
    # ts staged through a projection boundary: inlined, the tokenizer
    # expression is duplicated into every element_at and re-runs ~3x per
    # shingle position (see dedup._shingles_df — measured 31x there).
    ts = F.col("ts")
    sh = F.when(
        F.size(ts) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(ts) - 3),
            lambda j: F.concat_ws(
                " ", F.element_at(ts, j + 1), F.element_at(ts, j + 2), F.element_at(ts, j + 3)
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", ts)))

    def _sig(i: int):
        return F.array_min(
            # NB: single-arg lambda — a two-arg lambda would make
            # transform() pass the array index as the second argument.
            F.transform(F.col("m0"), lambda x: F.substring(x, 8 * i + 1, 8))
        ).alias(f"sig{i}")

    cols = [F.col("doc_id")] + [_sig(i) for i in range(FP_HASHES)]
    return (
        docs.select("doc_id", _tokens_col().alias("ts"))
        .select("doc_id", sh.alias("sh"))
        # one md5 per shingle, sliced into FP_HASHES 32-bit signatures —
        # 4x less crypto than md5 per (i, shingle)
        .select(
            "doc_id",
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit("0|"), s))).alias("m0"),
        )
        .select(*cols)
    )
