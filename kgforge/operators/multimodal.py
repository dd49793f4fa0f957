"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched mapInPandas (SURVEY.md mandate: the
schema / partitioning / UDF-signature / batch-shape side is real and
tested; actual image/audio codecs are STUBBED since the libs aren't in this
container).

The binary payload here is the UTF-8 encoding of ``documents.text`` — a
deterministic stand-in with real bytes flowing through the binary column,
the same shape as ``spark.read.format("binaryFile")`` output (reference
analog: the PDF ingest path, /root/reference/experiments/document_upload.py:53-119).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..constants import round_half_away
from .registry import query, table

FEATURE_BINS = 8

MM_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType(), False), False),
    ]
)


def media_manifest(docs: DataFrame) -> DataFrame:
    """documents -> binary-column manifest (payload, typed metadata)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", "image/png").otherwise("audio/wav").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


@query(
    "mm_manifest",
    oracle="""
    select doc_id,
           case when lang = 'en' then 'image/png' else 'audio/wav' end as media_type,
           octet_length(encode(text))::BIGINT as n_bytes,
           sha256(text) as payload_sha256
    from documents
    """,
)
def mm_manifest(spark, sf_dir):
    """Binary-column manifest (metadata only — the payload itself is not
    hash-compared across engines)."""
    return media_manifest(table(spark, sf_dir, "documents")).drop("payload")


def extract_features(manifest: DataFrame) -> DataFrame:
    """Fake 'decode + feature-extract' over the binary column: an 8-bin
    byte histogram per payload, computed in numpy over Arrow batches.

    This is the exact plumbing a real image decoder would use (mapInPandas,
    binary in / float array out, model-or-codec init once per partition);
    swap the histogram for the codec when the libs exist.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init (codec/model load) would happen HERE, once.
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=FEATURE_BINS, range=(0, 256))
                total = max(int(hist.sum()), 1)
                # round HALF-AWAY (constants.round_half_away: the shared
                # match-Spark/DuckDB rounding contract)
                feats.append([round_half_away(float(v) / total, 6) for v in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return manifest.mapInPandas(run, schema=MM_FEATURES_SCHEMA)


# Oracle: the payload is the UTF-8 encoding of `text`, and the testdata
# corpus is pure ASCII (verified: octet_length(encode(text)) == length(text)
# at every SF), so the byte histogram equals a char-class histogram.  Bins
# are [32j, 32j+32) exactly as np.histogram(bins=8, range=(0, 256)); ASCII
# (0..127) can only populate bins 0-3, so f4..f7 are literal zeros on both
# engines.
_SQL_BIN = [
    r"[^\x00-\x1f]", r"[^\x20-\x3f]", r"[^\x40-\x5f]", r"[^\x60-\x7f]",
]
_SQL_FEATS = ", ".join(
    f"round(length(regexp_replace(text, '{p}', '', 'g'))::DOUBLE"
    f" / greatest(octet_length(encode(text)), 1), 6) as f{i}"
    for i, p in enumerate(_SQL_BIN)
)


@query(
    "mm_features",
    oracle=f"""
    select doc_id,
           case when lang = 'en' then 'image/png' else 'audio/wav' end as media_type,
           octet_length(encode(text))::BIGINT as n_bytes,
           {_SQL_FEATS},
           0.0 as f4, 0.0 as f5, 0.0 as f6, 0.0 as f7
    from documents
    """,
)
def mm_features(spark, sf_dir):
    """Binary -> feature vectors via the stubbed decoder, flattened to one
    DOUBLE column per bin for the driver's canonicalizer (round 1 showed a
    raw array<double> column crashes the harness's pandas sort).  The
    array-returning ``extract_features`` stays the library API; determinism
    and batch-shape are pytest-verified (tests/test_multimodal.py)."""
    m = media_manifest(table(spark, sf_dir, "documents"))
    feats = extract_features(m)
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(FEATURE_BINS)],
    )


def frame_sample(manifest: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: REAL codecs are unavailable in this
    container; the Spark-side contract (binary in, one row per sampled
    frame out) is what this function pins down."""
    raise NotImplementedError(
        "video decode requires a codec library not present in this container; "
        "implement run() with pyav/opencv and keep the mapInPandas contract"
    )


# ------------------------------------------------- author blacklist (P11)
# Reference: /root/reference/experiments/document_upload.py:157-173 —
# is_blacklisted_author() drops PDF author strings that are absent or made
# of tool words ('user', 'microsoft', 'office', 'adobe', 'acrobat', plus
# the two-word entry 'utente di'), because those indicate no human author.
# The reference check is `any(tok.strip() in blacklist for tok in
# author.lower().split())` — i.e. per WHITESPACE TOKEN membership, which
# means the multi-word entry 'utente di' can never match (a single token is
# never 'utente di'); this kernel reproduces that behavior faithfully
# rather than "fixing" it, so the emitted author sets agree with the
# reference's.  The PDF metadata source itself is stubbed like the rest of
# this module (no PDF libs in the container): a deterministic author string
# is synthesized per doc with identical expressions in Spark and DuckDB,
# exercising every branch (absent, single blacklisted token, mixed-case
# tool pair, real name, real name + tool word).

AUTHOR_BLACKLIST = ("user", "utente di", "microsoft", "office", "adobe", "acrobat")

_AUTHOR_CASES = [
    # doc_id % 6 -> synthesized raw author metadata
    "''",                                     # 0: empty (absent author)
    "'user'",                                 # 1: blacklisted token
    "'Microsoft Office'",                     # 2: tool pair, mixed case
    "concat('dr ', tok0)",                    # 3: real name
    "'Adobe Acrobat 9.0'",                    # 4: tool + version
    "concat(source, ' user')",                # 5: source id + tool word
]


def _author_sql_case(id_col: str = "doc_id") -> str:
    whens = " ".join(
        f"when {id_col} % 6 = {i} then {expr}" for i, expr in enumerate(_AUTHOR_CASES)
    )
    return f"case {whens} end"


@query(
    "mm_author_filter",
    oracle=rf"""
    with m as (
      select doc_id,
             {_author_sql_case()} as author
      from (select doc_id, source,
                   coalesce(list_filter(regexp_split_to_array(lower(text), '\W+'),
                                        t -> t <> '')[1], '') as tok0
            from documents)
    )
    select doc_id, author from m
    where author <> ''
      and len(list_filter(regexp_split_to_array(lower(author), '\s+'),
              t -> list_contains({list(AUTHOR_BLACKLIST)}, trim(t)))) = 0
    """,
)
def mm_author_filter(spark, sf_dir):
    """P11: keep only docs whose (synthesized) author metadata survives the
    reference's blacklist — author absent/empty is blacklisted, and so is
    any author with a whitespace token in AUTHOR_BLACKLIST.  Pure
    column-expression predicate (no UDF): lower -> split on \\s+ ->
    F.exists membership against a literal array, exactly the pattern
    SURVEY.md §2 names for this operator.  Scale note: a map-only filter —
    no exchange, pushes nothing to the scan only because author is derived;
    with a real metadata column the where-clause is parquet-pushable."""
    docs = table(spark, sf_dir, "documents")
    tok0 = F.coalesce(
        F.element_at(F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != ""), 1),
        F.lit(""),
    )
    base = docs.select("doc_id", "source", tok0.alias("tok0"))
    author = (
        F.when(F.col("doc_id") % 6 == 0, F.lit(""))
        .when(F.col("doc_id") % 6 == 1, F.lit("user"))
        .when(F.col("doc_id") % 6 == 2, F.lit("Microsoft Office"))
        .when(F.col("doc_id") % 6 == 3, F.concat(F.lit("dr "), F.col("tok0")))
        .when(F.col("doc_id") % 6 == 4, F.lit("Adobe Acrobat 9.0"))
        .otherwise(F.concat(F.col("source"), F.lit(" user")))
    )
    bl = F.array(*[F.lit(w) for w in AUTHOR_BLACKLIST])
    m = base.select("doc_id", author.alias("author"))
    # exact reference truth table: `if not author` (None/'' only — a
    # whitespace-only author is truthy and its .split() is empty, so it
    # SURVIVES in the reference; reproduced, not fixed), else any
    # whitespace token in the blacklist.
    blacklisted = (F.col("author") == "") | F.exists(
        F.split(F.lower("author"), r"\s+"), lambda t: F.array_contains(bl, F.trim(t))
    )
    return m.where(~blacklisted).select("doc_id", "author")
