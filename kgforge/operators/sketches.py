"""Mergeable-sketch operators — the cardinality-estimation surface a
100 TB engine needs that the reference (all-in-driver-memory dicts,
/root/reference/search/tf_idf_search.py:24-38 counts exactly) never
required.  Engine-native approx_count_distinct is NOT usable here: Spark
ships HLL++ and DuckDB ships its own HLL, and the two sketches never
hash-agree — so the driver's value-hash gate would always fail.  KMV
(k-minimum-values / bottom-k, Bar-Yossef et al. 2002) built on the
repo's engine-portable md5-prefix hash is deterministic in BOTH engines:
the estimate depends only on the SET of hashed values, never on
partitioning, ordering, or sketch-internals.

Two registered queries prove the two properties that matter at scale:

- ``kmv_distinct`` — per-source token-cardinality estimate.  The Spark
  side computes the exact bottom-K with a SALTED two-level top-K (the
  global K minima are always contained in the union of per-salt-group K
  minima — min-K is distributive), so no single task ever sorts a whole
  source's vocabulary; the oracle derives the same bottom-K with one
  naive window — an independent formulation.
- ``kmv_distinct_merged`` — the global estimate obtained by MERGING the
  per-source sketches (union their bottom-K candidate sets, re-cut to
  K).  KMV merge is exact: every global bottom-K element is in its own
  source's bottom-K, so the merged sketch equals the sketch built
  directly on the union — which is exactly what the oracle computes.
  This is the partition-mergeable property that makes sketches usable
  as map-side partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import ROUND, query, table

KMV_K = 64          # sketch size (k-th minimum defines the estimate)
KMV_SALTS = 16      # stage-1 split of each source's hash stream
_HASH_SPACE = float(1 << 32)  # md5-prefix hashes are uniform on [0, 2^32)

# est(n > K) = (K - 1) / R where R = hv_k / 2^32  ==>  (K-1) * 2^32 / hv_k
_SQL_EST = f"round(({KMV_K} - 1) * {_HASH_SPACE} / hv, {ROUND})"

_SQL_HASHES = r"""
    select distinct source,
           ('0x' || substr(md5(t), 1, 8))::BIGINT as hv
    from (
      select source, unnest(regexp_split_to_array(lower(text), '\W+')) as t
      from documents
    ) where t <> ''
"""


def _hashes(docs):
    """Distinct (source, hv): md5-prefix hash of every distinct token per
    source — the input SET both sketch queries operate on."""
    tok = docs.select(
        "source", F.explode(F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")).alias("t")
    )
    hv = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    return tok.select("source", hv.alias("hv")).distinct()


def _bottom_k(h, keys: list[str], k: int):
    """Exact per-`keys` bottom-k of hv without a per-key global sort:
    stage 1 takes the bottom-k inside (keys, hv % KMV_SALTS) — a salted
    window no hot key can skew — stage 2 re-cuts the surviving
    KMV_SALTS*k candidates.  Distributivity of min-K makes this exact."""
    w1 = Window.partitionBy(*keys, "salt").orderBy("hv")
    stage1 = (
        h.withColumn("salt", F.col("hv") % KMV_SALTS)
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy(*keys).orderBy("hv")
    return stage1.withColumn("rn", F.row_number().over(w2)).where(F.col("rn") <= k)


@query(
    "kmv_distinct",
    oracle=f"""
    with h as ({_SQL_HASHES}),
    ranked as (
      select source, hv,
             row_number() over (partition by source order by hv) as rn,
             count(*) over (partition by source) as n
      from h
    )
    select source, n::BIGINT as n_exact,
           case when n <= {KMV_K} then n::DOUBLE else {_SQL_EST} end as est
    from ranked where rn = least(n, {KMV_K})
    """,
)
def kmv_distinct(spark, sf_dir):
    """Per-source distinct-token estimate from the bottom-{k} KMV sketch
    (exact count alongside, so the error is visible in the output).""".format(k=KMV_K)
    docs = table(spark, sf_dir, "documents")
    h = _hashes(docs)
    n_exact = h.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    kth = (
        _bottom_k(h, ["source"], KMV_K)
        .join(F.broadcast(n_exact), "source")
        .where(F.col("rn") == F.least(F.col("n_exact"), F.lit(KMV_K)))
    )
    est = F.when(F.col("n_exact") <= KMV_K, F.col("n_exact").cast("double")).otherwise(
        F.round(F.lit((KMV_K - 1) * _HASH_SPACE) / F.col("hv"), ROUND)
    )
    return kth.select("source", "n_exact", est.alias("est"))


@query(
    "kmv_distinct_merged",
    oracle=f"""
    with h as (select distinct hv from ({_SQL_HASHES})),
    ranked as (
      select hv, row_number() over (order by hv) as rn, count(*) over () as n
      from h
    )
    select n::BIGINT as n_exact,
           case when n <= {KMV_K} then n::DOUBLE else {_SQL_EST} end as est
    from ranked where rn = least(n, {KMV_K})
    """,
)
def kmv_distinct_merged(spark, sf_dir):
    """Corpus-wide distinct-token estimate computed by MERGING the
    per-source sketches — union the per-source bottom-K candidates,
    dedup, re-cut to K — never touching the full hash set again.  The
    oracle sketches the union directly; KMV merge exactness makes the
    two derivations provably equal."""
    docs = table(spark, sf_dir, "documents")
    h = _hashes(docs)
    per_source = _bottom_k(h, ["source"], KMV_K).select("hv").distinct()
    merged = per_source.withColumn("const", F.lit(1))
    n_exact = h.select("hv").distinct().agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.partitionBy("const").orderBy("hv")
    kth = (
        merged.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(n_exact))
        .where(F.col("rn") == F.least(F.col("n_exact"), F.lit(KMV_K)))
    )
    est = F.when(F.col("n_exact") <= KMV_K, F.col("n_exact").cast("double")).otherwise(
        F.round(F.lit((KMV_K - 1) * _HASH_SPACE) / F.col("hv"), ROUND)
    )
    return kth.select("n_exact", est.alias("est"))


# --- Count-Min sketch (Cormode & Muthukrishnan 2005) ---------------------

CMS_D = 4     # hash rows
CMS_W = 128   # buckets per row
CMS_PROBES = 32  # heavy items whose estimates the query surfaces

# The sketched items are adjacent-token BIGRAMS, not unigrams: the
# synthetic corpus has a ~31-token vocabulary, so only the ~900-item
# bigram universe makes the sketch's defining behavior — bucket
# collisions, est > exact, min-over-rows recovery — actually occur at
# test scale (with unigrams every estimate would be trivially exact and
# the min path dead code).  All CMS_D row-hashes come from ONE md5
# digest: the 32 hex chars split into four disjoint 8-hex windows, each
# a uniform 32-bit value — one crypto hash per occurrence, not CMS_D,
# and byte-identical in both engines.
_SQL_CMS_STREAM = r"""
    select ts[i] || ' ' || ts[i + 1] as t, md5(ts[i] || ' ' || ts[i + 1]) as dig
    from (
      select list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '') as ts
      from documents
    ), unnest(range(1, len(ts))) as u(i)
"""


@query(
    "cms_counts",
    oracle=f"""
    with s as ({_SQL_CMS_STREAM}),
    cells as (
      select d, ('0x' || substr(dig, d * 8 + 1, 8))::BIGINT % {CMS_W} as bucket,
             count(*)::BIGINT as c
      from s, unnest(range({CMS_D})) as u(d)
      group by 1, 2
    ),
    exact as (
      select t, any_value(dig) as dig, count(*)::BIGINT as exact
      from s group by t
      order by exact desc, t limit {CMS_PROBES}
    ),
    probe as (
      select t, exact, d,
             ('0x' || substr(dig, d * 8 + 1, 8))::BIGINT % {CMS_W} as bucket
      from exact, unnest(range({CMS_D})) as u(d)
    )
    select probe.t as tok, any_value(probe.exact) as exact,
           min(cells.c)::BIGINT as est
    from probe join cells using (d, bucket)
    group by probe.t
    """,
)
def cms_counts(spark, sf_dir):
    """Count-Min sketch over the corpus bigram stream: a {d}x{w} counter
    grid (one md5 per occurrence, {d} disjoint 8-hex windows as the row
    hashes), probed for the {p} highest-frequency bigrams — exact count
    alongside the estimate so the one-sided overestimate (est >= exact,
    E[err] <= stream/w per row, min over rows) is visible in the output.

    This is the third leg of the mergeable-sketch surface (KMV
    cardinality, salted heavy-hitters, CMS frequency): at 100 TB the
    grid build is the whole story — groupBy(d, bucket) has a FIXED
    {d}*{w}-key space, so the map-side partial aggregate is a
    constant-size array per task regardless of vocabulary size, the
    exchange carries at most tasks*{d}*{w} rows, and grids from
    disjoint corpus shards merge by cell-wise addition (same groupBy).
    Contrast with the exact (t, count) word-count whose agg map grows
    with |V|.  The probe side is {p} rows x {d} cells joined against a
    broadcast 2048-row grid.  The oracle rebuilds the identical grid in
    DuckDB from the same md5 windows — engine-portable by construction.
    """.format(d=CMS_D, w=CMS_W, p=CMS_PROBES)
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "").alias("ts")
    ).where(F.size("ts") >= 2)
    # bigram built inline at the explode site (single consumer of the
    # transform array — the measured-faster layout; see curation ops)
    stream = base.select(
        F.explode(
            F.expr("transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))")
        ).alias("t")
    ).select("t", F.md5("t").alias("dig"))

    cell_pairs = F.transform(
        F.sequence(F.lit(0), F.lit(CMS_D - 1)),
        lambda d: F.struct(
            d.cast("long").alias("d"),
            (F.conv(F.substring("dig", d * 8 + 1, 8), 16, 10).cast("long") % CMS_W).alias("bucket"),
        ),
    )
    cells = (
        stream.select(F.explode(cell_pairs).alias("x"))
        .groupBy(F.col("x.d").alias("d"), F.col("x.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        stream.groupBy("t")
        .agg(F.any_value("dig").alias("dig"), F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"), "t")
        .limit(CMS_PROBES)
    )
    probe = exact.select(
        "t", "exact",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(CMS_D - 1)),
                lambda d: F.struct(
                    d.cast("long").alias("d"),
                    (F.conv(F.substring("dig", d * 8 + 1, 8), 16, 10).cast("long") % CMS_W).alias("bucket"),
                ),
            )
        ).alias("x"),
    ).select("t", "exact", F.col("x.d").alias("d"), F.col("x.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy(F.col("t").alias("tok"))
        .agg(F.any_value("exact").alias("exact"), F.min("c").cast("long").alias("est"))
    )
