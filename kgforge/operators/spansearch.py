"""Mention-span extraction over documents — the highlight-path kernels
(SURVEY.md §2.3 T3/T4) wired to a real data path:

- T3 span finder: all case-insensitive exact-match occurrences of each
  query word (/root/reference/experiments/search_highlight.py:95-112)
- T4 span merge: overlapping/adjacent spans coalesced
  (/root/reference/experiments/search_highlight.py:69-83)

The Spark side runs the pure-Python kernels from kgforge/functions/spans.py
inside an Arrow-batched mapInPandas (the UDF shape a subword/NER
highlighter would use); the DuckDB oracle re-derives the SAME merged spans
relationally — brute substring scan for T3, gaps-and-islands windowing for
T4 — so the kernel semantics are cross-checked engine-to-engine, not just
property-tested.

Spans are emitted stringified ("start:end;start:end", end-exclusive)
because the driver's canonicalizer cannot hash array columns; the
array<struct<start,end>> form is the library function ``doc_spans``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import spans as spanlib
from .registry import query, table

SPAN_TERMS = ("spark", "join", "window", "fast")

DOC_SPANS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("start", IntegerType(), False),
                        StructField("end", IntegerType(), False),
                    ]
                ),
                False,
            ),
            False,
        ),
    ]
)


def doc_spans(docs: DataFrame, terms=SPAN_TERMS) -> DataFrame:
    """documents -> (doc_id, spans: array<struct<start,end>>), merged,
    only docs with at least one match.  The kernel is pure CPU per row;
    the only data movement is the Arrow batch."""
    words = list(terms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                merged = spanlib.find_spans(text, words)
                if merged:
                    ids.append(doc_id)
                    out.append([{"start": s, "end": e} for s, e in merged])
            yield pd.DataFrame({"doc_id": ids, "spans": out})

    return docs.select("doc_id", "text").mapInPandas(run, schema=DOC_SPANS_SCHEMA)


_SQL_TERM_VALUES = ", ".join(f"('{t}')" for t in SPAN_TERMS)

# T3 in SQL: every start offset i where the lowered text contains the term
# — the same self-overlap-inclusive set the kernel's lookahead finditer
# produces (see functions/spans.py:find_spans).  T4 in SQL:
# gaps-and-islands — a new island starts when s exceeds the running max end
# of preceding spans + 1; islands collapse to (min s, max e).
_SQL_MERGED_CTE = rf"""
with hits as (
  select doc_id, s, s + length(term) as e
  from (
    select d.doc_id, t.term,
           unnest(list_filter(range(length(d.lo) - length(term) + 1),
                              i -> substr(d.lo, (i + 1)::INT, length(term)) = term)) as s
    from (select doc_id, lower(text) as lo from documents) d,
         (values {_SQL_TERM_VALUES}) t(term)
  )
),
brk as (
  select doc_id, s, e,
         case when s > coalesce(max(e) over (
                  partition by doc_id order by s, e
                  rows between unbounded preceding and 1 preceding), -2) + 1
              then 1 else 0 end as is_new
  from hits
),
grp as (
  select doc_id, s, e,
         sum(is_new) over (partition by doc_id order by s, e
                           rows unbounded preceding) as g
  from brk
),
merged as (select doc_id, min(s) as s, max(e) as e from grp group by doc_id, g)
"""

_SQL_MENTION_SPANS = (
    _SQL_MERGED_CTE
    + """
select doc_id, count(*)::BIGINT as n_spans,
       string_agg(s || ':' || e, ';' order by s) as spans_csv
from merged group by doc_id
"""
)


# The matched subword-piece set: every fixed-width piece of every query
# term (prefix-stripped), shared by the Spark kernel and the SQL oracle.
MATCH_PIECES = tuple(
    sorted(
        {
            p.removeprefix("##")
            for t in SPAN_TERMS
            for p in spanlib.wordpiece_ish(t)[0]
        }
    )
)
_SQL_PIECES = "[" + ", ".join(f"'{p}'" for p in MATCH_PIECES) + "]"

# The subword-highlight chain is SQL-expressible because the repair step's
# semantics collapse: every matched piece extends to its WHOLE word's token
# span (wordpiece_ish guarantees word-initial pieces are unprefixed), and
# merge_spans runs in TOKEN index space where consecutive words are always
# adjacent — so matched words merge iff they are consecutive words of the
# document, and each merged run maps to (first word's char start, last
# word's char end).  The oracle derives exactly that relationally:
#   1. explode chars, keep \w chars, first gaps-and-islands pass -> words
#      with char offsets and a per-doc word index k;
#   2. a word matches iff any of its fixed-width-4 pieces is in the piece
#      set (list_filter over chunk starts — the wordpiece_ish chunking);
#   3. second islands pass over consecutive matched word indices ->
#      merged char spans.
_SQL_SUBWORD_SPANS = rf"""
with d as (select doc_id, lower(text) as lo from documents),
chars as (select doc_id, unnest(range(length(lo))) as i, lo from d),
wchars as (
  select doc_id, i
  from (select doc_id, i, substr(lo, (i+1)::INT, 1) as ch from chars)
  where regexp_matches(ch, '[A-Za-z0-9_]')
),
words as (
  select doc_id, min(i)::INT as ws, (max(i)+1)::INT as we,
         row_number() over (partition by doc_id order by min(i)) as k
  from (select doc_id, i,
               i - row_number() over (partition by doc_id order by i) as g
        from wchars)
  group by doc_id, g
),
matched as (
  select w.doc_id, w.ws, w.we, w.k
  from words w join d using (doc_id)
  where len(list_filter(
          range((w.we - w.ws + 3) // 4),
          j -> list_contains({_SQL_PIECES},
                             substr(substr(d.lo, w.ws + 1, w.we - w.ws),
                                    (j * 4 + 1)::INT, 4)))) > 0
),
islands as (
  select doc_id, min(ws) as s, max(we) as e
  from (select doc_id, ws, we,
               k - row_number() over (partition by doc_id order by k) as g2
        from matched)
  group by doc_id, g2
)
select doc_id, count(*)::BIGINT as n_spans,
       string_agg(s || ':' || e, ';' order by s) as spans_csv
from islands group by doc_id
"""


@query("subword_highlight_spans", oracle=_SQL_SUBWORD_SPANS)
def subword_highlight_spans(spark, sf_dir):
    """T5+T6 data path: subword tokenize each document (deterministic
    wordpiece stand-in), match pieces of the query terms, repair matches
    across '##' continuations to whole-word token spans, and map token
    spans to char spans — the highlight_llm chain of
    /root/reference/experiments/search_highlight.py:114-163 with the model
    swapped for the deterministic tokenizer.  The oracle re-derives the
    merged spans relationally (see _SQL_SUBWORD_SPANS), hard-gating the
    subword kernels (repair_subword_spans, tokens_to_char_span) that were
    rows-only through round 2."""
    match_pieces = set(MATCH_PIECES)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, csvs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                tokens, offsets = spanlib.wordpiece_ish(text.lower())
                matched = [
                    i for i, t in enumerate(tokens) if t.removeprefix("##") in match_pieces
                ]
                if not matched:
                    continue
                tok_spans = spanlib.repair_subword_spans(tokens, matched)
                char_spans = [spanlib.tokens_to_char_span(offsets, s) for s in tok_spans]
                ids.append(doc_id)
                ns.append(len(char_spans))
                csvs.append(";".join(f"{s}:{e}" for s, e in char_spans))
            yield pd.DataFrame({"doc_id": ids, "n_spans": ns, "spans_csv": csvs})

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_spans", LongType(), False),
            StructField("spans_csv", StringType(), False),
        ]
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(run, schema=schema)


@query("mention_spans", oracle=_SQL_MENTION_SPANS)
def mention_spans(spark, sf_dir):
    """T3+T4 over documents: merged query-term mention spans, stringified
    for the driver's hash compare.  The Spark side is the spans.py kernel
    in mapInPandas; the oracle is an independent relational derivation
    (substring scan + gaps-and-islands)."""
    ds = doc_spans(table(spark, sf_dir, "documents"))
    return ds.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.array_join(
            F.transform(
                "spans",
                lambda sp: F.concat_ws(":", sp["start"].cast("string"), sp["end"].cast("string")),
            ),
            ";",
        ).alias("spans_csv"),
    )


# ------------------------------------------------- T8/T9: highlight render
# T8 (/root/reference/experiments/search_highlight.py:43-67
# spans_to_highlight_list): merged char spans -> alternating
# plain/highlighted segments; a plain segment is emitted only when there is
# a gap (start > last_end), the trailing remainder only when the last span
# stops short of the text.  T9 (:185-238 terminal_highlight_print): wrap
# each highlighted chunk in the ANSI color pair and concatenate — defaults
# color='black' (30) on background='bright_white' (107), reset \033[0m.
# Pure per-row column logic on top of doc_spans (T3+T4); the only exchange
# is the doc_id equi-join back to the text column.

ANSI_COLOR_BLACK = 30  # reference ansi_color_codes['black']
ANSI_BG_BRIGHT_WHITE = 107  # reference ansi_background_codes['bright_white']
_ESC = "\x1b"


def _segments_col(text, spans):
    """array<struct<text,highlight>> per the reference's alternating walk."""
    # per span i (0-based): optional plain gap [prev_end, start) + the
    # highlighted [start, end); prev_end = spans[i-1].end (element_at is
    # 1-based, so element_at(spans, i) IS the previous span).
    per_span = F.transform(
        spans,
        lambda sp, i: F.filter(
            F.array(
                F.struct(
                    text.substr(
                        F.when(i == 0, F.lit(0)).otherwise(F.element_at(spans, i)["end"]) + 1,
                        sp["start"]
                        - F.when(i == 0, F.lit(0)).otherwise(F.element_at(spans, i)["end"]),
                    ).alias("text"),
                    F.lit(False).alias("highlight"),
                ),
                F.struct(
                    text.substr(sp["start"] + 1, sp["end"] - sp["start"]).alias("text"),
                    F.lit(True).alias("highlight"),
                ),
            ),
            lambda seg: seg["text"] != "",
        ),
    )
    last_end = F.element_at(spans, -1)["end"]
    tail = F.when(
        last_end < F.length(text),
        F.array(
            F.struct(
                text.substr(last_end + 1, F.length(text) - last_end).alias("text"),
                F.lit(False).alias("highlight"),
            )
        ),
    ).otherwise(F.expr("array()").cast("array<struct<text:string,highlight:boolean>>"))
    return F.concat(F.flatten(per_span), tail)


def _segments_df(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    ds = doc_spans(docs)
    joined = ds.join(docs.select("doc_id", "text"), "doc_id")
    return joined.select(
        "doc_id", _segments_col(F.col("text"), F.col("spans")).alias("segs")
    )


_SQL_SEGMENTS_CTE = (
    _SQL_MERGED_CTE
    + """,
seq as (
  select m.doc_id, m.s, m.e, d.text,
         coalesce(lag(m.e) over (partition by m.doc_id order by m.s), 0) as pe,
         row_number() over (partition by m.doc_id order by m.s) as rn
  from merged m join documents d on d.doc_id = m.doc_id
),
rawsegs as (
  select doc_id, rn * 2 - 1 as ord, substr(text, pe + 1, s - pe) as seg_text,
         false as highlight
  from seq where s > pe
  union all
  select doc_id, rn * 2, substr(text, s + 1, e - s), true from seq
  union all
  select t.doc_id, t.max_rn * 2 + 1, substr(d.text, t.last_e + 1), false
  from (select doc_id, max(e) as last_e, max(rn) as max_rn from seq group by doc_id) t
  join documents d on d.doc_id = t.doc_id
  where t.last_e < length(d.text)
),
segs as (
  select doc_id,
         row_number() over (partition by doc_id order by ord) as seg,
         seg_text, highlight, ord
  from rawsegs
)
"""
)


@query(
    "highlight_segments",
    oracle=_SQL_SEGMENTS_CTE
    + """
select doc_id, seg::BIGINT as seg, seg_text, highlight from segs
""",
)
def highlight_segments(spark, sf_dir):
    """T8: merged mention spans -> the alternating plain/highlighted
    segment list, one row per segment with its list position."""
    segs = _segments_df(spark, sf_dir)
    return segs.select("doc_id", F.posexplode("segs").alias("pos", "seg_s")).select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("seg"),
        F.col("seg_s.text").alias("seg_text"),
        F.col("seg_s.highlight").alias("highlight"),
    )


@query(
    "ansi_highlight_render",
    oracle=_SQL_SEGMENTS_CTE
    + f"""
select doc_id,
       string_agg(
         case when highlight
              then chr(27) || '[{ANSI_COLOR_BLACK};{ANSI_BG_BRIGHT_WHITE}m'
                   || seg_text || chr(27) || '[0m'
              else seg_text end,
         '' order by ord) as rendered
from segs group by doc_id
""",
)
def ansi_highlight_render(spark, sf_dir):
    """T9: the terminal render string — every highlighted chunk wrapped in
    the reference's default ANSI pair (black on bright_white), reset after
    each chunk, all segments concatenated in order."""
    on = F.lit(f"{_ESC}[{ANSI_COLOR_BLACK};{ANSI_BG_BRIGHT_WHITE}m")
    off = F.lit(f"{_ESC}[0m")
    segs = _segments_df(spark, sf_dir)
    rendered = F.array_join(
        F.transform(
            "segs",
            lambda seg: F.when(
                seg["highlight"], F.concat(on, seg["text"], off)
            ).otherwise(seg["text"]),
        ),
        "",
    )
    return segs.select("doc_id", rendered.alias("rendered"))
