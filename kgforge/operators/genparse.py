"""T7: the numbered-list answer parser from the causal-recommender chain.

Reference: /root/reference/experiments/causal_recommender.py:28-48
(``extract_causes``): strip the prompt from the generated text but keep the
leading "1.", split lines, trim, drop blanks, take lines WHILE
``re.search(r'\\d\\.', line)`` matches (anywhere in the line, not anchored),
then ``re.sub(r'\\d\\.', '', line)`` (removes EVERY digit-dot occurrence)
and keep non-empty remainders.  Both quirks are reproduced, not fixed:
a "12. x" line survives the take-while but parses to "1 x", and the
take-while breaks at the first line with no digit-dot anywhere (the model
re-asking the question).

Only the GPT-2 *generation* is out of scope (V10); the parser itself is
deterministic column logic.  The generated text is synthesized per doc in
lockstep Spark/DuckDB expressions, with four variants exercising every
branch: well-formed list + re-asked-question break, mid-list pattern
break, the double-digit sub quirk, and a numbered-but-empty line (skipped
by the ``if line`` branch).  tests/test_genparse.py additionally
differentials the operator against the reference's own Python
``extract_causes`` on the same rows.

Scale note: one map-only pass (tokenize, build, parse, posexplode) — no
exchange at all; at 100 TB this parallelizes per input split like every
other map stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query, table

_NL = "\n"


def _tok(ts, i: int):
    # 1-based token access with a deterministic fallback for short docs
    return F.coalesce(F.element_at(ts, i), F.lit(f"w{i}"))


def _gen_rows(docs):
    """(doc_id, prompt, output): the synthesized generation per doc."""
    ts = F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
    base = docs.select("doc_id", ts.alias("ts"))
    t = lambda i: _tok(F.col("ts"), i)  # noqa: E731
    prompt = F.concat(F.lit("what are 3 causes of "), t(1), F.lit("?" + _NL + "1."))
    v = F.col("doc_id") % 4
    tail = (
        F.when(
            v == 0,
            F.concat(
                F.lit(" "), t(2), F.lit(" "), t(3),
                F.lit(_NL + "2. "), t(4),
                F.lit(_NL + "3. "), t(5),
                F.lit(_NL + "what are 3 causes of "), t(6), F.lit("?"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit(" "), t(2),
                F.lit(_NL + "2. "), t(3),
                F.lit(_NL + "and then some" + _NL + "3. "), t(4),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit(" "), t(2),
                F.lit(_NL + "12. "), t(3), F.lit(" "), t(4),
                F.lit(_NL + "3. "), t(5),
            ),
        )
        .otherwise(F.concat(F.lit(" "), t(2), F.lit(_NL + "2." + _NL + "3. "), t(3)))
    )
    return base.select(
        "doc_id", prompt.alias("prompt"), F.concat(prompt, tail).alias("output")
    )


def parse_numbered_list(gen):
    """(doc_id, prompt, output) -> (doc_id, rank, cause), the exact
    reference algorithm as column expressions."""
    stripped = F.expr("substring(output, length(prompt) - 1)")
    lines = F.filter(
        F.transform(F.split(stripped, _NL), lambda l: F.trim(l)), lambda l: l != ""
    )
    base = gen.select("doc_id", lines.alias("lines"))
    # take-while re.search(r'\d\.'): position of the first NON-matching line
    brk = F.array_position(
        F.transform("lines", lambda l: l.rlike(r"\d\.")), F.lit(False)
    )
    prefix = F.when(brk > 0, F.slice("lines", 1, (brk - 1).cast("int"))).otherwise(
        F.col("lines")
    )
    cleaned = F.filter(
        F.transform(prefix, lambda l: F.trim(F.regexp_replace(l, r"\d\.", ""))),
        lambda c: c != "",
    )
    return base.select("doc_id", F.posexplode(cleaned).alias("pos", "cause")).select(
        "doc_id", (F.col("pos") + 1).cast("int").alias("rank"), "cause"
    )


_SQL_GEN = r"""
select doc_id,
       'what are 3 causes of ' || t1 || '?' || chr(10) || '1.' as prompt,
       'what are 3 causes of ' || t1 || '?' || chr(10) || '1.' ||
       case doc_id % 4
         when 0 then ' ' || t2 || ' ' || t3 || chr(10) || '2. ' || t4 ||
                     chr(10) || '3. ' || t5 || chr(10) ||
                     'what are 3 causes of ' || t6 || '?'
         when 1 then ' ' || t2 || chr(10) || '2. ' || t3 || chr(10) ||
                     'and then some' || chr(10) || '3. ' || t4
         when 2 then ' ' || t2 || chr(10) || '12. ' || t3 || ' ' || t4 ||
                     chr(10) || '3. ' || t5
         else ' ' || t2 || chr(10) || '2.' || chr(10) || '3. ' || t3
       end as output
from (
  select doc_id,
         coalesce(ts[1], 'w1') as t1, coalesce(ts[2], 'w2') as t2,
         coalesce(ts[3], 'w3') as t3, coalesce(ts[4], 'w4') as t4,
         coalesce(ts[5], 'w5') as t5, coalesce(ts[6], 'w6') as t6
  from (select doc_id,
               list_filter(regexp_split_to_array(lower(text), '\W+'),
                           t -> t <> '') as ts
        from documents)
)
"""


@query(
    "numbered_list_parse",
    oracle=rf"""
    with gen as ({_SQL_GEN}),
    parsed as (
      select doc_id,
             list_filter(
               list_transform(
                 string_split(substr(output, length(prompt) - 1), chr(10)),
                 l -> trim(l)),
               l -> l <> '') as lines
      from gen
    ),
    cut as (
      select doc_id,
             case when brk is not null then lines[1:brk - 1] else lines end as pre
      from (select doc_id, lines,
                   list_position(
                     list_transform(lines, l -> regexp_matches(l, '\d\.')),
                     false) as brk
            from parsed)
    ),
    cleaned as (
      select doc_id,
             list_filter(
               list_transform(pre, l -> trim(regexp_replace(l, '\d\.', '', 'g'))),
               c -> c <> '') as causes
      from cut
    )
    select doc_id, j::INTEGER as rank, causes[j] as cause
    from cleaned, unnest(range(1, len(causes) + 1)) as r(j)
    """,
)
def numbered_list_parse(spark, sf_dir):
    """T7: parse numbered-list answers out of (synthesized) generations —
    one cause row per surviving line, ranks preserving list order."""
    return parse_numbered_list(_gen_rows(table(spark, sf_dir, "documents")))
