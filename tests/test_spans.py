"""Subword span kernels (T5/T6) unit tests against the reference's
documented semantics (/root/reference/experiments/search_highlight.py:
133-163)."""

from __future__ import annotations

from kgforge.functions import spans


def test_wordpiece_ish_roundtrip():
    text = "streaming aggregation is fast"
    tokens, offsets = spans.wordpiece_ish(text, piece=4)
    # every token's offsets slice the original text back (sans ## prefix)
    for t, (s, e) in zip(tokens, offsets):
        assert text[s:e] == t.removeprefix("##")
    # continuations are exactly the non-word-initial pieces
    assert tokens[0] == "stre" and tokens[1] == "##amin" and tokens[2] == "##g"


def test_repair_extends_continuations_both_ways():
    tokens = ["stre", "##amin", "##g", "fast", "agg", "##rega", "##tion"]
    # matched the MIDDLE continuation of 'streaming'
    assert spans.repair_subword_spans(tokens, [1]) == [(0, 2)]
    # matched a word-initial piece extends forward only
    assert spans.repair_subword_spans(tokens, [4]) == [(4, 6)]
    # plain word stays itself
    assert spans.repair_subword_spans(tokens, [3]) == [(3, 3)]
    # adjacent repaired spans merge (step 2)
    assert spans.repair_subword_spans(tokens, [1, 3, 5]) == [(0, 6)]


def test_repair_at_sequence_start():
    # a malformed leading continuation must not underflow
    tokens = ["##odd", "word"]
    assert spans.repair_subword_spans(tokens, [0]) == [(0, 0)]


def test_tokens_to_char_span():
    text = "alpha beta gamma"
    tokens, offsets = spans.wordpiece_ish(text, piece=3)
    # 'alpha' -> pieces alp/##ha at offsets (0,3)(3,5)
    span = spans.repair_subword_spans(tokens, [1])[0]
    assert spans.tokens_to_char_span(offsets, span) == (0, 5)
    assert text[0:5] == "alpha"


def test_subword_query_runs(spark, sf_dir):
    from kgforge.operators.spansearch import subword_highlight_spans

    rows = subword_highlight_spans(spark, sf_dir).limit(5).collect()
    for r in rows:
        assert r["n_spans"] >= 1
        for part in r["spans_csv"].split(";"):
            s, e = part.split(":")
            assert int(s) < int(e)
