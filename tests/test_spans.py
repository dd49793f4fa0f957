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


def test_highlight_render_matches_reference_algorithm(spark, sf_dir):
    """T8/T9 differential: the reference's spans_to_highlight_list and
    terminal print wrapping (/root/reference/experiments/search_highlight.py
    :43-67, :228-238), re-implemented verbatim, run over the same docs and
    merged spans as the operators."""
    from kgforge.operators import spansearch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ds = {r["doc_id"]: r["spans"] for r in spansearch.doc_spans(docs).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
        if r["doc_id"] in ds
    }

    def ref_highlight_list(text, spans):  # verbatim :43-67
        spans = sorted(spans, key=lambda x: x[0])
        out, last_end = [], 0
        for start, end in spans:
            if start > last_end:
                out.append({"text": text[last_end:start], "highlight": False})
            out.append({"text": text[start:end], "highlight": True})
            last_end = end
        if last_end < len(text):
            out.append({"text": text[last_end:], "highlight": False})
        return out

    expected_segs = {
        d: ref_highlight_list(texts[d], [(sp["start"], sp["end"]) for sp in ds[d]])
        for d in ds
    }
    got = {}
    for r in (
        spansearch.highlight_segments(spark, f"{sf_dir}").collect()
    ):
        got.setdefault(r["doc_id"], []).append(
            (r["seg"], r["seg_text"], r["highlight"])
        )
    assert set(got) == set(expected_segs)
    for d, exp in expected_segs.items():
        ours = [(t, h) for _, t, h in sorted(got[d])]
        assert ours == [(e["text"], e["highlight"]) for e in exp], d

    # T9: the print-stream analog (color=black on bright_white, reset each
    # chunk, trailing newline omitted — the operator returns the string)
    def ref_render(segs):
        return "".join(
            f"\033[30;107m{s['text']}\033[0m" if s["highlight"] else s["text"]
            for s in segs
        )

    rendered = {
        r["doc_id"]: r["rendered"]
        for r in spansearch.ansi_highlight_render(spark, f"{sf_dir}").collect()
    }
    assert rendered == {d: ref_render(e) for d, e in expected_segs.items()}
