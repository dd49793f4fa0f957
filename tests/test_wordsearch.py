"""Word-level neural search tests.

``word_search_vec`` (dense hashed n-gram token embeddings) is differentialed
against a reference-style numpy implementation that builds the full
[T_q, T_d] similarity matrix per document exactly as
/root/reference/search/bert_search.py:91-110 does — sum over doc tokens for
tf, max-then-sum across docs for idf, sum(tf * log2(idf)) for the score.
The oracle-green trigram family is covered by tests/test_oracles.py.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgforge import constants
from kgforge.operators import wordsearch


def _tokenize(text: str) -> list[str]:
    return [t for t in re.split(r"\W+", text.lower()) if t]


def numpy_word_scores(texts: dict[int, str], query_terms) -> dict[int, float]:
    """Reference-style tensor computation (per doc: [T_q, T_d] sims)."""
    qmat = constants.embed_batch(list(query_terms))  # [T_q, d], L2-normalized
    tf = {}
    mx = {}
    for doc_id, text in texts.items():
        toks = _tokenize(text)
        if not toks:
            continue
        dmat = constants.embed_batch(toks)  # [T_d, d]
        sims = qmat @ dmat.T  # [T_q, T_d]
        tf[doc_id] = sims.sum(axis=1)  # A6
        mx[doc_id] = sims.max(axis=1)  # A7 inner
    n_docs = len(texts)
    denom = np.sum([m for m in mx.values()], axis=0)  # A7 outer
    idf = n_docs / denom
    return {
        d: float((tf[d] * np.log2(idf)).sum())  # A8
        for d in tf
    }


@pytest.fixture(scope="module")
def docs_texts(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return {int(r["doc_id"]): r["text"] for r in rows}


def test_word_search_vec_matches_tensor_reference(spark, sf_dir, docs_texts):
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in wordsearch.word_search_vec(spark, sf_dir).collect()
    }
    want_all = numpy_word_scores(docs_texts, wordsearch.QUERY_TERMS)
    want_top = dict(
        sorted(want_all.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[: wordsearch.TOPK]
    )
    assert set(got) == set(want_top)
    for d, s in got.items():
        assert abs(s - want_top[d]) < 1e-3, (d, s, want_top[d])


def test_token_embeddings_table_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    te = wordsearch.token_embeddings(docs)
    rows = te.collect()
    assert {c for c in te.columns} == {"doc_id", "token_pos", "term", "vec"}
    assert all(len(r["vec"]) == constants.EMBED_DIM for r in rows)
    # position-explosion is dense: every doc's positions are 0..T_d-1
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["token_pos"])
    for d, ps in by_doc.items():
        assert sorted(ps) == list(range(len(ps))), d
    # the vec for a term matches the shared deterministic embedder
    r0 = rows[0]
    np.testing.assert_allclose(
        np.array(r0["vec"], dtype=np.float32),
        constants.embed_text(r0["term"]),
        rtol=1e-6,
    )


def test_vocab_embedded_once(spark, sf_dir):
    """The scale contract: the Python boundary sees the VOCAB, not every
    token position (embedding fan-in happens before the UDF)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    te = wordsearch.token_embeddings(docs)
    plan = te._jdf.queryExecution().optimizedPlan().toString()
    # the UDF's child must aggregate/distinct on term, not scan positions
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
    n_positions = te.count()
    n_vocab = te.select("term").distinct().count()
    assert n_vocab < n_positions
