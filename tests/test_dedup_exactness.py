"""Differential exactness tests for the theorem-based blocking queries:
the prefix-filtered Jaccard join and the pigeonhole SimHash join must equal
the BRUTE-FORCE all-pairs answer exactly — recall 1.0 (the theorem) and
precision 1.0 (the verify step) on a real corpus, plus a crafted pair
sitting exactly ON the Jaccard threshold (the boundary the proof's
ceil() has to get right)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from kgforge.operators import registry
import kgforge.operators as ops
from kgforge.operators.dedup import HD_MAX, JACCARD_THRESHOLD

ops.load_all()


def _shingles(text: str) -> frozenset[str]:
    ts = [t for t in re.split(r"\W+", text.lower()) if t]
    if len(ts) >= 3:
        return frozenset(" ".join(ts[j : j + 3]) for j in range(len(ts) - 2))
    return frozenset([" ".join(ts)])


def test_ngram_jaccard_equals_bruteforce(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sh = {r.doc_id: _shingles(r.text) for r in docs.itertuples()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = inter / len(sh[a] | sh[b])
            if j >= JACCARD_THRESHOLD:
                want[(a, b)] = j
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.QUERIES["ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, j in want.items():
        assert got[k] == pytest.approx(j, abs=1e-4)


def test_simhash_near_dups_equals_bruteforce(spark, sf_dir):
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in registry.QUERIES["simhash"](spark, sf_dir).collect()
    }
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= HD_MAX:
                want[(a, b)] = h
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in registry.QUERIES["simhash_near_dups"](spark, sf_dir).collect()
    }
    assert got == want


def test_prefix_filter_threshold_boundary(spark, tmp_path):
    """A pair whose Jaccard is EXACTLY the threshold must be found: with
    t=0.5, shingle sets {abc, bcd} vs {abc} give 1/2.  The 3-token doc
    keeps a 1-shingle prefix (n - ceil(t*n) + 1 = 1) — an off-by-one in
    the ceil would silently drop boundary pairs."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d", "a b c", "x y z w"],
            "lang": ["en"] * 3,
            "source": ["synthetic"] * 3,
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = registry.QUERIES["ngram_jaccard_pairs"](spark, str(tmp_path)).collect()
    assert {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows} == {(1, 2, 0.5)}
