"""Twin-derived oracle fixtures for the four ``pipeline_*`` driver queries.

The KG pipeline's connected-components stage is iterative (not
SQL-expressible), so its driver oracle cannot be a DuckDB query over the
input tables.  Instead, the pure-pandas reference twin (oracle/twin.py — the
independent implementation the P/R gate differentials against,
/root/reference/experiments/uaz_documents_comparison.py:222-275 pattern)
computes the EXPECTED output of every stage for the deterministic synthetic
corpus, and this module materializes those outputs as parquet fixtures that
the registered DuckDB oracles simply ``read_parquet``.  That converts the
flagship pipeline from a rows-only driver check into the same hard
row/schema/value-hash gate every other query gets.

Fixtures are committed under ``<repo>/fixtures/`` and guarded against drift
by tests/test_twin_fixtures.py, which regenerates them from the twin and
asserts frame equality (so a constants/lexer change that silently shifts
pipeline semantics fails the suite until the fixtures are re-generated with
``python -m kgforge.oracle.fixtures``).

Rounding: scores are rounded at registry.ROUND decimals through the same
shortest-decimal-string HALF_UP path Spark's F.round uses
(constants.round_like_spark) — NOT binary half-away, which DuckDB's round()
uses and which disagrees with Spark on boundaries like 0.285.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from .. import constants, synth
from ..operators.registry import ROUND
from . import twin

# The corpus the pipeline_* queries run on (kgforge/operators/kgdocs.py).
SYNTH_N = 200

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures"
)

STAGES = ("mentions", "links", "entities", "triples")


def _round_away(s: pd.Series, nd: int = ROUND) -> pd.Series:
    """Vectorized constants.round_like_spark: fixture scores are compared
    EXACTLY against Spark F.round output, so they must round through the
    same shortest-decimal-string HALF_UP path Spark uses (0.285 -> 0.29,
    where binary half-away and DuckDB's round() both say 0.28)."""
    return s.astype("float64").map(lambda v: constants.round_like_spark(v, nd))


def twin_stage_tables(n_files: int = SYNTH_N) -> dict[str, pd.DataFrame]:
    """Expected (driver-comparable) output of every pipeline stage."""
    files = synth.synth_files_pdf(n_files)
    mentions = twin.twin_mentions(files)
    entities = twin.twin_entities(mentions)
    links = twin.twin_links(entities)
    canon = twin.twin_canonical(links)
    triples = twin.twin_triples(files)

    links_cmp = links.assign(score=_round_away(links["score"]))[["a", "b", "score"]]
    ents_cmp = pd.DataFrame(
        sorted(canon.items()), columns=["entity_id", "canonical_id"]
    )
    triples_cmp = triples.assign(
        score=_round_away(triples["score"]), line=triples["line"].astype("Int32")
    )
    # line stored as Int32 on BOTH fixture tables so DuckDB reads INTEGER,
    # matching Spark's IntegerType (schemas.MENTIONS/TRIPLES) if the
    # driver's compare is type-sensitive.
    mentions = mentions.assign(line=mentions["line"].astype("Int32"))
    return {
        "mentions": mentions.sort_values(list(mentions.columns), ignore_index=True),
        "links": links_cmp.sort_values(list(links_cmp.columns), ignore_index=True),
        "entities": ents_cmp,
        "triples": triples_cmp.sort_values(
            ["subj", "pred", "obj"], ignore_index=True
        ),
    }


def fixture_path(stage: str) -> str:
    return os.path.join(FIXTURE_DIR, f"twin_{stage}.parquet")


# ------------------------------------------------- word_search_vec sims
# The dense word-level search (operators/wordsearch.py word_search_vec)
# scores with cosines of the hashed n-gram embeddings, which DuckDB cannot
# recompute (seeded RandomState projections).  The twin precomputes the
# (term, q_term, sim) similarity table for the UNION of the sf0.001 and
# sf0.01 document vocabularies (a superset is safe: the oracle inner-joins
# it to the current corpus's token table, so extra terms never surface) and
# commits it as a fixture the DuckDB oracle read_parquet's; the A6/A7/A8
# aggregation chain then runs in SQL on top, giving the dense path the same
# hard driver gate as the trigram path.

WORD_SIMS_SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _spark_f4_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Bit-exact twin of the Spark expression
    aggregate(zip_with(vec, q_vec, x*y), 0.0D, s+v): elementwise products
    in FLOAT32 (both array<float> columns), accumulated LEFT-TO-RIGHT into
    a DOUBLE.  numpy's pairwise-summed sum() would differ in the last ulp,
    so the fold is an explicit Python loop."""
    prods = a.astype(np.float32) * b.astype(np.float32)
    s = 0.0
    for p in prods.tolist():  # tolist widens f4 -> Python float exactly
        s += p
    return s


def word_sims_table(sf_dirs=WORD_SIMS_SF_DIRS) -> pd.DataFrame:
    from ..operators.wordsearch import QUERY_TERMS

    terms: set[str] = set()
    for d in sf_dirs:
        for text in pd.read_parquet(
            os.path.join(d, "documents.parquet"), columns=["text"]
        )["text"]:
            terms.update(w for w in re.split(r"\W+", text.lower()) if w)
    vocab = sorted(terms)
    qvecs = {q: constants.embed_text(q) for q in QUERY_TERMS}
    rows = [
        (t, q, _spark_f4_dot(constants.embed_text(t), qv))
        for t in vocab
        for q, qv in qvecs.items()
    ]
    return pd.DataFrame(rows, columns=["term", "q_term", "sim"])


def word_sims_path() -> str:
    return os.path.join(FIXTURE_DIR, "word_sims.parquet")


# ------------------------------------------- fixed-width minhash hashes
# minhash_near_dup_pairs_fast (operators/dedup.py) carries shingles as
# xxhash64 longs end-to-end (no shingle strings, no hex slices — the
# measured allocation wall of the md5 kernel, BASELINE.md round 4), which
# DuckDB cannot recompute.  The pure-Python XXH64 twin (oracle/xxh64.py,
# differentialed against the live Spark expression in tests/test_xxh64.py)
# precomputes per distinct shingle the base hash and the 8 seed-derived
# minhash values for the UNION of the test-SF corpora; the DuckDB oracle
# rebuilds shingle STRINGS relationally, joins this fixture for the hash
# values, and replays banding + exact-Jaccard verification in SQL.
# Superset-safe for the same reason word_sims is (inner join prunes).

MINHASH_SEEDS = 8


def _shingle_hashes(sh: str) -> tuple[int, ...]:
    """base + 8 derived minhash values for one shingle-string fixture key.

    Mirrors the Spark kernel exactly: a 3-token shingle is the CHAINED
    xxhash64 of its three tokens (never concatenated); the degenerate
    <3-token whole-doc shingle is the hash of the joined string (which is
    what the kernel hashes for those docs).  Keying on the joined string
    is unambiguous because tokens are \\W+-split (no spaces inside)."""
    from .xxh64 import spark_xxhash64

    toks = sh.split(" ") if sh else [""]
    base = spark_xxhash64(*toks) if len(toks) == 3 else spark_xxhash64(sh)
    return (base, *(spark_xxhash64(base, ("int", g)) for g in range(MINHASH_SEEDS)))


def shingle_minhash_table(sf_dirs=WORD_SIMS_SF_DIRS) -> pd.DataFrame:
    shingles: set[str] = set()
    for d in sf_dirs:
        for text in pd.read_parquet(
            os.path.join(d, "documents.parquet"), columns=["text"]
        )["text"]:
            ts = [w for w in re.split(r"\W+", text.lower()) if w]
            if len(ts) >= 3:
                shingles.update(" ".join(ts[j : j + 3]) for j in range(len(ts) - 2))
            else:
                shingles.add(" ".join(ts))
    rows = [(s, *_shingle_hashes(s)) for s in sorted(shingles)]
    cols = ["sh", "base"] + [f"mh{g}" for g in range(MINHASH_SEEDS)]
    pdf = pd.DataFrame(rows, columns=cols)
    # the Spark kernel's set-Jaccard runs over base hashes while the oracle
    # counts shingle strings: equality of the two requires injectivity on
    # the fixture domain, asserted here and re-asserted by the drift test.
    assert pdf["base"].nunique() == len(pdf), "xxhash64 collision in fixture domain"
    return pdf


def shingle_minhash_path() -> str:
    return os.path.join(FIXTURE_DIR, "shingle_minhash.parquet")


def generate(out_dir: str = FIXTURE_DIR) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for stage, pdf in twin_stage_tables().items():
        pdf.to_parquet(os.path.join(out_dir, f"twin_{stage}.parquet"), index=False)
    word_sims_table().to_parquet(os.path.join(out_dir, "word_sims.parquet"), index=False)
    shingle_minhash_table().to_parquet(
        os.path.join(out_dir, "shingle_minhash.parquet"), index=False
    )


if __name__ == "__main__":
    generate()
    for s in STAGES:
        print(fixture_path(s), len(pd.read_parquet(fixture_path(s))))
    print(word_sims_path(), len(pd.read_parquet(word_sims_path())))
    print(shingle_minhash_path(), len(pd.read_parquet(shingle_minhash_path())))
