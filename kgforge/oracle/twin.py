"""Pure-pandas reference twin of the KG pipeline (SURVEY.md §5.2).

Re-implements the exact pipeline semantics — lex -> entities -> embed ->
EXACT all-pairs cosine linking -> union-find canonicalization -> triples —
with no Spark, the way the reference itself validates (differential
comparison against an independent implementation,
/root/reference/experiments/uaz_documents_comparison.py:222-275).  It
shares ``kgforge.lexer`` and the ``kgforge.constants`` embedding kernels
with the pipeline, so any P/R gap isolates to the distributed plan
(LSH recall, join/canonicalization logic), never to drifted constants.

The linker here is the reference's own O(N^2) semantics
(/root/reference/search/bert_search.py:176-181); the pipeline's LSH-blocked
join must reproduce its triple set at P/R >= 0.95 (north_rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .. import constants, lexer
from ..stages.embed import KIND_TO_ETYPE

_KIND_PRED = {
    "import": constants.PRED_IMPORTS,
    "class": constants.PRED_DEFINES,
    "function": constants.PRED_DEFINES,
    "call": constants.PRED_CALLS,
}


def twin_mentions(files: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in files.itertuples(index=False):
        sha = hashlib.sha256(r.content.encode("utf-8")).hexdigest()
        for kind, name, line in lexer.lex(r.lang, r.path, r.content):
            rows.append((r.repo, r.path, r.commit, r.lang, sha, kind, name, line))
    return pd.DataFrame(
        rows,
        columns=["repo", "path", "commit", "lang", "content_sha256", "kind", "name", "line"],
    )


def twin_entities(mentions: pd.DataFrame) -> pd.DataFrame:
    e = mentions.assign(kind=mentions["kind"].map(KIND_TO_ETYPE))[["kind", "name"]].drop_duplicates()
    e["entity_id"] = e["kind"] + ":" + e["name"]
    return e.reset_index(drop=True)


def twin_links(entities: pd.DataFrame, threshold: float = constants.LINK_THRESHOLD) -> pd.DataFrame:
    """Exact all-pairs same-kind cosine — the ground-truth linker."""
    out = []
    for kind, grp in entities.groupby("kind"):
        if kind not in constants.LINK_KINDS:
            continue
        names = grp["name"].tolist()
        ids = grp["entity_id"].tolist()
        mat = constants.embed_batch(names)
        sims = mat @ mat.T
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out.append((a, b, float(sims[i, j])))
    return pd.DataFrame(out, columns=["a", "b", "score"])


def twin_canonical(links: pd.DataFrame) -> dict[str, str]:
    """Union-find; representative = lexicographic min of the component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(links["a"], links["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in list(parent) if find(x) != x}


def twin_triples(files: pd.DataFrame, threshold: float = constants.LINK_THRESHOLD) -> pd.DataFrame:
    mentions = twin_mentions(files)
    entities = twin_entities(mentions)
    links = twin_links(entities, threshold)
    canon = twin_canonical(links)

    m = mentions[mentions["kind"] != "module"].copy()
    m["pred"] = m["kind"].map(_KIND_PRED)
    m["obj_raw"] = m["kind"].map(KIND_TO_ETYPE) + ":" + m["name"]
    m["obj"] = m["obj_raw"].map(lambda e: canon.get(e, e))
    m["subj"] = m["repo"] + ":" + m["path"]
    m["score"] = 1.0
    # evidence is the NUMERIC-min line (first occurrence), matching the
    # pipeline's normalized triples schema (schemas.TRIPLES: line int,
    # NULL on same_as rows).
    lexical = (
        m.groupby(["subj", "pred", "obj"], as_index=False)
        .agg(line=("line", "min"), score=("score", "max"))
    )
    lexical = lexical[["subj", "pred", "obj", "line", "score"]]

    same = pd.DataFrame(
        [(e, constants.PRED_SAME_AS, c, None, 1.0) for e, c in sorted(canon.items())],
        columns=["subj", "pred", "obj", "line", "score"],
    )
    return pd.concat([lexical, same], ignore_index=True)


def precision_recall(got: pd.DataFrame, want: pd.DataFrame) -> tuple[float, float]:
    """P/R over (subj, pred, obj) key sets — the triple-set comparison shape
    of /root/reference/experiments/uaz_documents_comparison.py:264-271."""
    g = set(map(tuple, got[["subj", "pred", "obj"]].itertuples(index=False)))
    w = set(map(tuple, want[["subj", "pred", "obj"]].itertuples(index=False)))
    if not g or not w:
        return (float(not w), float(not g)) if (not g and not w) else (0.0, 0.0)
    inter = len(g & w)
    return inter / len(g), inter / len(w)
