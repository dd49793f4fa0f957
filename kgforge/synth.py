"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates ``files(repo, path, commit, lang, content)`` rows where every
file's modules/classes/functions/imports/calls come from seeded pools, so
expected triples are computable by construction and the pandas twin can
re-derive them.  Row ``i`` is a pure function of ``(i, seed)`` — generation
is embarrassingly parallel and runs distributed via mapInPandas over
``spark.range`` (no driver-side materialization at scale).

Skew is built in per FIXTURES.md: one mega-repo holds ~30% of files and
python dominates, to exercise salting + AQE skew handling.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from . import constants

N_REPOS = 20
MEGA_REPO_SHARE = 0.30
PY_SHARE = 0.80

# Entity-name pools.  Variant clusters exercise embedding-based linking:
# names within a cluster are near-identical strings (cosine of their
# char-trigram embeddings is high), names across clusters are not.
_BASE_FUNCS = [
    "load_data", "parse_config", "build_index", "run_query", "merge_results",
    "write_output", "fetch_remote", "score_pairs", "rank_items", "chunk_text",
    "embed_batch", "hash_content", "filter_rows", "join_tables", "agg_counts",
    "sort_keys", "scan_files", "link_entities", "canonical_map", "emit_triples",
]
_VARIANT_SUFFIXES = ["", "_v2", "_impl"]
_BASE_CLASSES = [
    "DataLoader", "ConfigParser", "IndexBuilder", "QueryRunner", "ResultMerger",
    "OutputWriter", "RemoteFetcher", "PairScorer", "ItemRanker", "TextChunker",
]
_MODULES = [
    "os", "sys", "json", "math", "utils", "core", "engine", "index",
    "query", "storage", "net", "fmt",
]


def _rs(i: int, seed: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + i) & 0x7FFFFFFF)


def _repo_of(i: int, rs: np.random.RandomState) -> str:
    # mega-repo skew: ~30% of files land in org0/repo0.
    if rs.rand() < MEGA_REPO_SHARE:
        return "org0/repo0"
    r = rs.randint(1, N_REPOS)
    return f"org{r % 4}/repo{r}"


def _commit_of(repo: str) -> str:
    return hashlib.sha1(repo.encode()).hexdigest()  # 40-hex, constant per repo


def func_pool() -> list[str]:
    return [b + s for b in _BASE_FUNCS for s in _VARIANT_SUFFIXES]


_DOCWORDS = (
    "returns the merged result of the given input after applying the "
    "configured transformation and validation steps with optional retries"
).split()


def _docstring(rs: np.random.RandomState, indent: str) -> list[str]:
    words = [_DOCWORDS[rs.randint(len(_DOCWORDS))] for _ in range(rs.randint(8, 24))]
    return [f'{indent}"""{" ".join(words)}."""']


def _py_content(rs: np.random.RandomState, i: int = 0) -> str:
    pool = func_pool()
    lines: list[str] = []
    for m in sorted(rs.choice(_MODULES, size=rs.randint(1, 4), replace=False)):
        lines.append(f"import {m}")
    if rs.rand() < 0.5:
        src = _MODULES[rs.randint(len(_MODULES))]
        lines.append(f"from {src} import helper")
    # ~1/3 of files import another IN-CORPUS module (mod_<j>, j < i): makes
    # the import-resolution consumers (kg_module_deps, import_coverage)
    # non-degenerate — the fixed external pool above never matches a file
    # basename.  j < i keeps the reference satisfiable in any prefix corpus
    # and file_row stays a pure function of (i, seed).
    if i > 0 and rs.rand() < 0.35:
        lines.append(f"import mod_{rs.randint(i)}")
    lines.append("")
    if rs.rand() < 0.6:
        cls = _BASE_CLASSES[rs.randint(len(_BASE_CLASSES))]
        lines.append(f"class {cls}:")
        lines.extend(_docstring(rs, "    "))
        lines.append("    def setup(self):")
        lines.append("        self.ready = True")
        lines.append("")
    n_defs = rs.randint(6, 16)
    defs = rs.choice(len(pool), size=min(n_defs, len(pool)), replace=False)
    for d in defs:
        fn = pool[d]
        lines.append(f"def {fn}(x, limit=100, strict=False):")
        lines.extend(_docstring(rs, "    "))
        # zipf-skewed call targets: a few hot functions are called everywhere.
        n_calls = rs.randint(2, 7)
        for c in range(n_calls):
            tgt = pool[min(int(rs.zipf(1.6)) - 1, len(pool) - 1)]
            lines.append(f"    y{c} = {tgt}(x, limit=limit)")
        lines.append("    acc = []")
        lines.append("    for item in range(limit):")
        lines.append("        if strict and item % 3 == 0:")
        lines.append("            continue")
        lines.append("        acc.append(item * 2 + len(acc))")
        lines.append(f"    return y{n_calls - 1}, acc")
        lines.append("")
    return "\n".join(lines)


def _js_content(rs: np.random.RandomState) -> str:
    pool = func_pool()
    lines: list[str] = []
    for m in sorted(rs.choice(_MODULES, size=rs.randint(1, 3), replace=False)):
        lines.append(f"const {m} = require('{m}');")
    lines.append("")
    if rs.rand() < 0.4:
        cls = _BASE_CLASSES[rs.randint(len(_BASE_CLASSES))]
        lines.append(f"class {cls} {{}}")
    n_defs = rs.randint(4, 12)
    defs = rs.choice(len(pool), size=min(n_defs, len(pool)), replace=False)
    for d in defs:
        fn = pool[d]
        words = [_DOCWORDS[rs.randint(len(_DOCWORDS))] for _ in range(rs.randint(6, 18))]
        lines.append(f"// {' '.join(words)}")
        lines.append(f"function {fn}(x, limit) {{")
        n_calls = rs.randint(2, 6)
        for c in range(n_calls):
            tgt = pool[min(int(rs.zipf(1.6)) - 1, len(pool) - 1)]
            lines.append(f"  const y{c} = {tgt}(x, limit);")
        lines.append("  let acc = 0;")
        lines.append("  for (let i = 0; i < limit; i++) { acc += i * 2; }")
        lines.append(f"  return [y{n_calls - 1}, acc];")
        lines.append("}")
        lines.append("")
    return "\n".join(lines)


def file_row(i: int, seed: int = 42) -> tuple[str, str, str, str, str]:
    """Pure function (i, seed) -> one files row."""
    rs = _rs(i, seed)
    repo = _repo_of(i, rs)
    lang = "python" if rs.rand() < PY_SHARE else "javascript"
    ext = "py" if lang == "python" else "js"
    path = f"src/pkg{rs.randint(8)}/mod_{i}.{ext}"
    content = _py_content(rs, i) if lang == "python" else _js_content(rs)
    return repo, path, _commit_of(repo), lang, content


def synth_files_pdf(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """Driver/twin-side generation (tiny scales only)."""
    rows = [file_row(i, seed) for i in range(start, start + n)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synth_files_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: spark.range -> mapInPandas, scale-ready.

    At 10^12-file scale this is the stand-in for the Iceberg scan; each task
    generates its id-range independently (no shuffle, no driver data).
    """
    from . import schemas

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [file_row(int(i), seed) for i in ids]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return rng.mapInPandas(gen, schema=schemas.FILES)


def synth_documents_df(
    spark, n: int, seed: int = 42, partitions: int | None = None, vocab: int = 400
):
    """Deterministic ``documents(doc_id, text, lang, source, n_chars)``
    corpus for curation-operator scale runs — the documents-table analog
    of ``synth_files_df``, but generated entirely ENGINE-SIDE (pure
    Catalyst expressions over ``spark.range``: no Python workers, no
    driver data, no shuffle), so the generator itself never bounds a
    scaling measurement.

    Shape mirrors the driver testdata: word-stream text over a ~400-word
    Zipf-ish vocabulary (token index = floor(u^3 * 400) skews mass toward
    low ids), doc length 80..279 tokens, en-heavy lang mix, 20 sources.
    Every 20th doc tiles its own first 5 tokens — a repetition-heavy
    slice that exercises the Gopher dup-5-gram path with a known verdict
    split.  Row ``i`` is a pure function of ``(i, seed)``.
    """
    from pyspark.sql import functions as F

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    s = seed * 1_000_003
    base = rng.select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.col("id") + F.lit(s + 1)), F.lit(200)) + 80).alias("ln"),
    )
    # u-resolution: 1e4 buckets suffice for (and keep byte-identical) the
    # default 400-word vocabulary; an OPEN vocabulary (vocab ~ corpus
    # size, the ccnet_ppl degrade-path corpus) needs enough buckets that
    # floor(u^3 * vocab) can actually reach vocab distinct ids
    mod = 10_000 if vocab == 400 else max(10_000, 100 * vocab)
    toks = base.select(
        "doc_id",
        "ln",
        F.expr(
            f"transform(sequence(1, cast(ln as int)), i -> concat('w', cast("
            f"pow(pmod(xxhash64(doc_id * 100003 + i + {s}), {mod}) / {mod}.0, 3.0)"
            f" * {vocab} as int)))"
        ).alias("t"),
    )
    # repetition-heavy slice: tile the doc's own first 5 tokens to full length
    tiled = F.expr(
        "slice(flatten(array_repeat(slice(t, 1, 5), cast(ceil(ln / 5.0) as int))),"
        " 1, cast(ln as int))"
    )
    t_final = F.when(F.pmod(F.col("doc_id"), F.lit(20)) == 0, tiled).otherwise(F.col("t"))
    langs = "'en','en','en','fr','de','es'"
    return toks.select(
        "doc_id",
        F.array_join(t_final, " ").alias("text"),
        F.expr(f"elt(1 + pmod(xxhash64(doc_id + {s + 2}), 6), {langs})").alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20))).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
