"""Stage 1 — mention detection: files -> mentions.

A vectorized mapInPandas UDTF (one file row -> many mention rows), the
Spark-idiomatic shape for the reference's per-paragraph mention loop
(/root/reference/experiments/uaz_documents_comparison.py:153-160) and the
NER batch archetype (/root/reference/experiments/named_entity_recognition.py:9-16).

Scale notes:
- The lexer is pure CPU per file; the only data movement is the Arrow batch
  across the JVM<->Python boundary. No shuffle in this stage.
- content_sha256 is computed JVM-side with the built-in ``sha2`` BEFORE the
  UDF and carried through (input_hint invariant), so the invariant check
  never depends on Python.
- Salted repartition on (repo, lang) spreads the mega-repo across tasks
  (north_rule: "salted repartition on repo+lang").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants, lexer, schemas


def with_content_sha(files: DataFrame) -> DataFrame:
    return files.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def salted(files: DataFrame, buckets: int = constants.SALT_BUCKETS) -> DataFrame:
    """Spread skewed (repo, lang) groups across ``buckets`` tasks each —
    for KEYED downstream stages (grouped writes, co-located joins).

    The salt is a deterministic hash of (path, commit) — not rand() — so
    plans are reproducible across retries and partition counts.
    """
    salt = F.pmod(F.xxhash64("path", "commit"), F.lit(buckets))
    return files.repartition(F.col("repo"), F.col("lang"), salt)


def extract_mentions(files: DataFrame, repartition: bool = False) -> DataFrame:
    """files(repo,path,commit,lang,content[,content_sha256]) -> MENTIONS.

    No repartition by default: lexing is an embarrassingly-parallel map, so
    scan splits already balance it and a pre-UDF shuffle would move the
    ENTIRE corpus once more (measured 2x wall on the mention stage; at
    100 TB it's a full extra pass over the input).  Skew salting belongs on
    the keyed stages (the link self-join uses AQE skew-join; grouped writes
    can use ``salted``), not on the map.
    """
    if "content_sha256" not in files.columns:
        files = with_content_sha(files)
    if repartition:
        files = salted(files)

    cols = ["repo", "path", "commit", "lang", "content_sha256", "content"]
    src = files.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in schemas.MENTIONS.fieldNames()}
            for repo, path, commit, lang, sha, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"],
                pdf["content_sha256"], pdf["content"],
            ):
                for kind, name, line in lexer.lex(lang, path, content):
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["commit"].append(commit)
                    out["lang"].append(lang)
                    out["content_sha256"].append(sha)
                    out["kind"].append(kind)
                    out["name"].append(name)
                    out["line"].append(line)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=schemas.MENTIONS)
