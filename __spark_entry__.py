"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``kgforge/operators/`` (self-registering; each module
keeps its Spark plan and DuckDB oracle adjacent so aliases stay in sync).
The four pipeline_* stages and entity_pagerank are oracle-gated against the
pandas twin's precomputed outputs (fixtures/twin_*.parquet — the iterative
CC stage is not SQL-expressible, so the independent twin supplies the
expected rows); word_search_vec reads the twin's similarity fixture
(fixtures/word_sims.parquet) for the embedding cosines DuckDB cannot
recompute.  Every registered query has a hard oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kgforge import operators
from kgforge.operators import registry

operators.load_all()

_FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: materialized concept
    co-occurrence triples over the documents table — the documents-table
    analog of the code-corpus KG pipeline."""
    return registry.QUERIES["kg_doc_triples"](spark, _FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
