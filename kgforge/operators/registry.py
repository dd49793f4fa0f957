"""Query/oracle registry: every implemented operator registers a Spark
builder ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent DuckDB SQL over the pre-registered testdata views.

The driver's correctness gate compares the two at sf0.01 (row count +
schema + order-insensitive value hash), so column names/aliases MUST match
between the Spark plan and the SQL — helpers here centralize the shared
constants (tokenizer regex, thresholds, rounding) to keep them in lock-step.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Shared tokenizer (reference regex word tokenizer + lowercase,
# /root/reference/search/tf_idf_search.py:17-18).  Java and RE2 agree on
# \W+ for ASCII text.
TOKEN_SPLIT_RE = r"\W+"

# Rounding applied to every floating aggregate on BOTH sides so the
# driver's value hash is insensitive to summation order.
ROUND = 4
