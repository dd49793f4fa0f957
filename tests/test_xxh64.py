"""Differential gate for the pure-Python XXH64 twin (kgforge/oracle/xxh64.py)
against Spark's live ``xxhash64`` expression.

The twin feeds the committed minhash fixture oracle, so any divergence —
a bug here, or a Spark upgrade changing hash semantics — must fail the
suite loudly rather than skew the fixture silently."""

import random
import string

from pyspark.sql import functions as F

from kgforge.oracle.xxh64 import spark_xxhash64

random.seed(0xC0FFEE)


def _rand_str(n: int) -> str:
    pool = string.ascii_letters + string.digits + " _-É€ß中"
    return "".join(random.choice(pool) for _ in range(n))


def test_string_hash_matches_spark(spark):
    # every tail-length class: 0..40 covers <32 (no stripes), the 4-byte
    # and 1-byte tails, and >=32 (full stripe + merge) paths
    cases = [_rand_str(n) for n in range(0, 41)] + [_rand_str(random.randint(41, 200)) for _ in range(16)]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in cases:
        assert got[s] == spark_xxhash64(s), f"string twin diverged on {s!r}"


def test_long_int_and_chain_match_spark(spark):
    longs = [0, 1, -1, 42, 2**63 - 1, -(2**63)] + [random.getrandbits(63) for _ in range(8)]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    got = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
    assert got == [spark_xxhash64(v) for v in longs]

    ints = [0, 1, -1, 7, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in ints], "v int")
    got = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
    assert got == [spark_xxhash64(("int", v)) for v in ints]

    # the chained multi-argument shapes the fast minhash kernel uses:
    # three string tokens, and (long, int literal) seed derivation
    rows = [(_rand_str(5), _rand_str(7), _rand_str(3)) for _ in range(12)]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    trip = [r["h"] for r in df.select(F.xxhash64("a", "b", "c").alias("h")).collect()]
    assert trip == [spark_xxhash64(*row) for row in rows]

    base = [spark_xxhash64(*row) for row in rows]
    df = spark.createDataFrame([(b,) for b in base], "b long")
    for g in (0, 3, 7):
        got = [r["h"] for r in df.select(F.xxhash64("b", F.lit(g)).alias("h")).collect()]
        assert got == [spark_xxhash64(b, ("int", g)) for b in base]
