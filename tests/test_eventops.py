"""Event-analytics family: physical-plan shape guarantees.

The oracle rehearsal (test_oracles.py) gates VALUES; these tests gate the
plans — the whole point of the bespoke formulations is what they avoid
(a join per probe row, a nested-loop range join), and that property is
invisible at test scale unless pinned here.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kgforge.operators import registry
import kgforge.operators as ops

ops.load_all()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_join_is_joinless_single_shuffle(spark, sf_dir):
    """The as-of join must compile to union + ONE hash exchange on
    user_id + window — no join operator at all (the lateral/self-join
    formulation the oracle uses would be O(probe x candidates))."""
    import re

    p = plan_of(registry.QUERIES["asof_join"](spark, sf_dir))
    assert "Join" not in p  # no SMJ/BHJ/BNLJ of any kind
    # formatted explain lists each node twice (tree + detail): match the
    # detail headers to count physical Exchange operators exactly once.
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "Window" in p


def test_interval_join_has_no_nested_loop(spark, sf_dir):
    """Containment must run as a bucket EQUI-join: a naive range predicate
    alone compiles to BroadcastNestedLoopJoin (O(intervals x events));
    the bucketed plan must not contain any non-equi join."""
    p = plan_of(registry.QUERIES["interval_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_funnel_steps_shrink_monotonically(spark, sf_dir):
    rows = {
        int(r["step"]): int(r["n_users"])
        for r in registry.QUERIES["funnel_counts"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0


def test_asof_strictly_prior_semantics(spark):
    """Equal-timestamp reference rows must NOT match (strict as-of), and
    ties among candidates resolve to the max event_id."""
    import datetime as dt
    import tempfile

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click at t0 == purchase ts -> excluded; prior click wins
        (1, t0 - dt.timedelta(seconds=10), 1, "click", 0.0, ""),
        (2, t0, 1, "click", 0.0, ""),
        (3, t0, 1, "purchase", 1.0, ""),
        # user 2: two clicks at the SAME prior instant -> max event_id
        (4, t0 - dt.timedelta(seconds=5), 2, "click", 0.0, ""),
        (5, t0 - dt.timedelta(seconds=5), 2, "click", 0.0, ""),
        (6, t0, 2, "purchase", 1.0, ""),
        # user 3: purchase with no prior click -> nulls
        (7, t0, 3, "purchase", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {
            r["event_id"]: (r["click_event_id"], r["gap_us"])
            for r in registry.QUERIES["asof_join"](spark, d).collect()
        }
    assert got[3] == (1, 10_000_000)  # same-ts click 2 excluded
    assert got[6] == (5, 5_000_000)  # tie -> max event_id
    assert got[7] == (None, None)


def test_div_truncation_agrees_with_duckdb(spark):
    """Round-3 advisor claimed Spark `div` (truncate toward zero) and
    DuckDB `//` (allegedly floor) diverge on pre-1970 negative epochs.
    Checked and refuted: DuckDB's INTEGER `//` also truncates toward
    zero, so every bucket/day/week id in this module agrees between the
    engines for ALL inputs.  This test pins that agreement on negatives,
    zero, and exact multiples so an engine upgrade that changes either
    semantics fails loudly."""
    import duckdb
    from pyspark.sql import functions as F

    from kgforge.operators.eventops import WEEK_US

    vals = [-3 * WEEK_US - 5, -WEEK_US - 1, -WEEK_US, -1, 0, 1, WEEK_US - 1, WEEK_US, 3 * WEEK_US + 7]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.q for r in df.select("x", F.expr(f"x div {WEEK_US}").alias("q")).collect()}
    want = {v: duckdb.sql(f"select cast({v} as bigint) // {WEEK_US}").fetchone()[0] for v in vals}
    assert got == want
