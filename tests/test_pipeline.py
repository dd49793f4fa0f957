"""End-to-end pipeline tests: twin-differential P/R (the north_rule gate),
content-sha invariant, checkpoint resume, and partition invariance
(FIXTURES.md §6)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgforge.oracle import twin
from kgforge.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipe(spark, small_files, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kgrun"))
    return run_pipeline(spark, small_files, root, audit=True), root


def _triples_pdf(df) -> pd.DataFrame:
    return df.select("subj", "pred", "obj", "line", "score").toPandas()


def test_triples_match_twin_pr(pipe, small_files_pdf):
    out, _ = pipe
    got = _triples_pdf(out["triples"])
    want = twin.twin_triples(small_files_pdf)
    p, r = twin.precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, f"P={p:.3f} R={r:.3f}"


def test_content_sha_invariant(pipe, spark, small_files):
    """input_hint: per-row content sha256 equality vs the source table."""
    out, _ = pipe
    src = small_files.withColumn("expected_sha", F.sha2("content", 256)).select(
        "repo", "path", "commit", "expected_sha"
    )
    men = out["mentions"].select("repo", "path", "commit", "content_sha256").distinct()
    bad = men.join(src, ["repo", "path", "commit"]).where(
        F.col("content_sha256") != F.col("expected_sha")
    )
    assert bad.count() == 0
    assert men.join(src, ["repo", "path", "commit"], "left_anti").count() == 0


def test_metrics_lineage(pipe):
    out, _ = pipe
    m = out["metrics"].toPandas()
    stages = set(m["stage"])
    # per-partition lineage rows for both pipeline stages, plus any
    # valve-audit rows the run recorded (valvemetrics.metrics_rows —
    # stage 'valve:<name>'; their own read-back contract is covered by
    # tests/test_valvemetrics.py)
    assert {"mentions", "triples"} <= stages
    assert all(s.startswith("valve:") for s in stages - {"mentions", "triples"})
    assert bool(m["content_sha_ok"].all())
    men = m[m["stage"] == "mentions"]
    assert int(men["rows_in"].sum()) == 300
    assert (men["rows_out"] >= men["rows_in"]).all()  # >=1 mention (module) per file


def test_checkpoint_resume_identical(pipe, spark, small_files):
    out, root = pipe
    before = _triples_pdf(out["triples"]).sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    out2 = run_pipeline(spark, small_files, root)  # all stages resume from disk
    after = _triples_pdf(out2["triples"]).sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_partition_invariance(pipe, spark, small_files, tmp_path_factory):
    """Same triple set regardless of input partitioning (FIXTURES.md §6)."""
    out, _ = pipe
    root2 = str(tmp_path_factory.mktemp("kgrun_repart"))
    out2 = run_pipeline(spark, small_files.repartition(17), root2)
    a = {tuple(r) for r in _triples_pdf(out["triples"])[["subj", "pred", "obj"]].itertuples(index=False)}
    b = {tuple(r) for r in _triples_pdf(out2["triples"])[["subj", "pred", "obj"]].itertuples(index=False)}
    assert a == b


def test_mega_repo_skew_present(small_files_pdf):
    """The fixture must actually exercise skew (FIXTURES.md §1)."""
    share = (small_files_pdf["repo"] == "org0/repo0").mean()
    assert share > 0.2
