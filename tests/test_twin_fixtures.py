"""Drift guard for the committed twin-oracle fixtures (fixtures/*.parquet).

The pipeline_* driver oracles read these files; if a constants/lexer/synth
change shifts pipeline semantics, this test fails until the fixtures are
regenerated (``python -m kgforge.oracle.fixtures``) — so a stale oracle can
never silently pass or fail the driver gate.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kgforge.oracle import fixtures


@pytest.fixture(scope="module")
def fresh():
    return fixtures.twin_stage_tables()


@pytest.mark.parametrize("stage", fixtures.STAGES)
def test_committed_fixture_matches_twin(fresh, stage):
    committed = pd.read_parquet(fixtures.fixture_path(stage))
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh[stage].reset_index(drop=True)
    )


def test_committed_word_sims_matches_twin():
    committed = pd.read_parquet(fixtures.word_sims_path())
    fresh = fixtures.word_sims_table()
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )


def test_committed_shingle_minhash_matches_twin():
    """Regenerates the minhash-hash fixture from the XXH64 twin and pins
    frame equality, plus the injectivity invariant that makes the
    oracle's string-set Jaccard equal the kernel's base-hash Jaccard."""
    committed = pd.read_parquet(fixtures.shingle_minhash_path())
    fresh = fixtures.shingle_minhash_table()
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )
    assert committed["base"].nunique() == len(committed)
    assert committed["sh"].nunique() == len(committed)
