"""Multimodal binary-column plumbing tests (operators/multimodal.py):
schema, determinism, and the stubbed decode contract."""

import pytest

from kgforge.operators import multimodal


@pytest.fixture(scope="module")
def manifest(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.media_manifest(docs).cache()


def test_manifest_payload_roundtrip(spark, manifest):
    from pyspark.sql import functions as F

    bad = manifest.where(F.sha2(F.col("payload"), 256) != F.col("payload_sha256"))
    assert bad.count() == 0
    r = manifest.first()
    assert isinstance(r["payload"], (bytes, bytearray)) and r["n_bytes"] == len(r["payload"])


def test_features_shape_and_determinism(manifest):
    f1 = multimodal.extract_features(manifest).orderBy("doc_id").collect()
    f2 = multimodal.extract_features(manifest.repartition(7)).orderBy("doc_id").collect()
    assert len(f1) == manifest.count()
    for a, b in zip(f1, f2):
        assert a["doc_id"] == b["doc_id"]
        assert len(a["features"]) == multimodal.FEATURE_BINS
        assert a["features"] == b["features"]  # partitioning-invariant
        assert abs(sum(a["features"]) - 1.0) < 1e-3  # normalized histogram


def test_frame_sample_is_stubbed(manifest):
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample(manifest)


def test_author_blacklist_reference_parity(spark):
    """Pins the reference's is_blacklisted_author semantics
    (/root/reference/experiments/document_upload.py:157-173), including the
    quirk that the multi-word entry 'utente di' can never match a single
    whitespace token — 'utente di qualcosa' SURVIVES in the reference and
    must survive here; 'User' is case-insensitively dropped; empty/blank
    authors are dropped."""
    from pyspark.sql import functions as F

    from kgforge.operators.multimodal import AUTHOR_BLACKLIST

    rows = [
        ("", False),
        ("   ", True),  # truthy in the reference, .split() empty -> survives
        ("user", False),
        ("User", False),
        ("Microsoft Office", False),
        ("Adobe Acrobat 9.0", False),
        ("jane doe", True),
        ("utente di qualcosa", True),  # the reference quirk, reproduced
        ("jane user", False),  # any blacklisted token kills the author
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "author string")
    bl = F.array(*[F.lit(w) for w in AUTHOR_BLACKLIST])
    blacklisted = (F.col("author") == "") | F.exists(
        F.split(F.lower("author"), r"\s+"), lambda t: F.array_contains(bl, F.trim(t))
    )
    got = [r["ok"] for r in df.select((~blacklisted).alias("ok")).collect()]
    assert got == [ok for _, ok in rows]

    # the same rows through the reference's own python predicate
    def ref_blacklisted(author):
        if not author:
            return True
        return any(a.strip() in set(AUTHOR_BLACKLIST) for a in author.lower().split())

    assert [not ref_blacklisted(a) for a, _ in rows] == [ok for _, ok in rows]
