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
