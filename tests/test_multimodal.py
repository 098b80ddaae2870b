"""Multimodal plumbing: schema/UDF/batch contracts real, kernels stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    frame_sample_plan,
    gen_fake_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return gen_fake_media(spark, n=48).cache()


def test_decode_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        decode_media(media, fake=False).collect()


def test_decode_fake_deterministic(spark, media):
    a = {r.media_id: (r.width, r.height, r.n_frames, r.codec)
         for r in decode_media(media, fake=True).collect()}
    b = {r.media_id: (r.width, r.height, r.n_frames, r.codec)
         for r in decode_media(media, fake=True).collect()}
    assert a == b and len(a) == 48
    imgs = [v for v in a.values() if v[3] == "fake/png"]
    assert imgs and all(w >= 64 and h >= 64 for w, h, _n, _c in imgs)


def test_features_shape_and_determinism(spark, media):
    rows = extract_features(media, fake=True).collect()
    assert len(rows) == 48
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    norms = [sum(x * x for x in r.feature) for r in rows]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)


def test_frame_sample_plan(spark, media):
    dec = decode_media(media, fake=True)
    plan = frame_sample_plan(dec, every_n=25).collect()
    vids = {r.media_id for r in dec.where("kind = 'video'").collect()}
    assert {r.media_id for r in plan} == vids
    by = {}
    for r in plan:
        by.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in by.items():
        assert idxs == sorted(idxs)
        assert all(i % 25 == 0 for i in idxs)


def test_blob_pruned_downstream(spark, media):
    """Feature output must not carry the binary column anywhere."""
    feats = extract_features(media, fake=True)
    assert "bytes" not in feats.columns
    plan = feats.select("media_id", "feature")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "FlatMapsInPandas" in plan or "MapInPandas" in plan
