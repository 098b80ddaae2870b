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


def test_decode_real_on_garbage_yields_nulls(spark, media):
    """The real header kernel must not kill the batch on malformed blobs
    (gen_fake_media bytes are random md5 output, not valid containers) —
    every metadata field comes back NULL instead."""
    rows = decode_media(media, fake=False).collect()
    assert len(rows) == 48
    assert all(r.codec is None for r in rows)
    assert all(r.width is None for r in rows if r.kind != "audio")
    assert all(r.duration_s is None for r in rows if r.kind == "audio")


def test_real_header_parsers_roundtrip():
    """Every builder in functions/media_headers.py parses back to the
    exact metadata it was built with — pure Python, no Spark."""
    from newscrawler_spark.functions import media_headers as mh

    for w, h in ((1, 1), (16, 59), (640, 480), (1920, 1080)):
        assert mh.parse_image(mh.make_png(w, h)) == (w, h, "png")
        assert mh.parse_image(mh.make_gif(w, h)) == (w, h, "gif")
        assert mh.parse_image(mh.make_bmp(w, h)) == (w, h, "bmp")
        assert mh.parse_image(mh.make_jpeg_header(w, h)) == (w, h, "jpeg")
    for dur in (0.125, 1.0, 2.5, 5.0):
        got, ch, rate, codec = mh.parse_wav(mh.make_wav(dur))
        assert (got, ch, rate, codec) == (dur, 1, 8000, "wav/pcm")
    for w, h, n in ((160, 120, 25), (320, 240, 33), (1920, 1080, 224)):
        gw, gh, gn, gdur, codec = mh.parse_mp4(mh.make_mp4(w, h, n))
        assert (gw, gh, gn, codec) == (w, h, n, "mp4")
        assert abs(gdur - n / 25) < 1e-9
    # truncated/garbage inputs never raise
    for blob in (b"", b"\x89PNG", b"RIFF\x00\x00", b"\xff\xd8\xff", b"junk" * 3):
        mh.parse_image(blob)
        mh.parse_wav(blob)
        mh.parse_mp4(blob)


def test_decode_real_media_table(spark):
    """decode_media(fake=False) over gen_real_media reproduces the
    closed-form metadata rules (the q46 contract, asserted in-process)."""
    from newscrawler_spark.operators.multimodal import gen_real_media

    got = {r.media_id: r for r in
           decode_media(gen_real_media(spark, n=60), fake=False).collect()}
    assert len(got) == 60
    for i in range(60):
        r = got[i]
        if i % 3 == 0:
            assert (r.width, r.height, r.n_frames) == \
                (16 + i % 97, 16 + (i * 7) % 59, 1)
            assert r.codec == ["png", "gif", "bmp", "jpeg"][(i // 3) % 4]
        elif i % 3 == 1:
            assert r.codec == "wav/pcm"
            assert r.duration_s == (1 + i % 40) / 8
        else:
            assert (r.width, r.height) == \
                (160 + 16 * (i % 20), 120 + 8 * (i % 30))
            assert r.n_frames == 25 + i % 200
            assert r.codec == "mp4"


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
