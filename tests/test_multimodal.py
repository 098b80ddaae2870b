"""Multimodal pipeline: real header + pixel/sample kernels, fake model tier."""

from __future__ import annotations

import numpy as np
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


def test_gif_lzw_roundtrip():
    """From-scratch GIF LZW codec: encode→decode is identity across
    symbol widths, including streams long enough to grow the code width
    and (at 8-bit) approach the 4096-entry table reset."""
    from newscrawler_spark.functions import media_pixels as mp

    for mcs, nsym in ((2, 4), (3, 8), (8, 256)):
        for seed in (0, 1, 5):
            data = bytes((x * (seed + 3) + x // 7 + seed) % nsym
                         for x in range(30_000 if mcs == 8 else 6_000))
            enc = mp.gif_lzw_encode(data, mcs)
            assert mp.gif_lzw_decode(enc, mcs) == data
    # malformed streams: None (or a truncation-safe prefix), never a raise
    assert mp.gif_lzw_decode(b"", 2) is None
    mp.gif_lzw_decode(b"\xff\xff\xff", 2)
    mp.gif_lzw_decode(b"\x00", 2)


def test_pixel_decoders_match_fill_rules():
    """Each value decoder reproduces the closed-form payload its builder
    wrote — the same invariant the q48 oracle checks via SQL."""
    from newscrawler_spark.functions import media_headers as mh
    from newscrawler_spark.functions import media_pixels as mp

    for s, (w, h) in ((0, (16, 16)), (7, (31, 22)), (19, (112, 74))):
        png = mp.decode_png_gray(mh.make_png(w, h, fill_seed=s))
        assert np.array_equal(
            png, [(x + 2 * y + s) % 251 for y in range(h) for x in range(w)])
        gif = mp.decode_gif_pixels(mh.make_gif(w, h, fill_seed=s))
        assert np.array_equal(
            gif, [60 * ((x + y + s) % 4) + 10 * c
                  for y in range(h) for x in range(w) for c in range(3)])
        bmp = mp.decode_bmp_pixels(mh.make_bmp(w, h, fill_seed=s))
        assert np.array_equal(
            bmp, [(3 * x + c + 7 * y + s) % 251
                  for y in range(h) for x in range(w) for c in range(3)])
    for s, dur in ((1, 0.25), (4, 2.0)):
        sam = mp.decode_wav_samples(mh.make_wav(dur, fill_seed=s))
        n = int(dur * 8000)
        k = 3 + s % 5
        assert np.array_equal(
            sam, np.array([((t * k + s) % 401) - 200 for t in range(n)],
                          dtype=np.int16))
    # default (un-filled) builders are byte-compatible: still parse, all
    # zero payloads
    assert int(mp.decode_png_gray(mh.make_png(8, 8)).sum()) == 0
    assert int(mp.decode_bmp_pixels(mh.make_bmp(8, 8)).sum()) == 0
    # headers-only GIF has no image block → None, not a raise
    assert mp.decode_gif_pixels(mh.make_gif(8, 8)) is None
    # garbage in → None out, for every decoder
    for blob in (b"", b"GIF89a\x01", b"BM\x00", b"\x89PNG\r\n\x1a\n123",
                 b"RIFFxxxxWAVE"):
        assert mp.decode_png_gray(blob) is None or blob[:8] == b"\x89PNG\r\n\x1a\n"
        assert mp.decode_bmp_pixels(blob) is None
        assert mp.decode_gif_pixels(blob) is None
        assert mp.decode_wav_samples(blob) is None


def test_media_stats_real_path(spark):
    """media_stats over the filled table: exact stats for every
    decodable format (incl. the real flat-block JPEGs), n_vals=0 + nulls
    for MP4 codec payloads — and NO NotImplementedError anywhere on the
    real path (VERDICT r3 #3)."""
    from newscrawler_spark.operators.multimodal import (
        gen_filled_media,
        media_stats,
    )

    rows = {r.media_id: r for r in
            media_stats(gen_filled_media(spark, n=30)).collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        if i % 3 == 2:                                          # mp4
            assert r.n_vals == 0 and r.v_mean is None and r.v_rms is None
            continue
        assert r.n_vals > 0 and r.v_rms is not None
        if i % 3 == 0 and (i // 3) % 4 == 3:                    # real jpeg
            w, h = 16 + i % 97, 16 + (i * 7) % 59
            bw, k = (w + 7) // 8, 3 + i % 5
            a = np.array(
                [(((y // 8) * bw + (x // 8)) * k + i) % 256
                 for y in range(h) for x in range(w)], dtype=np.int64)
            assert r.n_vals == w * h
            assert r.v_mean == a.sum() / a.size
            assert r.v_rms == float(np.sqrt((a * a).sum() / a.size))
            assert (r.v_min, r.v_max) == (int(a.min()), int(a.max()))
            continue
        if i % 3 == 1:                                          # wav
            n = 1000 * (1 + i % 40)
            k = 3 + i % 5
            a = np.array([((t * k + i) % 401) - 200 for t in range(n)],
                         dtype=np.int64)
            assert r.n_vals == n
            assert r.v_mean == a.sum() / n
            assert r.v_rms == float(np.sqrt((a * a).sum() / n))
            assert r.zero_cross == int(((a[1:] * a[:-1]) < 0).sum())
        else:
            assert r.v_min >= 0 and r.zero_cross == 0


def test_extract_features_real_tier(spark):
    """Real 8-dim stats features for PNG/BMP/GIF/JPEG/WAV; null feature
    (not a raise) for MP4 codec payloads."""
    from newscrawler_spark.operators.multimodal import gen_filled_media

    rows = {r.media_id: r for r in
            extract_features(gen_filled_media(spark, n=30)).collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        if i % 3 == 2:
            assert r.feature is None
            continue
        assert r.feature is not None and len(r.feature) == 8
        n, mean, rms, vmin, vmax, zc, e1, e2 = r.feature
        assert n > 0 and rms > 0
        if i % 3 == 0:
            assert (e1, e2) == (16 + i % 97, 16 + (i * 7) % 59)   # w, h
            assert zc == 0.0 and vmin >= 0
        else:
            assert (e1, e2) == (8000.0, 1.0)                      # rate, ch
            assert vmin < 0 < vmax


def test_blob_pruned_downstream(spark, media):
    """Feature output must not carry the binary column anywhere."""
    feats = extract_features(media, fake=True)
    assert "bytes" not in feats.columns
    plan = feats.select("media_id", "feature")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "FlatMapsInPandas" in plan or "MapInPandas" in plan


def test_resize_media_exact_bytes(spark):
    """8x6 nearest-neighbor thumbs match the closed-form fill rules
    byte-for-byte (PNG gray, GIF palette gray, BMP with bottom-up flip);
    JPEG keeps dims with null pixels; audio/video keep codec only."""
    from newscrawler_spark.operators.multimodal import (
        gen_filled_media,
        resize_media,
    )

    out = resize_media(gen_filled_media(spark, n=12), out_w=8, out_h=6)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 12

    def dims(i):
        return 16 + i % 97, 16 + (i * 7) % 59

    def thumb(i, val):
        w, h = dims(i)
        return bytes(
            val(i, (u * w) // 8, (v * h) // 6)
            for v in range(6) for u in range(8)
        )

    def bmp_gray(i, sx, sy):
        _w, h = dims(i)
        b = (3 * sx + 7 * (h - 1 - sy) + i) % 251
        return b + 1 if b <= 248 else (166 if b == 249 else 83)

    def jpeg_gray(i, sx, sy):
        w, _h = dims(i)
        return (((sy // 8) * ((w + 7) // 8) + (sx // 8)) * (3 + i % 5) + i) % 256

    exp = {
        0: thumb(0, lambda i, sx, sy: (sx + 2 * sy + i) % 251),       # png
        3: thumb(3, lambda i, sx, sy: 60 * ((sx + sy + i) % 4) + 10),  # gif
        6: thumb(6, bmp_gray),                                         # bmp
        9: thumb(9, jpeg_gray),                                        # jpeg
    }
    for i, want in exp.items():
        r = rows[i]
        assert bytes(r.pixels) == want, i
        assert (r.p_first, r.p_last) == (want[0], want[-1])
        assert r.p_sum == sum(want)
        assert r.p_checksum == sum(v * (k + 1) for k, v in enumerate(want))
        assert r.p_mean == sum(want) / 48
        assert (r.in_w, r.in_h) == dims(i)
    assert rows[9].codec == "jpeg" and (rows[9].in_w, rows[9].in_h) == dims(9)
    assert rows[1].codec == "wav/pcm" and rows[1].pixels is None
    assert rows[2].codec == "mp4" and rows[2].pixels is None


def test_resize_media_malformed_blobs_null(spark):
    """Garbage bytes yield null pixels, never a raise."""
    from newscrawler_spark.operators.multimodal import resize_media

    junk = spark.createDataFrame(
        [(1, "image", b"\x89PNG\r\n\x1a\nnot-really"),
         (2, "image", b"GIF89a\x02\x00"), (3, "audio", b"RIFFxxxx"),
         (4, "video", b"\x00\x00\x00\x00zzzz")],
        "media_id long, kind string, bytes binary",
    )
    got = {r.media_id: r for r in resize_media(junk).collect()}
    assert len(got) == 4
    assert all(r.pixels is None and r.p_sum is None for r in got.values())


def test_jpeg_codec_roundtrip_exact():
    """The from-scratch baseline-JPEG codec: every (dims, seed) combo
    round-trips integer-exactly through real entropy-coded bytes;
    out-of-class and malformed inputs return None, never raise."""
    from newscrawler_spark.functions.media_pixels import (
        decode_jpeg_gray,
        make_jpeg,
    )

    for w, h, s in [(8, 8, None), (16, 16, 0), (17, 19, 5), (25, 20, 9),
                    (112, 70, 41), (9, 65, 13)]:
        img = decode_jpeg_gray(make_jpeg(w, h, s))
        assert img is not None and img.shape == (h, w), (w, h, s)
        bw = (w + 7) // 8
        for y in range(0, h, 7):
            for x in range(0, w, 5):
                b = (y // 8) * bw + (x // 8)
                want = 128 if s is None else (b * (3 + s % 5) + s) % 256
                assert img[y, x] == want, (w, h, s, x, y)
    assert decode_jpeg_gray(b"") is None
    assert decode_jpeg_gray(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_gray(make_jpeg(16, 16, 3)[:40]) is None
    assert decode_jpeg_gray(b"GIF89a" + bytes(30)) is None
    # the header-only tier (q46's jpeg blobs) is out of the decodable
    # class and must yield None, not a raise
    from newscrawler_spark.functions.media_headers import make_jpeg_header
    assert decode_jpeg_gray(make_jpeg_header(20, 30)) is None
