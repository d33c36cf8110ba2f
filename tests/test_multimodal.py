"""Multimodal plumbing tests: schemas, Arrow batch stages, 1→n frame
sampling. All payloads are REAL files (binary PPM / PCM WAV /
YUV4MPEG2) parsed by real pure-stdlib decoders."""

from __future__ import annotations

import io
import wave

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.io import table
from map_reduce_mongodb_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    decode_media,
    media_features,
    media_from_documents,
    sample_frames,
)
from tests.conftest import SF_DIR


def _media(spark):
    return media_from_documents(table(spark, "documents", SF_DIR))


def test_media_schema_and_payload(spark):
    media = _media(spark)
    rows = {r.media_id: r
            for r in media.filter(F.col("media_id") < 3).collect()}
    img, aud, vid = rows[0], rows[1], rows[2]
    assert img.uri == "mem://corpus/0"
    assert (img.media_type, aud.media_type, vid.media_type) == (
        "image", "audio", "video")
    # image payload is a WELL-FORMED binary PPM: header parses and the
    # pixel array is exactly w*h*3 bytes
    assert bytes(img.data).startswith(b"P6\n")
    hdr, dims, maxval, pixels = bytes(img.data).split(b"\n", 3)
    w, h = map(int, dims.split())
    assert maxval == b"255" and len(pixels) == w * h * 3
    # audio payload is a WELL-FORMED PCM WAV: the stdlib wave module
    # accepts it and frame accounting matches the data size
    with wave.open(io.BytesIO(bytes(aud.data))) as wv:
        assert wv.getsampwidth() == 2
        assert wv.getnframes() * wv.getnchannels() * 2 == \
            len(bytes(aud.data)) - 44
    # video payload is a WELL-FORMED YUV4MPEG2 stream: header parses
    # and every FRAME block is exactly w*h*3 bytes (C444)
    vdata = bytes(vid.data)
    assert vdata.startswith(b"YUV4MPEG2 ")
    vhdr = vdata[:vdata.index(b"\n")]
    tags = dict((p[:1], p[1:]) for p in vhdr[10:].split())
    vw, vh = int(tags[b"W"]), int(tags[b"H"])
    assert tags[b"C"] == b"444"
    body = vdata[len(vhdr) + 1:]
    fblock = 6 + vw * vh * 3  # b"FRAME\n" + planes
    assert len(body) % fblock == 0 and len(body) // fblock >= 2
    for f in range(len(body) // fblock):
        assert body[f * fblock:f * fblock + 6] == b"FRAME\n"


def test_decode_media_adds_geometry(spark):
    decoded = decode_media(_media(spark))
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.collect()
    assert all(r.n_frames >= 1 for r in rows)
    imgs = [r for r in rows if r.media_type == "image"]
    assert imgs and all(r.n_frames == 1 and r.channels == 3 for r in imgs)
    # deterministic: same payload → same decoded geometry
    again = {r.media_id: (r.width, r.height) for r in
             decode_media(_media(spark)).collect()}
    assert all((r.width, r.height) == again[r.media_id] for r in rows)


def test_media_features_shape(spark):
    feats = media_features(_media(spark)).collect()
    assert all(len(r.feature) == FEATURE_DIM for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r.feature)
    # non-degenerate, payload-derived (r9 test review: shape+range
    # alone pass for a constant default vector from a silently failed
    # parse): different payloads must map to different vectors, and
    # at least one vector must vary across its own dimensions
    vecs = {r.media_id: tuple(r.feature) for r in feats}
    assert len(set(vecs.values())) > 1, "all feature vectors identical"
    assert any(len(set(v)) > 1 for v in vecs.values()), \
        "every vector is constant across dimensions"
    # deterministic: same payloads → same features
    again = {r.media_id: tuple(r.feature)
             for r in media_features(_media(spark)).collect()}
    assert vecs == again


def test_sample_frames_video_only(spark):
    media = _media(spark)
    frames = sample_frames(media, every=8)
    got_types = frames.join(media, "media_id").select("media_type").distinct()
    assert [r.media_type for r in got_types.collect()] == ["video"]
    per_video = frames.groupBy("media_id").count().collect()
    assert per_video and all(r["count"] >= 1 for r in per_video)
    # the STRIDE contract, asserted exactly (r9 test review: count>=1
    # + video-only also hold for an operator that ignores `every`):
    # per video, emitted indices must be exactly {0, 8, 16, ...} up
    # to that video's frame count
    n_frames = {r.media_id: r.n_frames
                for r in decode_media(media).collect()
                if r.media_type == "video"}
    got_idx: dict = {}
    for r in frames.select("media_id", "frame_idx").collect():
        got_idx.setdefault(r.media_id, set()).add(r.frame_idx)
    assert got_idx, "no video frames sampled"
    for mid, idxs in got_idx.items():
        assert idxs == set(range(0, n_frames[mid], 8)), (mid, idxs)


def test_resize_images_real_resample(spark):
    """Thumbnails are valid PPMs whose pixels are an actual subset of
    the source grid: every thumb pixel must equal the source pixel at
    the canonical floor-mapped coordinates."""
    import numpy as np

    from map_reduce_mongodb_spark.operators.multimodal import (
        resize_images)

    media = _media(spark)
    thumbs = {r.media_id: bytes(r.data)
              for r in resize_images(media).limit(50).collect()}
    assert thumbs
    src = {r.media_id: bytes(r.data)
           for r in media.filter(F.col("media_id").isin(
               list(thumbs))).collect()}
    for mid, tdata in thumbs.items():
        hdr, dims, maxval, tpix = tdata.split(b"\n", 3)
        tw, th = map(int, dims.split())
        assert (hdr, maxval, len(tpix)) == (b"P6", b"255", tw * th * 3)
        sdata = src[mid]
        _, sdims, _, spix = sdata.split(b"\n", 3)
        sw, sh = map(int, sdims.split())
        s = np.frombuffer(spix, dtype=np.uint8).reshape(sh, sw, 3)
        t = np.frombuffer(tpix, dtype=np.uint8).reshape(th, tw, 3)
        ys = (np.arange(th) * sh) // th
        xs = (np.arange(tw) * sw) // tw
        assert (t == s[np.ix_(ys, xs)]).all()


def test_audio_features_match_pure_python(spark):
    """RMS/peak/mean from the Spark DSP stage must equal a direct
    pure-Python decode of the same WAV payloads."""
    import math

    from map_reduce_mongodb_spark.operators.multimodal import (
        audio_features)

    media = _media(spark)
    got = {r.media_id: (r.n_samples, r.peak, r.mean_amp, r.rms)
           for r in audio_features(media).collect()}
    assert got
    raw = {r.media_id: bytes(r.data)
           for r in media.filter(F.col("media_type") == "audio")
           .limit(20).collect()}
    for mid, payload in raw.items():
        with wave.open(io.BytesIO(payload)) as wv:
            frames = wv.readframes(wv.getnframes())
        vals = [int.from_bytes(frames[i:i + 2], "little", signed=True)
                for i in range(0, len(frames), 2)]
        if not vals:
            assert mid not in got
            continue
        n = len(vals)
        r4 = (lambda v: math.floor(v * 10000 + 0.5) / 10000)
        assert got[mid] == (
            n, max(vals), r4(sum(vals) / n),
            r4(math.sqrt(sum(v * v for v in vals) / n)))


def test_corpus_is_pure_ascii(spark):
    """LOUD guard for the fixtures' ASCII-corpus contract. Two of its
    three original justifications are FIXED in r11 and no longer
    depend on it: the multimodal oracles now derive payloads from
    md5(text) hex (engine-portable for any corpus —
    operators/multimodal.py::_payload_source), and every whitespace
    split spells the class explicitly ([ \\t\\n\\x0B\\f\\r]) instead
    of the engine-divergent \\s. The remaining dependent is the
    ``lower()`` family (normalized-md5 dedup fingerprints, lowercased
    tokenization): Spark/JDK full case mapping vs DuckDB/utf8proc
    simple case mapping disagree on length-changing maps ('İ' → two
    codepoints vs one), so lower()-based oracles are exact only on
    ASCII — the documented casefold contract the --unicode corpus
    sweeps adjudicate."""
    docs = table(spark, "documents", SF_DIR)
    bad = docs.filter(
        (F.octet_length("text") != F.char_length("text"))
        | F.col("text").rlike("[^\\x00-\\x7f]")).count()
    assert bad == 0, (
        f"{bad} documents contain non-ASCII text: the lower()-based "
        "normalized-hash oracles in queries.py are no longer exact — "
        "adjudicate the casefold contract before trusting those rows")
    # \x0B/\x0C check retained as defense-in-depth: all CURRENT split
    # sites use the explicit class (so both engines agree on these
    # chars), but a future query writing bare \s would silently
    # diverge on U+000B — this keeps the fixtures from masking it.
    ctrl = docs.filter(F.col("text").rlike("[\\x0B\\x0C]")).count()
    assert ctrl == 0, (
        f"{ctrl} documents contain \\x0B/\\x0C control whitespace "
        "(kept out of fixtures as defense-in-depth for the \\s "
        "engine-portability class)")


def test_y4m_decoder_rejects_malformed_streams(spark):
    """The Y4M walker must fail LOUDLY on structural damage — a
    truncated frame, a bad frame marker, a wrong colorspace — rather
    than return plausible geometry from garbage."""
    import pytest

    from map_reduce_mongodb_spark.operators.multimodal import (
        _decode_payload, _synth_payload)

    good = _synth_payload("video", "ten words of sample text for video")
    geom = _decode_payload("video", good)
    assert geom["n_frames"] >= 2 and geom["channels"] == 3
    with pytest.raises(ValueError, match="truncated"):
        _decode_payload("video", good[:-5])
    with pytest.raises(ValueError, match="FRAME"):
        hdr_end = good.index(b"\n") + 1
        _decode_payload("video",
                        good[:hdr_end] + b"XRAME" + good[hdr_end + 5:])
    with pytest.raises(ValueError, match="colorspace"):
        _decode_payload("video", good.replace(b"C444", b"C420", 1))
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        _decode_payload("video", b"not a video at all")


def test_ahash_hamming_pairs_match_brute_force(spark):
    """Cross-modality reuse of the Hamming pair machinery: block-split
    simhash_pairs(bits=64) over image aHash fingerprints must equal
    the brute-force xor-popcount answer (pigeonhole candidates lose
    nothing)."""
    from itertools import combinations

    from map_reduce_mongodb_spark.io import table
    from map_reduce_mongodb_spark.operators.dedup import simhash_pairs
    from map_reduce_mongodb_spark.operators.multimodal import (
        image_ahash, media_from_documents)
    from tests.conftest import SF_DIR

    docs = table(spark, "documents", SF_DIR)
    fps = (image_ahash(media_from_documents(docs))
           .select(F.col("media_id").alias("doc_id"),
                   F.col("ahash").alias("simhash")))
    got = {(r.id_a, r.id_b, r.hamming)
           for r in simhash_pairs(fps, max_hamming=16, bits=64).collect()}
    rows = [(r.doc_id, r.simhash) for r in fps.collect()]
    want = set()
    for (ida, ha), (idb, hb) in combinations(sorted(rows), 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 16:
            want.add((ida, idb, d))
    assert got == want and len(want) >= 1


def test_video_ahash_consistent_with_sampled_frame_zero(spark):
    """Cross-operator pin: recomputing the cell hash from
    sample_frames' frame-0 bytes must reproduce video_frame_ahash's
    f0_ahash exactly — the two operators must agree on frame
    boundaries and plane layout."""
    import numpy as np

    from map_reduce_mongodb_spark.operators.multimodal import (
        media_from_documents, sample_frames, video_frame_ahash)

    docs = table(spark, "documents", SF_DIR).limit(60)
    media = media_from_documents(docs)
    want = {r.media_id: (r.width, r.height, r.f0_ahash)
            for r in video_frame_ahash(media).collect()}
    f0 = {r.media_id: bytes(r.frame_data)
          for r in sample_frames(media, every=1000).collect()
          if r.frame_idx == 0}
    assert set(f0) == set(want) and want

    for mid, blob in f0.items():
        w, h, expected = want[mid]
        arr = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
        wh = w * h
        g = (arr[:wh] + arr[wh:2 * wh] + arr[2 * wh:]).reshape(h, w)
        ci = (8 * np.arange(h)) // h
        cj = (8 * np.arange(w)) // w
        cell = (ci[:, None] * 8 + cj[None, :]).ravel()
        s = np.bincount(cell, weights=g.ravel().astype(float),
                        minlength=64).astype(np.int64)
        c = np.bincount(cell, minlength=64).astype(np.int64)
        bits = (s * int(c.sum())) >= (int(s.sum()) * c)
        val = sum(1 << b for b in range(64) if bits[b])
        if val >= 1 << 63:
            val -= 1 << 64
        assert val == expected, mid


def test_video_frame_ahashes_frame0_pins_single_frame_op(spark):
    """Cross-operator pin: the all-frames hasher's frame 0 must be
    bit-identical to video_frame_ahash's f0_ahash, and every video
    emits exactly n_frames rows with frame ids 0..n_frames-1."""
    from map_reduce_mongodb_spark.operators.multimodal import (
        video_frame_ahash, video_frame_ahashes)

    media = _media(spark)
    per_frame = video_frame_ahashes(media)
    single = video_frame_ahash(media)
    f0 = per_frame.filter(F.col("frame_id") == 0).select(
        "media_id", F.col("ahash").alias("f0"))
    joined = single.join(f0, "media_id", "full_outer").collect()
    assert joined and all(r.f0 == r.f0_ahash for r in joined)
    counts = (per_frame.groupBy("media_id")
              .agg(F.count("*").alias("n"),
                   F.min("frame_id").alias("lo"),
                   F.max("frame_id").alias("hi"))
              .join(single.select("media_id", "n_frames"), "media_id")
              .collect())
    assert all(r.n == r.n_frames and r.lo == 0 and r.hi == r.n_frames - 1
               for r in counts)
