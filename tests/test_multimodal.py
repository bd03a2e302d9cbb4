"""Multimodal column tests: PPM decode/resize are REAL (pure NumPy);
the codec-library gate (JPEG/PNG) stays an explicit NotImplementedError.
"""

from __future__ import annotations

import numpy as np
import pytest

from p6__mapreduce_spark.multimodal.columns import (
    attach_binary_payload,
    attach_ppm_payload,
    decode_image,
    extract_features,
    frame_sample,
    resize_image,
)
from p6__mapreduce_spark.multimodal.ppm import decode_ppm, encode_ppm, resize_nearest


def docs_df(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 250)], "doc_id long, text string"
    )


def test_payload_is_utf8_bytes_with_metadata(spark):
    rows = attach_binary_payload(docs_df(spark)).orderBy("doc_id").collect()
    assert bytes(rows[0].payload) == b"hello world"
    assert rows[0].meta.n_bytes == 11
    assert rows[0].meta.mime == "image/fake"
    assert 1 <= rows[0].meta.width <= 640


def test_extract_features_batch_plumbing(spark):
    feats = {
        r.doc_id: r
        for r in extract_features(attach_binary_payload(docs_df(spark))).collect()
    }
    assert feats[1].n_bytes == 11
    assert feats[1].checksum == sum(b"hello world") % 65536
    assert feats[1].head_hex == b"hello wo".hex()


def test_frame_sample_slices(spark):
    frames = frame_sample(attach_binary_payload(docs_df(spark)), every=100).collect()
    doc2 = sorted(
        (r.frame_idx, bytes(r.frame)) for r in frames if r.doc_id == 2
    )
    assert len(doc2) == 3                    # 250 bytes -> 100+100+50
    assert doc2[2][1] == b"x" * 50


# ---------------------------------------------------------------------------
# PPM codec (no Spark): byte-exact round trips on planted images
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_byte_exact():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    data = encode_ppm(px)
    assert data.startswith(b"P6\n3 5\n255\n")
    back = decode_ppm(data)
    assert back.shape == (5, 3, 3)
    assert np.array_equal(back, px)


def test_ppm_decode_handles_comments_and_whitespace():
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    data = b"P6 # a comment\n# another\n 2\t2 \n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(data), px)


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"P5\n1 1\n255\n" + b"\x00" * 3, "not a P6"),
        (b"P6\n2 2\n255\n" + b"\x00" * 5, "truncated"),
        (b"P6\n2 2\n65535\n" + b"\x00" * 24, "maxval"),
        (b"P6\n0 2\n255\n", "dimensions"),
    ],
)
def test_ppm_decode_rejects_corrupt(data, msg):
    with pytest.raises(ValueError, match=msg):
        decode_ppm(data)


def test_resize_nearest_matches_floor_mapping():
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = resize_nearest(px, 2, 4)  # upsample rows, downsample cols
    assert out.shape == (4, 2, 3)
    for r in range(4):
        for c in range(2):
            assert np.array_equal(out[r, c], px[(r * 2) // 4, (c * 4) // 2])


# ---------------------------------------------------------------------------
# Spark path: real decode/resize over minted PPM payloads
# ---------------------------------------------------------------------------


def test_attach_ppm_mints_valid_images(spark):
    rows = attach_ppm_payload(docs_df(spark)).collect()
    # doc 1 (11 bytes < 24) is filtered out; doc 2 (250 bytes) -> H=10
    assert [r.doc_id for r in rows] == [2]
    px = decode_ppm(bytes(rows[0].payload))
    assert px.shape == (10, 8, 3)
    assert bytes(px.tobytes()) == b"x" * 240  # raster == first 240 text bytes


def test_decode_image_real_channel_sums(spark):
    out = {r.doc_id: r for r in decode_image(attach_ppm_payload(docs_df(spark))).collect()}
    r = out[2]
    assert (r.width, r.height) == (8, 10)
    # every byte is 'x' (120): each channel sums 80 pixels * 120
    assert r.sum_r == r.sum_g == r.sum_b == 80 * 120


def test_resize_image_real_and_reencodes(spark):
    resized = resize_image(attach_ppm_payload(docs_df(spark)), 4, 4)
    rows = resized.collect()
    px = decode_ppm(bytes(rows[0].payload))
    assert px.shape == (4, 4, 3)
    assert np.all(px == ord("x"))
    # and the resized payloads decode through the same real path
    stats = decode_image(resized).collect()[0]
    assert (stats.width, stats.height) == (4, 4)
    assert stats.sum_r == 16 * 120


def test_compressed_decode_is_explicit_gate(spark):
    jpeg = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0fakejpegbytes"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="Pillow"):
        decode_image(jpeg).collect()


def test_wav_roundtrip_including_negative_samples():
    import numpy as np

    from p6__mapreduce_spark.multimodal.wav import decode_wav, encode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    rate, got = decode_wav(encode_wav(samples, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(got, samples)


def test_wav_decode_walks_extra_chunks_and_validates():
    import struct

    import numpy as np
    import pytest

    from p6__mapreduce_spark.multimodal.wav import decode_wav, encode_wav

    wav = bytearray(encode_wav(np.array([5, -5], dtype=np.int16)))
    # splice a LIST/INFO chunk between fmt and data (legal WAV)
    info = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(wav[:36]) + info + bytes(wav[36:])
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, got = decode_wav(spliced)
    assert list(got) == [5, -5]
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + bytes(40))  # foreign container
    with pytest.raises(ValueError):
        decode_wav(bytes(wav[:40]))  # truncated data chunk


def test_decode_audio_stats_match_numpy(spark):
    import numpy as np

    from p6__mapreduce_spark.multimodal.columns import attach_wav_payload, decode_audio

    docs = spark.createDataFrame(
        [(0, "abcdef"), (1, "xy")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in decode_audio(attach_wav_payload(docs)).collect()}
    for doc_id, text in [(0, "abcdef"), (1, "xy")]:
        want = np.frombuffer(text.encode()[: len(text) // 2 * 2], dtype="<i2").astype(
            "int64"
        )
        r = rows[doc_id]
        assert r.n_samples == len(want) and r.sample_rate == 16000
        assert r.sum_amp == want.sum() and r.sum_abs_amp == np.abs(want).sum()
        assert r.peak_amp == np.abs(want).max()


def test_y4m_roundtrip_and_validation():
    import numpy as np
    import pytest

    from p6__mapreduce_spark.multimodal.y4m import decode_y4m, encode_y4m

    frames = np.arange(2 * 3 * 2 * 4, dtype=np.uint8).reshape(2, 3, 2, 4)
    got = decode_y4m(encode_y4m(frames))
    assert np.array_equal(got, frames)
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF....WAVE")  # foreign container
    with pytest.raises(ValueError):
        # C420 (the spec default when no C tag): honest unsupported
        decode_y4m(b"YUV4MPEG2 W4 H2 F25:1\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError):
        decode_y4m(encode_y4m(frames)[:-5])  # truncated final frame


def test_decode_video_stats_match_numpy(spark):
    import numpy as np

    from p6__mapreduce_spark.multimodal.columns import attach_y4m_payload, decode_video

    text = "".join(chr(97 + (i % 26)) for i in range(100))  # 100 bytes -> 2 frames
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = decode_video(attach_y4m_payload(docs)).collect()[0]
    b = np.frombuffer(text.encode()[:96], dtype=np.uint8).reshape(2, 3, 2, 8)
    sums = b.astype("int64").sum(axis=(0, 2, 3))
    assert (r.n_frames, r.width, r.height) == (2, 8, 2)
    assert (r.sum_y, r.sum_u, r.sum_v) == tuple(int(x) for x in sums)


def test_downsample_audio_halves_and_keeps_even_samples(spark):
    import numpy as np

    from p6__mapreduce_spark.multimodal.columns import attach_wav_payload, downsample_audio
    from p6__mapreduce_spark.multimodal.wav import decode_wav

    text = "abcdefgh"  # 4 samples
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    payload = downsample_audio(attach_wav_payload(docs), factor=2).collect()[0].payload
    rate, got = decode_wav(bytes(payload))
    want = np.frombuffer(text.encode(), dtype="<i2")[::2]
    assert rate == 8000
    assert np.array_equal(got, want)
