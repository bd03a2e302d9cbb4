"""Multimodal column plumbing tests (decode itself is stubbed — the
schema/batching/partitioning around it is what's under test)."""

from __future__ import annotations

import pytest

from p6__mapreduce_spark.multimodal.columns import (
    attach_binary_payload,
    decode_image,
    extract_features,
    frame_sample,
)


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


def test_decode_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError):
        decode_image(attach_binary_payload(docs_df(spark)))


def test_resize_is_explicit_stub(spark):
    import pytest as _pytest

    from p6__mapreduce_spark.multimodal.columns import resize_image

    df = attach_binary_payload(docs_df(spark))
    with _pytest.raises(NotImplementedError):
        resize_image(df, 32, 32)
