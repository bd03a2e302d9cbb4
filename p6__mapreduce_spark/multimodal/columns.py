"""Multimodal columns: opaque binary payloads + typed metadata.

Design (per the driver's extension spec): image/audio/video content
travels as a ``binary`` column with a typed metadata struct alongside;
decode / feature-extract / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so a 100 TB corpus streams through
executors batch-by-batch with no driver involvement and no row-at-a-
time Python.

The decode step needs codec libraries (Pillow/ffmpeg) that are NOT in
this container — it is stubbed behind NotImplementedError, while the
Spark-side plumbing (schema, batching, partitioning, UDF signatures)
is real and tested with a deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_FIELDS = "mime string, width int, height int, n_bytes long"


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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode binary payloads to pixel arrays. STUB: requires an image
    codec library not present in this environment."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow) not available "
        "in this container; see extract_features for the tested plumbing"
    )


def resize_image(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Resize decoded images to (width, height). STUB behind an
    import-try: the mapInPandas plumbing is identical to
    extract_features; only the batch body needs a codec library."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image resize requires Pillow, not available in this container; "
            "the Arrow batch plumbing is the same as extract_features"
        ) from None
    raise NotImplementedError("codec present but resize body intentionally unimplemented")


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
