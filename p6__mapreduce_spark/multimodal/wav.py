"""Canonical PCM WAV encode/decode in pure NumPy — the audio analogue
of ``ppm.py``: a container format whose payload is raw samples, so the
decode path is REAL (header parse + sample extraction) without any
codec library. Compressed audio (MP3/AAC/OGG) stays honestly gated in
``columns.decode_audio``.

Format written/read: RIFF/WAVE with a 16-byte PCM fmt chunk and one
data chunk — the 44-byte canonical layout every tool emits for
uncompressed mono/stereo int16 audio.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples -> canonical 44-byte-header PCM WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"int16 samples required, got {samples.dtype}")
    data = samples.tobytes()  # little-endian on all supported platforms
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH",
        16,  # PCM fmt chunk size
        1,  # audio format: PCM
        1,  # channels: mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + data


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF/fmt/data chunks -> (sample_rate, int16 sample array).

    Walks the chunk list properly (a LIST/INFO chunk before data is
    legal WAV), validates PCM/16-bit/mono, and raises on truncation or
    a foreign container rather than emitting garbage."""
    buf = bytes(data)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_code != 1 or bits != 16 or channels != 1:
                raise ValueError(
                    f"only mono 16-bit PCM supported (fmt={fmt_code}, "
                    f"channels={channels}, bits={bits})"
                )
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("truncated data chunk")
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return int(rate), samples
