"""YUV4MPEG2 (Y4M) encode/decode in pure NumPy — the video analogue of
``ppm.py``/``wav.py``: the one mainstream video container whose frames
are raw uncompressed planes, so header parse + frame extraction is a
REAL decode without ffmpeg. Compressed video (MP4/H.264/VP9/AV1) stays
honestly gated in ``columns.decode_video``.

Format: one ASCII header line ``YUV4MPEG2 W<w> H<h> F25:1 C444\\n``
followed by frames, each ``FRAME\\n`` + w*h bytes per plane (Y, U, V —
C444 = no chroma subsampling, three full planes)."""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray) -> bytes:
    """frames: uint8 array (n_frames, 3, h, w) in C444 planar order."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[1] != 3:
        raise ValueError(f"(n, 3, h, w) uint8 required, got {frames.dtype}{frames.shape}")
    n, _, h, w = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F25:1 C444\n" % (w, h)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> np.ndarray:
    """Parse the stream header + every FRAME -> (n, 3, h, w) uint8.
    Raises on foreign containers, unsupported chroma, or truncation."""
    buf = bytes(data)
    if not buf.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = buf.index(b"\n")
    w = h = None
    chroma = "C420jpeg"  # the spec default when no C tag is present
    for tag in buf[len(_MAGIC) + 1 : nl].split(b" "):
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            chroma = tag.decode()
    if w is None or h is None:
        raise ValueError("missing W/H header tags")
    if chroma != "C444":
        raise ValueError(f"only C444 supported, got {chroma}")
    frame_bytes = w * h * 3
    pos, frames = nl + 1, []
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("expected FRAME marker")
        body = buf[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError("truncated frame")
        frames.append(np.frombuffer(body, dtype=np.uint8).reshape(3, h, w))
        pos = fnl + 1 + frame_bytes
    return np.stack(frames) if frames else np.empty((0, 3, h, w), dtype=np.uint8)
