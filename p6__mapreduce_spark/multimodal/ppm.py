"""Pure-NumPy PPM (P6) codec + nearest-neighbor resize.

PPM is the one mainstream raster format decodable without any codec
library: an ASCII header (magic, width, height, maxval, separated by
whitespace, ``#`` comments allowed) followed by a raw big-endian RGB
raster (1 byte/channel at maxval <= 255). That makes the multimodal
decode/resize path REAL in this container — `np.frombuffer` + a
20-line header parser — while keeping the same mapInPandas plumbing a
Pillow/ffmpeg-backed decoder would use for JPEG/PNG (those stay
honestly gated in ``columns.py``).

Format reference: the netpbm P6 spec (public); layout mirrored by
every PPM writer. Round-trip + planted-image byte-exactness are
asserted in ``tests/test_multimodal.py``.
"""

from __future__ import annotations

import numpy as np

_MAXVAL_MAX = 255


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 array -> P6 bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _read_header_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    # skip whitespace and '#'-to-EOL comments, then read one token
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and buf[pos : pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 bytes -> (H, W, 3) uint8 array. Strict on magic/maxval/raster
    length — a corrupt payload raises instead of yielding garbage
    pixels (fail fast beats silently training on noise)."""
    data = bytes(data)
    if data[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {data[:2]!r})")
    pos = 2
    fields = []
    for _ in range(3):
        tok, pos = _read_header_token(data, pos)
        fields.append(int(tok))
    w, h, maxval = fields
    if not (0 < maxval <= _MAXVAL_MAX):
        raise ValueError(f"unsupported maxval {maxval} (only 1-byte samples)")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    pos += 1  # exactly ONE whitespace byte separates maxval from raster
    raster = data[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError(f"raster truncated: want {w * h * 3} bytes, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure indexing:
    src_row(r) = floor(r * H / height), src_col(c) = floor(c * W / width)
    (the standard floor mapping, reproduced literally in the DuckDB
    oracle so resize is hash-checked cross-engine)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad target size {width}x{height}")
    h, w = pixels.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return pixels[rows][:, cols]
