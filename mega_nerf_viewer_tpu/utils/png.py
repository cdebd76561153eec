"""Minimal dependency-free PNG writer.

TPU-native analogue of the reference's libpng screenshot writer
(``src/imwrite.cpp:11-68``), which uses the fastest settings (compression
level 0, Huffman-only).  We mirror that choice with zlib level 1.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(image: np.ndarray, compress_level: int = 1) -> bytes:
    """Encode an RGB(A) uint8 image ``[H, W, 3|4]`` to PNG bytes."""
    image = np.asarray(image)
    if image.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if image.ndim != 3 or image.shape[2] not in (3, 4):
        raise ValueError("encode_png expects [H, W, 3|4]")
    h, w, c = image.shape
    color_type = 6 if c == 4 else 2
    raw = b"".join(
        b"\x00" + image[row].tobytes() for row in range(h))
    data = zlib.compress(raw, compress_level)
    return b"".join([
        b"\x89PNG\r\n\x1a\n",
        _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                    0, 0, 0)),
        _chunk(b"IDAT", data),
        _chunk(b"IEND", b""),
    ])


def write_png(path: str, image: np.ndarray, compress_level: int = 1) -> bool:
    """Write an RGB(A) uint8 image ``[H, W, 3|4]`` as a PNG file."""
    try:
        with open(path, "wb") as f:
            f.write(encode_png(image, compress_level))
        return True
    except OSError:
        return False


def decode_png(blob: bytes) -> np.ndarray:
    """Decode PNGs produced by :func:`encode_png` (tests only)."""
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = c = None
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit == 8
            c = 4 if color_type == 6 else 3
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * c + 1
    rows = []
    for row in range(h):
        line = raw[row * stride:(row + 1) * stride]
        filt, body = line[0], np.frombuffer(line[1:], np.uint8)
        assert filt == 0, "only filter 0 supported"
        rows.append(body)
    return np.stack(rows).reshape(h, w, c)


def read_png(path: str) -> np.ndarray:
    """Read back PNGs written by :func:`write_png` (tests only)."""
    with open(path, "rb") as f:
        return decode_png(f.read())
