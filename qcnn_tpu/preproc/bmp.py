"""Minimal BMP decoder (24-bit uncompressed), replacing the reference's
third-party bitmap_image.hpp (only get_pixel on 24-bpp files is used there,
BmpImgIO.cc:73-103). Pure NumPy; returns float32 HWC in **BGR** channel order —
the reference's native layout (Caffe models are BGR-trained)."""

from __future__ import annotations

import struct

import numpy as np


def read_bmp(path: str) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP file to a (H, W, 3) float32 BGR array."""
    with open(path, "rb") as f:
        return decode_bmp(f.read(), name=path)


def decode_bmp(data: bytes, name: str = "<bytes>") -> np.ndarray:
    """Decode 24-bit BI_RGB BMP bytes to a (H, W, 3) float32 BGR array."""
    path = name
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP file")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    (header_size,) = struct.unpack_from("<I", data, 14)
    if header_size < 40:
        raise ValueError(f"{path}: unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    (planes, bpp) = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"{path}: only 24-bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    end = pixel_offset + row_bytes * height
    if len(data) < end:
        raise ValueError(f"{path}: truncated pixel data")
    rows = np.frombuffer(data[pixel_offset:end], dtype=np.uint8)
    rows = rows.reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)  # stored as BGR triples
    if not top_down:
        img = img[::-1]
    return img.astype(np.float32)
