"""Minimal deterministic image codecs (stdlib only).

The container image has no PIL/libjpeg, so the engine ships its own tiny
codecs for the synthetic fixture images (BASELINE.json input_hint: decoded
pixels must be allclose, PSNR>=40 dB for lossy formats):

* ``png``  — real, spec-conformant 8-bit RGB PNG (zlib, filter 0). Lossless.
* ``bmp``  — real BI_RGB 24-bit BMP. Lossless.
* ``jpeg`` — STUB: PIL/libjpeg are unavailable here, so "jpeg" rows carry a
  deterministic lossy container (magic ``SOQJ``) holding pixels quantized to
  6 bits/channel. That keeps the lossy verification path real (PSNR ~= 42.7 dB
  < inf, >= 40) while remaining decodable everywhere. When PIL is importable
  the real JPEG codec is used instead.

Encode/decode are exercised through Arrow-batched pandas UDFs in
operators/multimodal.py; this module is plain numpy on byte strings.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - env-dependent
    from PIL import Image  # type: ignore
    import io

    HAVE_PIL = True
except ImportError:  # pragma: no cover
    Image = None
    HAVE_PIL = False

_SOQJ_MAGIC = b"SOQJ"


# --- PNG ------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 -> RGB8 PNG bytes."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack(">IIBB", payload[:10])
            assert bit == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        ftype, body = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            body = (body.astype(np.int16) + prev).astype(np.uint8)
        else:  # pragma: no cover - our encoder only writes filter 0
            raise ValueError(f"unsupported PNG filter {ftype}")
        rows.append(body)
        prev = body
    return np.stack(rows).reshape(h, w, 3)


# --- BMP ------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up rows, BGR order
        body += pixels[y, :, ::-1].tobytes() + pad
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM", "not a BMP"
    (offset,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(data[offset + y * row_size : offset + y * row_size + w * 3], dtype=np.uint8)
        out[h - 1 - y] = row.reshape(w, 3)[:, ::-1]
    return out


# --- "JPEG" (lossy stub when PIL absent) ------------------------------------

_JPEG_QUANT_BITS = 2  # drop 2 LSB/channel -> PSNR ~= 42.7 dB


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    if HAVE_PIL:  # pragma: no cover
        buf = io.BytesIO()
        Image.fromarray(pixels, "RGB").save(buf, "JPEG", quality=quality)
        return buf.getvalue()
    h, w, _ = pixels.shape
    q = (pixels >> _JPEG_QUANT_BITS).astype(np.uint8)
    return _SOQJ_MAGIC + struct.pack(">HHB", w, h, _JPEG_QUANT_BITS) + zlib.compress(q.tobytes(), 6)


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:4] == _SOQJ_MAGIC:
        w, h, bits = struct.unpack(">HHB", data[4:9])
        q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
        # dequantize to bucket midpoint
        return ((q.astype(np.uint16) << bits) + (1 << (bits - 1)) - 1).clip(0, 255).astype(np.uint8)
    if HAVE_PIL:  # pragma: no cover
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError("real JPEG decode requires PIL/libjpeg (not in this container)")


# --- dispatch ----------------------------------------------------------------

_ENCODERS = {"png": encode_png, "bmp": encode_bmp, "jpeg": encode_jpeg}
_DECODERS = {"png": decode_png, "bmp": decode_bmp, "jpeg": decode_jpeg}


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](pixels)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
