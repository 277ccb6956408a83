"""Pure-stdlib image codecs for the validation engine's decode checks.

The runtime has no PIL/imageio, so (per the build brief) the *decode
plumbing* is real and tested while heavyweight codecs are replaced by
deterministic stand-ins:

  * **PNG** — a real, spec-conformant subset: 8-bit RGB, zlib, all five
    scanline filters on decode, filter 0 on encode.  Lossless, so the
    per-row invariant is exact pixel equality.
  * **QJPG / QWEB** — deterministic stand-ins for JPEG/WebP: zlib over
    uniformly quantized pixels (step 4 → MSE ≈ 16/12 → PSNR ≈ 46.9 dB),
    exercising the lossy path's PSNR ≥ 40 dB invariant
    (BASELINE.json:15) with real reconstruction error.

Swapping in real JPEG/WebP later only changes ``decode_image``'s
dispatch table; every Spark-side schema/UDF/batch contract stays put.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_MAGIC = b"QJPG"
_QWEB_MAGIC = b"QWEB"
_QUANT_STEP = 4


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) → PNG bytes (filter 0, single IDAT)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_PAETH_VEC = np.vectorize(_paeth, otypes=[np.int32])


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports 8-bit RGB, filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError(f"unsupported PNG variant depth={depth} ctype={ctype}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(np.int32)
        off += 1 + stride
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line.copy()
            for x in range(3, stride):
                rec[x] = (rec[x] + rec[x - 3]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                ul = prev[x - 3] if x >= 3 else 0
                rec[x] = (rec[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, 3)


def encode_lossy(pixels: np.ndarray, fmt: str) -> bytes:
    """Deterministic lossy stand-in (quantize + zlib)."""
    h, w, _ = pixels.shape
    magic = _QJPG_MAGIC if fmt == "jpeg" else _QWEB_MAGIC
    q = (pixels.astype(np.int32) // _QUANT_STEP * _QUANT_STEP + _QUANT_STEP // 2).clip(0, 255)
    return magic + struct.pack(">IIB", w, h, _QUANT_STEP) + zlib.compress(
        q.astype(np.uint8).tobytes(), 6
    )


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] not in (_QJPG_MAGIC, _QWEB_MAGIC):
        raise ValueError("not a QJPG/QWEB payload")
    w, h, _step = struct.unpack(">IIB", data[4:13])
    raw = zlib.decompress(data[13:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by magic/format. Raises on corrupt payloads."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] in (_QJPG_MAGIC, _QWEB_MAGIC):
        return decode_lossy(data)
    raise ValueError(f"undecodable payload (fmt hint: {fmt})")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
