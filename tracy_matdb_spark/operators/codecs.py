"""Pure-Python media codecs for the multimodal columns (no codec libs).

The image lacks PIL/av, but several media formats are decodable from
their public specifications with nothing beyond zlib + numpy:

- **PNG** (W3C spec / RFC 2083): 8-bit grayscale / RGB / RGBA,
  non-interlaced — chunk parsing with CRC verification, zlib inflate,
  and all five scanline filters (None/Sub/Up/Average/Paeth). The
  encoder can emit any filter type per row (``filter_mode="cycle"``
  cycles through all five), so the decoder's filter reversal is
  exercised end-to-end without external fixtures.
- **BMP**: 24-bit uncompressed BI_RGB (bottom-up rows, 4-byte pad).
- **PPM** (netpbm P6): trivial header + raw RGB.
- **WAV**: PCM16 via the stdlib ``wave`` module.

Video containers genuinely need a demuxer library and stay gated in
operators/multimodal.py (clear NotImplementedError); everything above
is a real decode path used by `multimodal.decode_real`.

Images decode to ``(h, w, c)`` uint8 arrays (gray -> c=1); audio
decodes to ``(n_samples, n_channels)`` int16.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color types supported: 0=gray, 2=RGB, 6=RGBA
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes. ``filter_mode``:
    "none" (filter 0 rows) or "cycle" (row y uses filter y % 5 — makes
    every decoder filter path load-bearing)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    raw = arr.reshape(h, w * c)
    bpp = c  # bytes per pixel (8-bit depth)
    lines = []
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        cur = raw[y]
        ft = 0 if filter_mode == "none" else y % 5
        if ft == 0:
            out = cur.copy()
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            out = (cur.astype(np.int16) - left).astype(np.uint8)
        elif ft == 2:  # Up
            out = (cur.astype(np.int16) - prev).astype(np.uint8)
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            out = (cur.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth — per-byte (spec-sequential)
            out = np.empty_like(cur)
            for i in range(len(cur)):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                out[i] = (int(cur[i]) - _paeth(a, b, cc)) & 0xFF
        lines.append(bytes([ft]) + out.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
        data = tag + body
        return struct.pack(">I", len(body)) + data + struct.pack(">I", zlib.crc32(data))

    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8. Supports 8-bit gray/RGB/RGBA,
    non-interlaced; CRCs verified; palette/16-bit/interlace raise."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (signature mismatch)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or interlace or comp or filt:
        raise NotImplementedError(
            f"PNG subset: 8-bit gray/RGB/RGBA non-interlaced only "
            f"(got depth={depth} color={ctype} interlace={interlace})"
        )
    c = _CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG decompressed size mismatch")
    bpp = c
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub
            cur = line
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif ft == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            cur = line
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + (a + int(prev[i])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("BMP encoder: (h, w, 3) RGB required")
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\0" * pad
    off = 14 + 40
    total = off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", total, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0 or h <= 0:
        raise NotImplementedError("BMP subset: 24-bit BI_RGB bottom-up only")
    row = w * 3
    pad = (-row) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    pos = off
    for y in range(h - 1, -1, -1):
        out[y] = np.frombuffer(data, np.uint8, count=row, offset=pos).reshape(w, 3)[:, ::-1]
        pos += row + pad
    return out


# ---------------------------------------------------------------------------
# PPM (P6) and WAV (PCM16)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("PPM encoder: (h, w, 3) RGB required")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise NotImplementedError("PPM subset: maxval 255 only")
    return np.frombuffer(parts[3], np.uint8, count=h * w * 3).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(arr.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(arr.astype("<i2").tobytes())
    return bio.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n_samples, n_channels) int16, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("WAV subset: PCM16 only")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        arr = np.frombuffer(f.readframes(n), dtype="<i2").reshape(n, ch)
    return arr, rate


# ---------------------------------------------------------------------------
# sniffing dispatch
# ---------------------------------------------------------------------------


def sniff(data: bytes) -> str:
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "ppm":
        return decode_ppm(data)
    raise NotImplementedError(
        f"image format {kind!r}: only PNG/BMP/PPM decode without a codec "
        "library (JPEG/WebP/AVIF need one)"
    )
