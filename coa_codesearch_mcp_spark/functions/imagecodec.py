"""Pure numpy + stdlib image codecs: PNG, BMP, PPM.

Round-4 upgrade: the multimodal decode kernel was an honest
``NotImplementedError`` stub because no codec LIBRARY (PIL, cv2,
libjpeg) ships in this environment — but PNG, BMP and PPM are fully
decodable from their PUBLIC specifications with nothing beyond
``zlib`` (stdlib) and numpy:

- PNG: W3C PNG specification (RFC 2083): chunk layout, zlib-deflated
  scanlines, per-row filters 0-4 (None/Sub/Up/Average/Paeth),
  color types 0/2/3/4/6 at bit depth 8, non-interlaced;
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24/32-bit,
  bottom-up BGR rows padded to 4 bytes;
- PPM: netpbm P6, maxval 255.

JPEG/WebP/AVIF/video remain environment-blocked (they need entropy
coders and DCT libraries worth not reimplementing) and still raise
NotImplementedError through ``multimodal.decode_image``.

The decoder returns HxWx3 uint8 RGB (gray expanded, alpha dropped) —
one uniform contract for the feature kernels. ``encode_png`` writes
filter-0 (or caller-chosen filters for test coverage) non-interlaced
PNGs, so tests round-trip real bytes through the real decoder.

Vectorization notes: filters None/Sub/Up vectorize fully (Sub is a
per-pixel prefix sum -> cumsum mod 256 over a (w, bpp) view); Average
and Paeth have an intra-row sequential dependency and fall back to a
per-pixel loop on exactly the rows that use them — correctness first,
and real-world encoders emit long runs of 0/1/2 rows.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ----------------------------------------------------------------- PNG

def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: h rows of (1 filter byte + stride bytes) -> h x stride."""
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub: prefix sum with stride bpp
            v = line.copy()
            view = v[: (stride // bpp) * bpp].reshape(-1, bpp)
            rec = np.cumsum(view, axis=0).reshape(-1) % 256
            if stride % bpp:  # cannot happen at bit depth 8, kept safe
                rec = np.concatenate([rec, line[len(rec):]])
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype == 3:  # Average (sequential in-row)
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif ftype == 4:  # Paeth (sequential in-row)
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + _paeth(int(left), int(prev[i]), int(ul))) % 256
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} on row {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG: bit depth {depth} / compression {comp} unsupported "
            "(8-bit non-interlaced only)"
        )
    if interlace != 0:
        raise NotImplementedError("PNG: Adam7 interlacing unsupported")
    if ctype_ not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unknown color type {ctype_}")
    ch = _PNG_CHANNELS[ctype_]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: scanline payload size mismatch")
    px = _unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if ctype_ == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        return plte[px[:, :, 0]]
    if ctype_ == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_ == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)  # alpha dropped
    if ctype_ == 6:
        return px[:, :, :3].copy()  # alpha dropped
    return px


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """8-bit RGB (HxWx3) or gray (HxW) -> non-interlaced PNG.
    ``filters``: optional per-row filter types (0/1/2) for tests that
    want to exercise the unfilter paths; default all-0."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch
    rows = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)] if filters else 0
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            shifted = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - shifted) % 256
        elif f == 2:  # Up
            enc = (line - prev) % 256
        else:
            raise ValueError("encode_png: only filters 0/1/2 supported")
        rows.append(f)
        rows.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype_b: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype_b
            + body
            + struct.pack(">I", zlib.crc32(ctype_b + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------- BMP

def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP: pre-BITMAPINFOHEADER formats")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP: only uncompressed 24/32-bit supported (bpp={bpp}, "
            f"compression={compression})"
        )
    h = abs(h_signed)
    nb = bpp // 8
    row_bytes = ((w * nb + 3) // 4) * 4
    px = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=offset
    ).reshape(h, row_bytes)[:, : w * nb].reshape(h, w, nb)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) -> RGB, alpha dropped


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row_bytes = ((w * 3 + 3) // 4) * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, -1)  # bottom-up BGR
    payload = body.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(payload), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload), 2835, 2835, 0, 0)
    )
    return header + payload


# ----------------------------------------------------------------- PPM

def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM")
    # header: P6 <w> <h> <maxval>, tokens separated by whitespace,
    # '#' comments run to end of line (netpbm spec)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("PPM: only maxval 255 supported")
    return (
        np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


# ------------------------------------------------------------- resize

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (index mapping — pure numpy)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, align-corners=False convention (pure numpy)."""
    h, w = img.shape[:2]
    fimg = img.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.floor(ys).clip(0, h - 1).astype(int)
    x0 = np.floor(xs).clip(0, w - 1).astype(int)
    y1 = (y0 + 1).clip(0, h - 1)
    x1 = (x0 + 1).clip(0, w - 1)
    wy = (ys - y0).clip(0, 1)[:, None, None]
    wx = (xs - x0).clip(0, 1)[None, :, None]
    top = fimg[y0][:, x0] * (1 - wx) + fimg[y0][:, x1] * wx
    bot = fimg[y1][:, x0] * (1 - wx) + fimg[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).round().clip(0, 255).astype(np.uint8)
