"""Dependency-free image codec: 8-bit PNG and 24-bit BMP, numpy + zlib.

The container has no Pillow, which until r8 left ``decode_image`` a pure
stub. Both formats here are fully PUBLIC specifications — PNG per RFC
2083 / the W3C PNG spec (chunk layout, zlib-compressed scanlines, the
five byte filters including Paeth), BMP per the Windows
BITMAPINFOHEADER layout — and both are decodable with nothing beyond
the standard library's ``zlib`` and numpy, so "no PIL in the container"
no longer means "no real decode". Pillow remains the preferred path in
a full deployment (SIMD, JPEG, every color type); this module is the
correct fallback that keeps the multimodal lanes REAL here:

    decode_png / encode_png   8-bit gray / gray+alpha / RGB / RGBA,
                              non-interlaced; decoder handles all five
                              row filters, encoder emits filter 0
    decode_bmp / encode_bmp   24-bit uncompressed BITMAPINFOHEADER,
                              bottom-up or top-down, row padding honored
    sniff_format              magic-byte detection (png/bmp/None)

Decoders return ``np.ndarray`` of shape (height, width, channels),
dtype uint8; encoders accept the same (2-D arrays are treated as
single-channel). Scale stance: decode runs INSIDE Arrow-batched
``mapInPandas`` workers (see operators/multimodal.py) — one image per
call, partition-parallel, nothing driver-side; the per-row Python in
the filter-undo loop is bounded by image height and only runs for
filter types with sequential intra-row dependencies (Sub/Avg/Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only; palette needs a PLTE
# lookup and sub-byte packing — refused loudly, Pillow territory)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        crc_bytes = payload[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            raise ValueError("truncated PNG chunk (missing CRC)")
        (crc,) = struct.unpack(">I", crc_bytes)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(
                f"PNG chunk {ctype.decode('latin-1')!r} CRC mismatch — corrupt payload"
            )
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray/gray+alpha/RGB/RGBA)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {color} beyond the "
                    "8-bit gray/GA/RGB/RGBA subset — use Pillow"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise NotImplementedError("interlaced/nonstandard PNG — use Pillow")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline payload has unexpected size")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        above = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized, no intra-row dependency
            cur = (line + above) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(above[x])
                if ftype == 1:
                    rec = line[x] + a
                elif ftype == 3:
                    rec = line[x] + (a + b) // 2
                else:
                    c = int(above[x - bpp]) if x >= bpp else 0
                    rec = line[x] + _paeth(a, b, c)
                cur[x] = rec & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} is not in the spec")
        out[y] = cur.astype(np.uint8)
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """Encode uint8 (h, w) or (h, w, ch) with ch in {1,2,3,4}; filter 0."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP — use Pillow")
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} beyond the 24-bit "
            "uncompressed subset — use Pillow"
        )
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_offset
    ).reshape(height, row_bytes)[:, : width * 3]
    img = px.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if bottom_up else img).copy()


def encode_bmp(img: np.ndarray) -> bytes:
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_bmp takes (h, w, 3) RGB or (h, w) gray")
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    bgr = arr[:, :, ::-1]
    body = b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )  # bottom-up
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def decode_any(payload: bytes) -> np.ndarray:
    fmt = sniff_format(bytes(payload))
    if fmt == "png":
        return decode_png(bytes(payload))
    if fmt == "bmp":
        return decode_bmp(bytes(payload))
    raise NotImplementedError(
        "payload is neither PNG nor BMP; other formats (JPEG, ...) need Pillow"
    )
