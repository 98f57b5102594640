"""Pure-Python PNG codec (stdlib zlib + numpy filter reconstruction).

Upgrades the multimodal decode stage from a fake-header stub to a REAL
codec with zero third-party dependencies: 8-bit grayscale (color type 0),
the full PNG filter set (None/Sub/Up/Average/Paeth) on decode, CRC-checked
chunks.  Scope is deliberately the grayscale subset — the point is that
``MediaDecodeStage(codec="png")`` exercises a genuine decode kernel
(inflate + per-row unfiltering) with the same actor-pool plumbing a
PIL/ffmpeg codec would use (reference parity: the multimodal operators of
SURVEY.md §2 are additions beyond the reference's surface).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(gray: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w) uint8 array as an 8-bit grayscale PNG.

    ``filter_type`` applies ONE filter to every row (0 is the normal
    choice; 1-4 exist so tests can exercise every decoder branch)."""
    if gray.ndim != 2 or gray.dtype != np.uint8:
        raise ValueError("png_encode expects an (h, w) uint8 array")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    h, w = gray.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    g16 = gray.astype(np.int16)
    prior = np.zeros(w, dtype=np.int16)
    rows = []
    for y in range(h):
        cur = g16[y]
        left = np.concatenate(([0], cur[:-1]))
        upleft = np.concatenate(([0], prior[:-1]))
        if filter_type == 0:
            out = cur
        elif filter_type == 1:  # Sub
            out = cur - left
        elif filter_type == 2:  # Up
            out = cur - prior
        elif filter_type == 3:  # Average
            out = cur - ((left + prior) >> 1)
        else:  # Paeth
            out = cur - _paeth(left, prior, upleft)
        rows.append(bytes([filter_type]) + (out & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    idat = zlib.compress(b"".join(rows), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int16 rows."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.int16)


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to an (h, w) uint8 array.

    Implements the full filter set; raises on interlace, non-grayscale
    color types, bit depths other than 8, or CRC mismatch."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIG)
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 0:
                raise ValueError(
                    f"unsupported PNG: bit depth {depth}, color type {ctype} "
                    "(this codec handles 8-bit grayscale)"
                )
            if interlace != 0:
                raise ValueError("unsupported PNG: interlaced")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG: nonzero compression/filter method")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("PNG data length mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    ftypes = scan[:, 0]
    rows = scan[:, 1:].astype(np.int16)
    out = np.zeros((h, w), dtype=np.int16)
    prior = np.zeros(w, dtype=np.int16)
    for y in range(h):
        ft = int(ftypes[y])
        cur = rows[y].copy()
        if ft == 0:
            pass
        elif ft == 2:  # Up — vectorizes across the row
            cur = (cur + prior) & 0xFF
        elif ft in (1, 3, 4):
            # left-dependent filters: sequential in x (the spec's data
            # dependency), vector ops per element kept minimal
            rec = np.zeros(w, dtype=np.int16)
            left = 0
            upleft = 0
            for x in range(w):
                up = int(prior[x])
                if ft == 1:
                    v = cur[x] + left
                elif ft == 3:
                    v = cur[x] + ((left + up) >> 1)
                else:
                    p = left + up - upleft
                    pa_ = abs(p - left)
                    pb = abs(p - up)
                    pc_ = abs(p - upleft)
                    pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else upleft)
                    v = cur[x] + pred
                rec[x] = v & 0xFF
                left = int(rec[x])
                upleft = up
            cur = rec
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur & 0xFF
        prior = out[y]
    return out.astype(np.uint8)
