"""Posting-list codec: docID delta + LEB128 varint, 128-doc blocks, with
per-block metadata (last_docid, max_tf, min_doclen) for block-max WAND.

Both encode and decode are numpy-vectorized — no Python loop over
integers.  BM25's per-block score upper bound is derived at query time
from (max_tf, min_doclen): the partial score is increasing in tf and
decreasing in doc length, so ``bound = idf * sat(max_tf, min_dl)`` is a
valid block max without needing global stats at build time.

The reference delegates all of this to Lucene inside Elasticsearch
(SURVEY.md framing); layout follows the classic SPIMI/block-compressed
postings described in public IR literature (Manning et al., IIR ch.4-5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128


def varint_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode an array of non-negative ints, vectorized.

    Returns ``(bytes uint8 array, per-value byte count int64 array)``.
    For each value the number of 7-bit groups is computed, then each output
    byte position is filled with one vectorized pass (≤10 passes for 64-bit
    ints) into a scatter buffer.
    """
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(a.shape, dtype=np.int64)
    tmp = a.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum(1, (nbits + 6) // 7)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        vals = (a[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > j
        out[starts[mask] + j] = vals.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    out, _ = varint_encode_arr(values)
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, vectorized via reduceat."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # element index for each byte: 0-based cumulative count of *previous* ends
    elem_idx = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=elem_idx[1:])
    n = int(is_last.sum())
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[elem_idx]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    out = np.add.reduceat(contrib, starts)
    if count is not None:
        assert n == count, f"decoded {n} values, expected {count}"
    return out.astype(np.uint64)


@dataclass
class EncodedPostings:
    """One term's (or term-range's) encoded posting list."""

    blob: bytes  # concatenated blocks: varint(docid deltas) ++ varint(tfs)
    df: int  # number of postings
    # per-block skip/max metadata (len = ceil(df / BLOCK_SIZE))
    block_last_docid: np.ndarray  # int64
    block_offsets: np.ndarray  # int64 byte offset of each block in blob
    block_max_tf: np.ndarray  # int32
    block_min_dl: np.ndarray  # int32 (min doc length among docs in block)


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray
) -> EncodedPostings:
    """Encode a docID-sorted posting list into 128-doc blocks.

    Each block stores varint(delta docids) then varint(tfs); the first
    delta of a block is taken against the previous block's last docid
    (0 for the first block), so blocks are independently skippable given
    ``block_last_docid``.
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    df = docids.size
    assert df > 0
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE

    deltas = np.empty(df, dtype=np.int64)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    # reset delta at block starts to be relative to prev block's last docid
    starts = np.arange(1, n_blocks) * BLOCK_SIZE
    deltas[starts] = docids[starts] - docids[starts - 1]  # same thing; kept explicit

    block_last = docids[np.minimum(np.arange(1, n_blocks + 1) * BLOCK_SIZE, df) - 1]
    pieces: list[bytes] = []
    offsets = np.zeros(n_blocks, dtype=np.int64)
    max_tf = np.zeros(n_blocks, dtype=np.int32)
    min_dl = np.zeros(n_blocks, dtype=np.int32)
    off = 0
    for i in range(n_blocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, df)
        enc = varint_encode(deltas[lo:hi]) + varint_encode(tfs[lo:hi])
        offsets[i] = off
        off += len(enc)
        pieces.append(enc)
        max_tf[i] = tfs[lo:hi].max()
        min_dl[i] = doclens[lo:hi].min()
    return EncodedPostings(
        blob=b"".join(pieces),
        df=df,
        block_last_docid=block_last.astype(np.int64),
        block_offsets=offsets,
        block_max_tf=max_tf,
        block_min_dl=min_dl,
    )


def decode_postings(blob: bytes, df: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full posting blob → (docids int64, tfs int64)."""
    vals = varint_decode(blob)
    assert vals.size == 2 * df or df == 0, (vals.size, df)
    # interleaved per block: BLOCK deltas then BLOCK tfs
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    docids = np.empty(df, dtype=np.int64)
    tfs = np.empty(df, dtype=np.int64)
    pos = 0
    for i in range(n_blocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, df)
        n = hi - lo
        docids[lo:hi] = vals[pos : pos + n].astype(np.int64)
        tfs[lo:hi] = vals[pos + n : pos + 2 * n].astype(np.int64)
        pos += 2 * n
    np.cumsum(docids, out=docids)
    return docids, tfs


def encode_postings_many(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_offsets: np.ndarray,
) -> dict:
    """Encode MANY terms' posting lists in one vectorized pass.

    ``term_offsets``: int64[n_terms+1] boundaries into the flat,
    term-major, docID-sorted-within-term arrays.  Produces byte-identical
    blobs to per-term :func:`encode_postings` (same block layout:
    per 128-doc block, varint(deltas) then varint(tfs)), but with NO
    Python loop over terms or blocks — everything is numpy segment
    arithmetic + two varint passes + two vectorized scatters.

    Returns a dict with per-term numpy arrays and the shared byte buffer:
    ``blob_buf`` (uint8), ``blob_offsets`` (int64[n_terms+1] into blob_buf),
    ``df``, ``cf``, ``min_docid``, ``max_docid``, ``n_blocks`` per term, and
    per-term flattened block metadata (``block_last``, ``block_off``,
    ``block_maxtf``, ``block_mindl``) with ``block_offsets``
    (int64[n_terms+1] boundaries into the block arrays).
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    term_offsets = np.ascontiguousarray(term_offsets, dtype=np.int64)
    n_terms = len(term_offsets) - 1
    N = docids.size
    df = np.diff(term_offsets)
    assert (df > 0).all(), "every term needs >=1 posting"

    # --- block segmentation (per term, blocks of BLOCK_SIZE) ---
    rel = np.arange(N, dtype=np.int64) - np.repeat(term_offsets[:-1], df)
    is_block_start = (rel % BLOCK_SIZE) == 0
    bstarts = np.flatnonzero(is_block_start)
    n_blocks_total = bstarts.size
    bends = np.concatenate((bstarts[1:], [N]))
    nb_per_term = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    term_block_off = np.concatenate(([0], np.cumsum(nb_per_term))).astype(np.int64)

    # --- deltas: plain diff, reset to absolute docid at term starts ---
    deltas = np.empty(N, dtype=np.int64)
    if N:
        deltas[0] = docids[0]
        np.subtract(docids[1:], docids[:-1], out=deltas[1:])
        deltas[term_offsets[:-1]] = docids[term_offsets[:-1]]

    dbytes, dlen = varint_encode_arr(deltas)
    tbytes, tlen = varint_encode_arr(tfs)

    # --- per-block byte extents ---
    dB = np.add.reduceat(dlen, bstarts) if N else np.empty(0, dtype=np.int64)
    tB = np.add.reduceat(tlen, bstarts) if N else np.empty(0, dtype=np.int64)
    L = dB + tB
    O = np.concatenate(([0], np.cumsum(L))).astype(np.int64)  # block out offsets
    Dstart = np.concatenate(([0], np.cumsum(dB))).astype(np.int64)
    Tstart = np.concatenate(([0], np.cumsum(tB))).astype(np.int64)

    out = np.empty(int(O[-1]), dtype=np.uint8)
    # scatter delta bytes: block k's delta bytes land at O[k]..O[k]+dB[k]
    if dbytes.size:
        shift_d = O[:-1] - Dstart[:-1]
        pos_d = np.arange(dbytes.size, dtype=np.int64) + np.repeat(shift_d, dB)
        out[pos_d] = dbytes
        shift_t = O[:-1] + dB - Tstart[:-1]
        pos_t = np.arange(tbytes.size, dtype=np.int64) + np.repeat(shift_t, tB)
        out[pos_t] = tbytes

    # --- metadata ---
    block_last = docids[bends - 1]
    block_maxtf = np.maximum.reduceat(tfs, bstarts).astype(np.int32) if N else np.empty(0, np.int32)
    block_mindl = np.minimum.reduceat(dls, bstarts).astype(np.int32) if N else np.empty(0, np.int32)
    term_blob_off = O[term_block_off]  # int64[n_terms+1]
    block_rel_off = O[:-1] - np.repeat(term_blob_off[:-1], nb_per_term)

    cf = np.add.reduceat(tfs, term_offsets[:-1]) if N else np.empty(0, dtype=np.int64)
    return {
        "blob_buf": out,
        "blob_offsets": term_blob_off,
        "df": df,
        "cf": cf,
        "min_docid": docids[term_offsets[:-1]] if N else np.empty(0, np.int64),
        "max_docid": docids[term_offsets[1:] - 1] if N else np.empty(0, np.int64),
        "n_blocks": nb_per_term.astype(np.int32),
        "block_last": block_last,
        "block_off": block_rel_off,
        "block_maxtf": block_maxtf,
        "block_mindl": block_mindl,
        "block_offsets": term_block_off,
    }


# ---------------------------------------------------------------------------
# PForDelta (patched frame-of-reference) — alternative block codec
# ---------------------------------------------------------------------------


def pack_bits(vals: np.ndarray, b: int) -> bytes:
    """Pack n values at b bits each (little-endian bit order), vectorized."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = v.size
    if n == 0 or b == 0:
        return b""
    total_bits = n * b
    out = np.zeros(total_bits // 64 + 2, dtype=np.uint64)
    pos = np.arange(n, dtype=np.uint64) * np.uint64(b)
    wi = (pos >> np.uint64(6)).astype(np.int64)
    sh = pos & np.uint64(63)
    if b < 64:
        v = v & ((np.uint64(1) << np.uint64(b)) - np.uint64(1))
    np.bitwise_or.at(out, wi, v << sh)
    spill = (sh + np.uint64(b)) > np.uint64(64)
    if spill.any():
        np.bitwise_or.at(
            out, wi[spill] + 1, v[spill] >> (np.uint64(64) - sh[spill])
        )
    nbytes = (total_bits + 7) // 8
    return out.view(np.uint8)[:nbytes].tobytes()


def unpack_bits(buf: bytes, n: int, b: int) -> np.ndarray:
    """Inverse of :func:`pack_bits` → uint64[n]."""
    if n == 0 or b == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    words = np.zeros(len(raw) // 8 + 2, dtype=np.uint64)
    words[: len(raw) // 8] = np.frombuffer(raw[: (len(raw) // 8) * 8], dtype=np.uint64)
    rem = len(raw) % 8
    if rem:
        tail = np.zeros(8, dtype=np.uint8)
        tail[:rem] = raw[-rem:]
        words[len(raw) // 8] = tail.view(np.uint64)[0]
    pos = np.arange(n, dtype=np.uint64) * np.uint64(b)
    wi = (pos >> np.uint64(6)).astype(np.int64)
    sh = pos & np.uint64(63)
    res = words[wi] >> sh
    need_hi = (sh + np.uint64(b)) > np.uint64(64)
    if need_hi.any():
        res[need_hi] |= words[wi[need_hi] + 1] << (np.uint64(64) - sh[need_hi])
    if b < 64:
        res &= (np.uint64(1) << np.uint64(b)) - np.uint64(1)
    return res


def _pfor_section(vals: np.ndarray) -> bytes:
    """One PFor section: width chosen at the ~87.5th percentile of bit
    lengths; larger values become patched exceptions (pos, high-bits)
    appended as varints (Zukowski et al. / NewPFD family, public
    literature)."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = v.size
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbits = np.maximum(nbits, 1)
    b = int(np.percentile(nbits, 87.5))
    b = max(1, min(64, b))
    exc_mask = nbits > b
    n_exc = int(exc_mask.sum())
    if n_exc > 255:  # degenerate distribution: widen to cover everything
        b = int(nbits.max())
        exc_mask = nbits > b
        n_exc = 0
    packed = pack_bits(v, b)
    exc_pos = np.flatnonzero(exc_mask).astype(np.uint64)
    exc_hi = v[exc_mask] >> np.uint64(b)
    exc = varint_encode(np.concatenate([exc_pos, exc_hi])) if n_exc else b""
    head = bytes([b, n_exc]) + len(exc).to_bytes(2, "little")
    return head + packed + exc


def _pfor_unsection(buf: bytes, n: int) -> tuple[np.ndarray, int]:
    """Decode one section → (values uint64[n], bytes consumed)."""
    b, n_exc = buf[0], buf[1]
    exc_len = int.from_bytes(buf[2:4], "little")
    packed_len = (n * b + 7) // 8
    vals = unpack_bits(buf[4 : 4 + packed_len], n, b)
    if n_exc:
        exc = varint_decode(buf[4 + packed_len : 4 + packed_len + exc_len], count=2 * n_exc)
        pos = exc[:n_exc].astype(np.int64)
        hi = exc[n_exc:]
        vals[pos] |= hi << np.uint64(b)
    return vals, 4 + packed_len + exc_len


def encode_postings_pfor(
    docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> EncodedPostings:
    """PForDelta encoding with the same block structure / metadata as the
    varint codec (per 128-doc block: delta section then tf section)."""
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    df = docids.size
    assert df > 0
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    deltas = np.empty(df, dtype=np.int64)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    block_last = docids[np.minimum(np.arange(1, n_blocks + 1) * BLOCK_SIZE, df) - 1]
    pieces, offsets = [], np.zeros(n_blocks, dtype=np.int64)
    max_tf = np.zeros(n_blocks, dtype=np.int32)
    min_dl = np.zeros(n_blocks, dtype=np.int32)
    off = 0
    for i in range(n_blocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, df)
        enc = _pfor_section(deltas[lo:hi].astype(np.uint64)) + _pfor_section(
            tfs[lo:hi].astype(np.uint64)
        )
        offsets[i] = off
        off += len(enc)
        pieces.append(enc)
        max_tf[i] = tfs[lo:hi].max()
        min_dl[i] = dls[lo:hi].min()
    return EncodedPostings(
        blob=b"".join(pieces),
        df=df,
        block_last_docid=block_last.astype(np.int64),
        block_offsets=offsets,
        block_max_tf=max_tf,
        block_min_dl=min_dl,
    )


def decode_postings_pfor(blob: bytes, df: int) -> tuple[np.ndarray, np.ndarray]:
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    docids = np.empty(df, dtype=np.int64)
    tfs = np.empty(df, dtype=np.int64)
    pos = 0
    for i in range(n_blocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, df)
        n = hi - lo
        d, used = _pfor_unsection(blob[pos:], n)
        pos += used
        t, used = _pfor_unsection(blob[pos:], n)
        pos += used
        docids[lo:hi] = d.astype(np.int64)
        tfs[lo:hi] = t.astype(np.int64)
    np.cumsum(docids, out=docids)
    return docids, tfs


def decode_block_pfor(
    blob: bytes, offsets: np.ndarray, block_idx: int, df: int, prev_last_docid: int
) -> tuple[np.ndarray, np.ndarray]:
    n = min(BLOCK_SIZE, df - block_idx * BLOCK_SIZE)
    lo = int(offsets[block_idx])
    d, used = _pfor_unsection(blob[lo:], n)
    t, _ = _pfor_unsection(blob[lo + used :], n)
    docids = np.cumsum(d.astype(np.int64)) + prev_last_docid
    return docids, t.astype(np.int64)


def decode_block(
    blob: bytes, offsets: np.ndarray, block_idx: int, df: int, prev_last_docid: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block (for WAND skipping) → (docids, tfs)."""
    n_blocks = offsets.size
    lo = int(offsets[block_idx])
    hi = int(offsets[block_idx + 1]) if block_idx + 1 < n_blocks else len(blob)
    n = min(BLOCK_SIZE, df - block_idx * BLOCK_SIZE)
    vals = varint_decode(blob[lo:hi], count=2 * n)
    deltas = vals[:n].astype(np.int64)
    tfs = vals[n:].astype(np.int64)
    docids = np.cumsum(deltas) + prev_last_docid
    return docids, tfs


def encode_positions(pos_flat: np.ndarray, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Delta+LEB128-encode per-posting position lists (posting i holds
    ``tfs[i]`` ascending positions; lists are concatenated in posting
    order).  The first position of each posting is absolute, the rest are
    deltas — all vectorized.  Returns (bytes uint8, per-value byte counts)
    so callers can slice term boundaries out of one group-wide encode."""
    if pos_flat.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(tfs)))[:-1].astype(np.int64)
    d = pos_flat.astype(np.int64).copy()
    d[1:] -= pos_flat[:-1].astype(np.int64)
    d[starts] = pos_flat[starts]
    return varint_encode_arr(d.astype(np.uint64))


def decode_positions(blob: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions` for ONE posting run: returns
    the flat int32 position array (slice per posting with cumsum(tfs))."""
    total = int(np.asarray(tfs).sum())
    if total == 0:
        return np.empty(0, dtype=np.int32)
    d = varint_decode(blob, count=total).astype(np.int64)
    lens = np.asarray(tfs, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    c = np.cumsum(d)
    base = c[starts] - d[starts]
    return (c - np.repeat(base, lens)).astype(np.int32)
