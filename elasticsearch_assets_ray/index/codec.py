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


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints, vectorized.

    For each value the number of 7-bit groups is computed, then each output
    byte position is filled with one vectorized pass (≤10 passes for 64-bit
    ints) into a scatter buffer.
    """
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
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
