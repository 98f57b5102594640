import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_assets_ray.index.codec import (
    BLOCK_SIZE,
    decode_block,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    for vals in ([0], [127], [128], [2**35, 0, 1], [2**63 - 1], list(range(300))):
        a = np.array(vals, dtype=np.uint64)
        assert varint_decode(varint_encode(a)).tolist() == vals
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_sizes():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip_fuzz(vals):
    a = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(a))
    assert out.tolist() == vals


def _random_postings(n, seed=0):
    rng = np.random.default_rng(seed)
    docids = np.cumsum(rng.integers(1, 10_000, n, dtype=np.int64))
    tfs = rng.integers(1, 200, n, dtype=np.int64)
    dls = rng.integers(1, 5_000, n, dtype=np.int64)
    return docids, tfs, dls


def test_postings_roundtrip_multiblock():
    for n in (1, BLOCK_SIZE - 1, BLOCK_SIZE, BLOCK_SIZE + 1, 1000):
        docids, tfs, dls = _random_postings(n, seed=n)
        ep = encode_postings(docids, tfs, dls)
        d, t = decode_postings(ep.blob, ep.df)
        assert np.array_equal(d, docids)
        assert np.array_equal(t, tfs)
        n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        assert len(ep.block_offsets) == n_blocks
        assert ep.block_last_docid[-1] == docids[-1]


def test_block_metadata_bounds():
    docids, tfs, dls = _random_postings(1000, seed=7)
    ep = encode_postings(docids, tfs, dls)
    for i in range(len(ep.block_offsets)):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, 1000)
        assert ep.block_max_tf[i] == tfs[lo:hi].max()
        assert ep.block_min_dl[i] == dls[lo:hi].min()
        assert ep.block_last_docid[i] == docids[hi - 1]


def test_decode_single_block():
    docids, tfs, dls = _random_postings(1000, seed=3)
    ep = encode_postings(docids, tfs, dls)
    for i in (0, 3, len(ep.block_offsets) - 1):
        prev = int(ep.block_last_docid[i - 1]) if i > 0 else 0
        d, t = decode_block(ep.blob, ep.block_offsets, i, ep.df, prev)
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, 1000)
        assert np.array_equal(d, docids[lo:hi])
        assert np.array_equal(t, tfs[lo:hi])


def test_compression_ratio_reasonable():
    # dense small-gap postings should compress well below raw 16 B/posting
    docids = np.arange(0, 50_000, 3, dtype=np.int64)
    n = docids.size
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 100, dtype=np.int64)
    ep = encode_postings(docids, tfs, dls)
    assert len(ep.blob) < n * 3
