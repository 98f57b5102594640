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


def test_encode_many_byte_identical_to_per_term():
    """encode_postings_many must produce byte-identical blobs and block
    metadata to the per-term encoder for every term."""
    import numpy as np
    from elasticsearch_assets_ray.index.codec import (
        encode_postings,
        encode_postings_many,
    )

    rng = np.random.default_rng(42)
    n_terms = 23
    dfs = rng.integers(1, 500, n_terms)
    docs, tfs, dls, offs = [], [], [], [0]
    for df in dfs:
        d = np.sort(rng.choice(1 << 20, size=int(df), replace=False)).astype(np.int64)
        docs.append(d)
        tfs.append(rng.integers(1, 300, int(df)).astype(np.int64))
        dls.append(rng.integers(1, 5000, int(df)).astype(np.int64))
        offs.append(offs[-1] + int(df))
    enc = encode_postings_many(
        np.concatenate(docs), np.concatenate(tfs), np.concatenate(dls),
        np.array(offs, dtype=np.int64),
    )
    for i in range(n_terms):
        single = encode_postings(docs[i], tfs[i], dls[i])
        blob = bytes(enc["blob_buf"][enc["blob_offsets"][i] : enc["blob_offsets"][i + 1]])
        assert blob == single.blob, i
        lo, hi = enc["block_offsets"][i], enc["block_offsets"][i + 1]
        assert np.array_equal(enc["block_last"][lo:hi], single.block_last_docid)
        assert np.array_equal(enc["block_off"][lo:hi], single.block_offsets)
        assert np.array_equal(enc["block_maxtf"][lo:hi], single.block_max_tf)
        assert np.array_equal(enc["block_mindl"][lo:hi], single.block_min_dl)
        assert enc["df"][i] == single.df


def test_pack_bits_roundtrip():
    import numpy as np
    from elasticsearch_assets_ray.index.codec import pack_bits, unpack_bits

    rng = np.random.default_rng(1)
    for b in (1, 3, 7, 8, 13, 31, 33, 63, 64):
        n = int(rng.integers(1, 300))
        hi = (1 << b) - 1 if b < 64 else (1 << 63)
        vals = rng.integers(0, hi, n, dtype=np.uint64) if hi > 1 else np.zeros(n, np.uint64)
        buf = pack_bits(vals, b)
        back = unpack_bits(buf, n, b)
        assert np.array_equal(back, vals), b


def test_pfor_postings_roundtrip_with_outliers():
    import numpy as np
    from elasticsearch_assets_ray.index.codec import (
        decode_block_pfor,
        decode_postings_pfor,
        encode_postings_pfor,
    )

    rng = np.random.default_rng(2)
    df = 1000
    gaps = rng.integers(1, 50, df).astype(np.int64)
    gaps[::97] = 1 << 40  # outliers → patched exceptions
    docids = np.cumsum(gaps)
    tfs = rng.integers(1, 20, df).astype(np.int64)
    tfs[::131] = 100_000
    dls = rng.integers(1, 5000, df).astype(np.int64)
    ep = encode_postings_pfor(docids, tfs, dls)
    d2, t2 = decode_postings_pfor(ep.blob, df)
    assert np.array_equal(d2, docids) and np.array_equal(t2, tfs)
    # per-block decode matches too
    for j in range(len(ep.block_offsets)):
        prev = int(ep.block_last_docid[j - 1]) if j > 0 else 0
        dj, tj = decode_block_pfor(ep.blob, ep.block_offsets, j, df, prev)
        lo, hi = j * 128, min((j + 1) * 128, df)
        assert np.array_equal(dj, docids[lo:hi])
        assert np.array_equal(tj, tfs[lo:hi])
