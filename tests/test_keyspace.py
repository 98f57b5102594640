"""Keyspace partitioning: alphabet deal (P9), prefix DFS (P7), quantile
ranges (P8)."""

import duckdb
import numpy as np
import pytest

from elasticsearch_assets_ray.sources.keyspace import (
    ALPHABETS,
    KeySlice,
    KeyspaceIndex,
    prefix_dfs_partitions,
    quantile_key_ranges,
    round_robin_assignment,
)


def test_alphabets_match_reference_sizes():
    # reference id-utils/keys.ts:96-128
    assert len(ALPHABETS["base64url"]) == 64
    assert len(ALPHABETS["base64"]) == 66
    assert len(ALPHABETS["hexadecimal"]) == 16


def test_round_robin_assignment():
    ranges = round_robin_assignment("abcdef", 2)
    assert ranges == [["a", "c", "e"], ["b", "d", "f"]]
    # every char exactly once
    flat = [c for r in ranges for c in r]
    assert sorted(flat) == list("abcdef")
    with pytest.raises(ValueError):
        round_robin_assignment("abc", 4)


def _synth_keys(n=2000, seed=11):
    rng = np.random.default_rng(seed)
    alpha = "abcdef"
    # skewed: half the keys start with 'a'
    keys = []
    for _ in range(n):
        first = "a" if rng.random() < 0.5 else alpha[rng.integers(len(alpha))]
        rest = "".join(alpha[i] for i in rng.integers(0, len(alpha), 6))
        keys.append(first + rest)
    return np.array(keys, dtype=object)


def test_keyspace_counts():
    keys = _synth_keys()
    ks = KeyspaceIndex(keys)
    assert ks.count_prefix("a") == sum(1 for k in keys if k.startswith("a"))
    assert ks.count_range(None, None) == len(keys)
    assert ks.count_range("a", "b") == ks.count_prefix("a")


def test_prefix_dfs_invariants():
    keys = _synth_keys()
    ks = KeyspaceIndex(keys)
    slices = prefix_dfs_partitions(ks, "abcdef", max_count=200)
    # disjoint cover: every key matched by exactly one emitted prefix
    total = sum(s.count for s in slices)
    assert total == len(keys)
    for s in slices:
        assert s.count <= 200  # bounded (hot 'a' subtree was descended)
        assert ks.count_prefix(s.prefix) == s.count
    prefixes = [s.prefix for s in slices]
    for i, p in enumerate(prefixes):
        for q in prefixes[i + 1 :]:
            assert not p.startswith(q) and not q.startswith(p)
    # the hot prefix was split deeper than the cold ones
    assert any(len(s.prefix) > 1 and s.prefix.startswith("a") for s in slices)


def test_prefix_dfs_variable_length_keys():
    """A hot prefix that is itself a key must emit an exact slice when
    descending (src1 vs src10..src19 — the sf documents 'source' shape)."""
    keys = np.array(
        ["src1"] * 100 + [f"src1{d}" for d in range(10) for _ in range(30)],
        dtype=object,
    )
    ks = KeyspaceIndex(keys)
    slices = prefix_dfs_partitions(ks, "abcdefghijklmnopqrstuvwxyz0123456789", 50)
    assert sum(s.count for s in slices) == len(keys)
    exacts = [s for s in slices if s.exact]
    assert any(s.prefix == "src1" and s.count == 100 for s in exacts)
    for s in slices:
        assert s.count <= 50 or s.exact


def test_prefix_dfs_starting_depth():
    keys = _synth_keys()
    ks = KeyspaceIndex(keys)
    deep = prefix_dfs_partitions(ks, "abcdef", max_count=10**9, starting_depth=2)
    assert all(len(s.prefix) >= 2 for s in deep)
    assert sum(s.count for s in deep) == len(keys)


def test_quantile_ranges_match_sql():
    keys = _synth_keys()
    ks = KeyspaceIndex(keys)
    bounds = quantile_key_ranges(ks, 4)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys.tolist()])
    want = [
        r[0]
        for r in con.sql(
            """WITH s AS (SELECT k, row_number() OVER (ORDER BY k) rn FROM t),
               n AS (SELECT count(*) cnt FROM t)
               SELECT s.k FROM s, n WHERE s.rn IN ((1*cnt)//4+1, (2*cnt)//4+1, (3*cnt)//4+1)
               ORDER BY s.k"""
        ).fetchall()
    ]
    assert sorted(bounds) == want
    # ranges are balanced within 1 row
    parts = [ks.count_range(lo, hi) for lo, hi in zip([None, *bounds], [*bounds, None])]
    assert sum(parts) == len(keys)
    assert max(parts) - min(parts) <= max(1, len(keys) // 100)


def test_sorted_keyspace_matches_in_memory(ray_session, tmp_path):
    """SortedKeyspace (distributed layout + boundary probes) must agree
    with the in-memory KeyspaceIndex on every probe type."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.sources.keyspace import (
        KeyspaceIndex,
        SortedKeyspace,
        prefix_dfs_partitions,
        quantile_key_ranges,
    )

    rng = np.random.default_rng(7)
    alpha = "abcd"
    keys = [
        "".join(rng.choice(list(alpha), size=rng.integers(1, 6)))
        for _ in range(5000)
    ]
    src = tmp_path / "src"
    src.mkdir()
    # several files, unsorted, with duplicates spanning files
    t = pa.table({"k": pa.array(keys)})
    for i in range(4):
        pq.write_table(t.slice(i * 1250, 1250), str(src / f"f{i}.parquet"), row_group_size=300)
    mem = KeyspaceIndex(pa.array(keys))
    dist = SortedKeyspace.build(str(src), "k", str(tmp_path / "layout"))
    assert dist.n == mem.n
    for p in ["", "a", "ab", "abc", "d", "dd", "zz", "ba", "c"]:
        assert dist.count_prefix(p) == mem.count_prefix(p), p
    for lo, hi in [("a", "b"), (None, "c"), ("bc", None), ("aaa", "aab")]:
        assert dist.count_range(lo, hi) == mem.count_range(lo, hi), (lo, hi)
    for i in [0, 1, 17, 2499, 4999]:
        assert dist.key_at(i) == mem.key_at(i), i
    assert quantile_key_ranges(dist, 7) == quantile_key_ranges(mem, 7)
    a = prefix_dfs_partitions(dist, alpha, 100)
    b = prefix_dfs_partitions(mem, alpha, 100)
    assert a == b
    # fingerprint cache: rebuilding without input change reuses the layout
    dist2 = SortedKeyspace.build(str(src), "k", str(tmp_path / "layout"))
    assert dist2.n == dist.n


def test_sorted_keyspace_publish_is_atomic(ray_session, tmp_path):
    """A stale scratch dir and a stale (wrong-fingerprint) layout must
    both be replaced by a clean rebuild; the fingerprint marker gates
    reuse."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.sources.keyspace import SortedKeyspace

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({"k": pa.array(list("dcba"))}), str(src / "a.parquet"))
    layout = str(tmp_path / "layout")
    # stale scratch from a crashed builder + a stale layout without marker
    os.makedirs(layout + ".tmp-99999")
    os.makedirs(layout)
    with open(os.path.join(layout, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    ks = SortedKeyspace.build(str(src), "k", layout)
    assert ks.n == 4 and ks.key_at(0) == "a" and ks.count_prefix("c") == 1
    # input change → fingerprint mismatch → rebuild picks up the new rows
    pq.write_table(pa.table({"k": pa.array(list("xy"))}), str(src / "b.parquet"))
    ks2 = SortedKeyspace.build(str(src), "k", layout)
    assert ks2.n == 6 and ks2.count_prefix("x") == 1
    # unchanged input → reuse (marker matches)
    ks3 = SortedKeyspace.build(str(src), "k", layout)
    assert ks3.n == 6
