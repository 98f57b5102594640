"""ES composite aggregation: after_key-paginated bucket scan —
single-vs-sharded parity, cursor semantics, and pagination exactness."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher

SOURCES = (("lang", None), ("doc_len", 100.0))


@pytest.fixture(scope="module")
def single(built_index):
    idx, _ = built_index
    return Searcher(idx)


@pytest.fixture(scope="module")
def sharded(built_index):
    idx, _ = built_index
    return ShardedSearcher(idx, n_shards=3, use_actors=False)


def _pages(searcher, query, size):
    """Drive the cursor to exhaustion, returning the concatenated pages."""
    out, after = [], None
    for _ in range(500):
        page, after = searcher.composite(query, SOURCES, size=size, after=after)
        if page.num_rows == 0:
            break
        out.append(page)
        if page.num_rows < size:
            break
    return pa.concat_tables(out) if out else pa.table({})


def test_composite_full_scan_equals_group_count(single):
    """One giant page equals a brute-force group count of the match set."""
    q = "def load index"
    page, after = single.composite(q, SOURCES, size=10_000)
    ids = single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
    meta = single.hydrate(np.sort(ids), columns=["lang", "doc_len"])
    want: dict = {}
    for lang, dl in zip(meta["lang"].to_pylist(), meta["doc_len"].to_pylist()):
        if lang is None or dl is None:
            continue  # ES skips docs missing any source value
        key = (lang, float(dl // 100) * 100.0)
        want[key] = want.get(key, 0) + 1
    got = {
        (l, b): c
        for l, b, c in zip(
            page["lang"].to_pylist(),
            page["doc_len"].to_pylist(),
            page["count"].to_pylist(),
        )
    }
    assert got == want
    keys = list(zip(page["lang"].to_pylist(), page["doc_len"].to_pylist()))
    assert keys == sorted(keys)  # key-ascending bucket order
    assert after == keys[-1]


def test_composite_pagination_equals_full_scan(single):
    full, _ = single.composite("def load index", SOURCES, size=10_000)
    paged = _pages(single, "def load index", size=3)
    assert paged.to_pydict() == full.to_pydict()


def test_composite_sharded_parity(single, sharded):
    for size in (2, 5, 100):
        a = _pages(single, "def load index", size)
        b = _pages(sharded, "def load index", size)
        assert a.to_pydict() == b.to_pydict()


def test_composite_after_cursor_strictly_greater(single):
    page1, after = single.composite("def load", SOURCES, size=4)
    page2, _ = single.composite("def load", SOURCES, size=4, after=after)
    k1 = list(zip(page1["lang"].to_pylist(), page1["doc_len"].to_pylist()))
    k2 = list(zip(page2["lang"].to_pylist(), page2["doc_len"].to_pylist()))
    assert all(k > after for k in k2)
    assert not set(k1) & set(k2)


def test_composite_after_arity_validated(single):
    with pytest.raises(ValueError):
        single.composite("def load", SOURCES, size=4, after=("python",))


def test_composite_empty_when_cursor_past_end(single):
    page, after = single.composite("def load", SOURCES, size=4, after=("~~~~", 1e12))
    assert page.num_rows == 0 and after is None


def test_composite_skips_null_sources(null_index):
    """Docs with a null source value form no bucket (missing_bucket=false)."""
    s = Searcher(null_index)
    page, _ = s.composite("def load", (("lang", None),), size=100)
    assert page["lang"].to_pylist() == ["python"]
    n_matches = s.match_ids("def load").size
    assert page["count"].to_pylist()[0] == n_matches // 2
