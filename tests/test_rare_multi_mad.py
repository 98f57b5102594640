"""rare_terms / multi_terms / median_absolute_deviation — brute-force
semantics plus single-vs-sharded exactness (the rare_terms filter must
run AFTER the global merge: locally-rare-but-globally-common buckets)."""

import collections

import numpy as np
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher

Q = "def load index"


@pytest.fixture(scope="module")
def single(built_index):
    idx, _ = built_index
    return Searcher(idx)


@pytest.fixture(scope="module")
def sharded(built_index):
    idx, _ = built_index
    return ShardedSearcher(idx, n_shards=3, use_actors=False)


def _match_col(s, query, col):
    ids = s.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
    return s.hydrate(np.sort(ids), columns=[col])[col].to_pylist()


def test_rare_terms_brute_force(single):
    counts = collections.Counter(
        str(v) for v in _match_col(single, Q, "doc_len") if v is not None
    )
    got = single.rare_terms(Q, "doc_len", max_doc_count=2)
    want = sorted(
        ((c, v) for v, c in counts.items() if c <= 2), key=lambda cv: (cv[0], cv[1])
    )
    assert list(zip(got["count"].to_pylist(), got["value"].to_pylist())) == want
    assert got.num_rows > 0  # the corpus has a long tail at this field


def test_rare_terms_sharded_parity_and_global_filter(single, sharded):
    """Sharded == single, including buckets that are rare on every shard
    but common globally (lang counts are huge; none may leak through)."""
    for by, mdc in (("doc_len", 1), ("doc_len", 3), ("lang", 2)):
        a = single.rare_terms(Q, by, max_doc_count=mdc)
        b = sharded.rare_terms(Q, by, max_doc_count=mdc)
        assert a.to_pydict() == b.to_pydict()
    # every lang bucket is common: a local-filter bug would return rows
    assert sharded.rare_terms(Q, "lang", max_doc_count=2).num_rows == 0


def test_multi_terms_brute_force_and_parity(single, sharded):
    ids = single.all_scores(Q)["doc_id"].to_numpy(zero_copy_only=False)
    meta = single.hydrate(np.sort(ids), columns=["lang", "doc_len"])
    counts = collections.Counter(
        (l, str(d))
        for l, d in zip(meta["lang"].to_pylist(), meta["doc_len"].to_pylist())
        if l is not None and d is not None
    )
    want = sorted(
        ((-c, k[0], k[1]) for k, c in counts.items())
    )[:10]
    got = single.multi_terms(Q, ("lang", "doc_len"), size=10)
    assert [
        (-c, l, d)
        for c, l, d in zip(
            got["count"].to_pylist(), got["lang"].to_pylist(), got["doc_len"].to_pylist()
        )
    ] == want
    sh = sharded.multi_terms(Q, ("lang", "doc_len"), size=10)
    assert got.to_pydict() == sh.to_pydict()


def test_mad_brute_force_and_parity(single, sharded):
    vals = np.array(
        [v for v in _match_col(single, Q, "doc_len") if v is not None], dtype=float
    )
    med = np.percentile(vals, 50, method="linear")
    want = float(np.percentile(np.abs(vals - med), 50, method="linear"))
    got = single.mad(Q, "doc_len")
    assert got == pytest.approx(want, abs=0, rel=0)  # exact, not approximate
    assert sharded.mad(Q, "doc_len") == got


def test_mad_empty_match_set(single):
    assert single.mad("zzzzneverappears", "doc_len") is None
