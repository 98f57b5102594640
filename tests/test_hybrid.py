"""Hybrid retrieval: reciprocal-rank fusion semantics + gate parity."""

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.query.hybrid import rrf_fuse


def _ranked(qid, ids):
    n = len(ids)
    return pa.table(
        {
            "query_id": pa.array([qid] * n, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        }
    )


def test_rrf_matches_manual_sum():
    """Fused score is exactly sum(1/(60+rank)) over the lists a doc
    appears in; docs in both lists beat single-list docs at equal rank."""
    a = _ranked(0, [10, 11, 12])
    b = _ranked(0, [12, 10, 13])
    out = rrf_fuse([a, b], k=10)
    got = dict(zip(out["doc_id"].to_pylist(), out["rrf"].to_pylist()))
    assert got[10] == 1 / 61 + 1 / 62
    assert got[12] == 1 / 63 + 1 / 61
    assert got[11] == 1 / 62
    assert got[13] == 1 / 63
    # both-list docs rank first
    assert out["doc_id"].to_pylist()[:2] == [10, 12]


def test_rrf_tie_breaks_by_doc_id_and_windows_to_k():
    a = _ranked(0, [5, 9])
    b = _ranked(0, [9, 5])  # symmetric: both docs tie exactly
    out = rrf_fuse([a, b], k=1)
    assert out["doc_id"].to_pylist() == [5]  # tie -> lower doc id
    assert out["rank"].to_pylist() == [1]


def test_rrf_multi_query_and_empty_inputs():
    a = pa.concat_tables([_ranked(0, [1, 2]), _ranked(7, [3])])
    empty = _ranked(0, [])
    out = rrf_fuse([a, empty], k=5)
    per_q = {}
    for q, d in zip(out["query_id"].to_pylist(), out["doc_id"].to_pylist()):
        per_q.setdefault(q, []).append(d)
    assert per_q == {0: [1, 2], 7: [3]}
    assert rrf_fuse([empty, empty]).num_rows == 0


def test_rrf_custom_id_columns_and_rank_constant():
    a = _ranked(0, [4])
    b = _ranked(0, [4]).rename_columns(["query_id", "vec_id", "rank"])
    out = rrf_fuse([a, b], k=5, rank_constant=10, id_cols=["doc_id", "vec_id"])
    assert out["rrf"].to_pylist() == [1 / 11 + 1 / 11]


def test_linear_fuse_semantics():
    """minmax-normalized weighted fusion: extremes map to w/0, missing
    docs contribute 0, degenerate windows normalize to 0."""
    import pyarrow as pa

    from elasticsearch_assets_ray.query.hybrid import linear_fuse

    bm = pa.table(
        {
            "query_id": [0, 0, 0],
            "doc_id": [1, 2, 3],
            "rank": [1, 2, 3],
            "score_r": [10.0, 5.0, 0.0],
        }
    )
    co = pa.table(
        {
            "query_id": [0, 0],
            "vec_id": [2, 4],
            "rank": [1, 2],
            "sim_r": [0.9, 0.1],
        }
    )
    out = linear_fuse(
        [bm, co], weights=[0.7, 0.3], k=10,
        id_cols=["doc_id", "vec_id"], score_cols=["score_r", "sim_r"],
    )
    got = dict(zip(out["doc_id"].to_pylist(), out["fused"].to_pylist()))
    assert got[1] == 0.7            # bm25 max, absent from knn
    assert got[2] == 0.7 * 0.5 + 0.3  # mid bm25 + knn max
    assert got[3] == 0.0            # bm25 min
    assert got[4] == 0.0            # knn min
    # ranking: 0.7 > 0.65, tie (3,4) at 0 broken by doc id
    assert out["doc_id"].to_pylist() == [1, 2, 3, 4]
    # degenerate window: all-equal scores normalize to 0
    flat = pa.table(
        {"query_id": [0, 0], "doc_id": [7, 8], "rank": [1, 2], "score_r": [3.0, 3.0]}
    )
    out2 = linear_fuse([flat], weights=[1.0], k=5)
    assert out2["fused"].to_pylist() == [0.0, 0.0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        linear_fuse([flat], weights=[1.0, 2.0])


def test_top_metrics_sharded_parity(sf_dir):
    """top_metrics: metrics of the extremum docs; sharded == single."""
    from elasticsearch_assets_ray.pipelines.registry import documents_index, sharded_searcher
    from elasticsearch_assets_ray.query.engine import Searcher

    idx = documents_index(sf_dir)
    single = Searcher(idx)
    sh = sharded_searcher(idx)
    a = single.top_metrics("data", "n_chars", ["orig_doc_id", "lang"], size=4)
    b = sh.top_metrics("data", "n_chars", ["orig_doc_id", "lang"], size=4)
    assert a.to_pydict() == b.to_pydict()
    # winners really are the max-n_chars matches
    v = a["sort_value"].to_numpy(zero_copy_only=False)
    assert list(v) == sorted(v, reverse=True)
