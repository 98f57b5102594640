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
