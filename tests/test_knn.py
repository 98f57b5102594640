"""Index-resident kNN (ES dense_vector / knn search): attach sidecar,
exact cosine vs numpy, filtered kNN, partial coverage mask, sharded
scatter-gather parity, hybrid RRF serving."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from elasticsearch_assets_ray.index.vectors import attach_vectors, load_meta
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher

DIM = 16


def _docstore_ids(idx: str) -> np.ndarray:
    ids = []
    for f in sorted(glob.glob(os.path.join(idx, "docstore", "part-*.parquet"))):
        ids.append(pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy())
    return np.concatenate(ids).astype(np.int64)


@pytest.fixture(scope="module")
def vec_index(built_index):
    """built_index + synthetic vectors attached for 80% of docs (every
    5th doc left vector-less to exercise the presence mask)."""
    idx, _ = built_index
    all_ids = _docstore_ids(idx)
    keep = all_ids[np.arange(all_ids.size) % 5 != 0]
    rng = np.random.default_rng(9)
    mat = rng.standard_normal((keep.size, DIM))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(keep),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1).astype(np.float32)), DIM
                ),
            }
        )
    )
    meta = attach_vectors(ds, idx, key_col="vid", doc_key="doc_id")
    assert meta["dim"] == DIM and meta["n_vectors"] == keep.size
    return idx, keep, mat


def _expect_topk(keep, mat, qvec, k, allowed=None):
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = qvec / np.linalg.norm(qvec)
    sims = m @ q
    ids = keep
    if allowed is not None:
        sel = np.isin(ids, allowed)
        ids, sims = ids[sel], sims[sel]
    order = np.lexsort((ids, -np.round(sims, 9)))[:k]
    return ids[order].tolist(), sims[order]


def test_knn_exact_vs_numpy(vec_index):
    idx, keep, mat = vec_index
    s = Searcher(idx)
    rng = np.random.default_rng(4)
    qvecs = rng.standard_normal((3, DIM))
    res = s.knn(np.arange(3), qvecs, k=7)
    for qi in range(3):
        want_ids, want_sims = _expect_topk(keep, mat, qvecs[qi], 7)
        got = res.filter(pa.compute.equal(res["query_id"], qi))
        assert got["doc_id"].to_pylist() == want_ids
        np.testing.assert_allclose(
            got["sim"].to_numpy(zero_copy_only=False), want_sims, rtol=1e-6
        )
    # docs without vectors never appear
    missing = set(_docstore_ids(idx)) - set(keep.tolist())
    assert not missing.intersection(res["doc_id"].to_pylist())


def test_knn_filtered_restricts_to_match_set(vec_index):
    idx, keep, mat = vec_index
    s = Searcher(idx)
    allowed = np.sort(s.match_ids("def load"))
    assert allowed.size > 0
    rng = np.random.default_rng(5)
    qvec = rng.standard_normal(DIM)
    res = s.knn(np.array([0]), qvec[None, :], k=9, filter_query="def load")
    want_ids, _ = _expect_topk(keep, mat, qvec, 9, allowed=allowed)
    assert res["doc_id"].to_pylist() == want_ids
    assert set(res["doc_id"].to_pylist()) <= set(allowed.tolist())


def test_knn_sharded_parity(vec_index):
    idx, keep, mat = vec_index
    s = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=3, use_actors=False)
    rng = np.random.default_rng(6)
    qvecs = rng.standard_normal((2, DIM))
    for fq in (None, "def load"):
        a = s.knn(np.arange(2), qvecs, k=8, filter_query=fq)
        b = sh.knn(np.arange(2), qvecs, k=8, filter_query=fq)
        assert a.equals(b)


def test_hybrid_sharded_parity_and_shape(vec_index):
    idx, keep, mat = vec_index
    s = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=3, use_actors=False)
    rng = np.random.default_rng(7)
    qvec = rng.standard_normal(DIM)
    a = s.hybrid("def load index", qvec, k=6)
    b = sh.hybrid("def load index", qvec, k=6)
    assert a.equals(b)
    assert a.column_names == ["doc_id", "rank", "rrf"]
    assert a["rank"].to_pylist() == list(range(1, a.num_rows + 1))


def test_attach_idempotent_and_missing_sidecar(built_index, tmp_path):
    idx, _ = built_index
    meta1 = load_meta(idx)
    # second attach returns the stored meta without rewriting
    ds = ray.data.from_arrow(
        pa.table({"vid": pa.array([0], pa.int64()),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(np.zeros(DIM, dtype=np.float32)), DIM)})
    )
    meta2 = attach_vectors(ds, idx, key_col="vid", doc_key="doc_id")
    assert meta1 == meta2
    # an index without a sidecar refuses knn with a clear error
    from elasticsearch_assets_ray.index.build import build_index as _bi  # noqa: F401
    s = Searcher(idx)
    s.index_dir = str(tmp_path)  # no vectors/ here
    s._vec_meta = False
    with pytest.raises(RuntimeError, match="no vector sidecar"):
        s.knn(np.array([0]), np.zeros((1, DIM)), k=1)


def test_knn_excludes_tombstoned_docs(vec_index):
    """Deleted docs never surface from kNN (Lucene deleted-doc
    semantics) — regression for the unfiltered path skipping the
    tombstone mask."""
    idx, keep, mat = vec_index
    s = Searcher(idx)
    rng = np.random.default_rng(12)
    qvec = rng.standard_normal(DIM)
    top = s.knn(np.array([0]), qvec[None, :], k=3)
    victim = int(top["doc_id"][0].as_py())
    s2 = Searcher(idx)
    s2._tombstones = np.array([victim], dtype=np.int64)
    after = s2.knn(np.array([0]), qvec[None, :], k=3)
    assert victim not in after["doc_id"].to_pylist()
    # filtered path inherits the exclusion through match_ids
    after_f = s2.knn(np.array([0]), qvec[None, :], k=9, filter_query="def load")
    assert victim not in after_f["doc_id"].to_pylist()


def test_knn_duplicate_vector_tie_breaks_by_doc_id(built_index, tmp_path, ray_session):
    """Two bit-identical vectors both equal to the query: the k=1 result
    must be the LOWER docID (the round9/docID contract) — regression for
    raw-sim argpartition dropping the tie group at the boundary."""
    import shutil

    idx_src, _ = built_index
    idx = str(tmp_path / "idx")
    shutil.copytree(idx_src, idx)
    shutil.rmtree(os.path.join(idx, "vectors"), ignore_errors=True)
    all_ids = _docstore_ids(idx)
    rng = np.random.default_rng(21)
    mat = rng.standard_normal((all_ids.size, DIM)).astype(np.float32)
    probe = rng.standard_normal(DIM).astype(np.float32)
    hi_pair = np.sort(all_ids)[[5, 50]]  # two docs, same vector
    for d in hi_pair:
        mat[np.flatnonzero(all_ids == d)[0]] = probe
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(all_ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1)), DIM
                ),
            }
        )
    )
    attach_vectors(ds, idx, key_col="vid", doc_key="doc_id")
    s = Searcher(idx)
    res = s.knn(np.array([0]), probe.astype(np.float64)[None, :], k=1)
    assert res["doc_id"].to_pylist() == [int(hi_pair[0])]
    res2 = s.knn(np.array([0]), probe.astype(np.float64)[None, :], k=2)
    assert res2["doc_id"].to_pylist() == [int(hi_pair[0]), int(hi_pair[1])]


def test_attach_rejects_mixed_dims_and_duplicate_keys(built_index, tmp_path, ray_session):
    import shutil

    idx_src, _ = built_index
    idx = str(tmp_path / "idx2")
    shutil.copytree(idx_src, idx)
    shutil.rmtree(os.path.join(idx, "vectors"), ignore_errors=True)
    ids = _docstore_ids(idx)[:4]
    dup = pa.table(
        {
            "vid": pa.array(np.concatenate([ids, ids[:1]])),
            "embedding": pa.array(
                [[0.0] * DIM] * 5, pa.list_(pa.float32())
            ),
        }
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="duplicate vector keys"):
        attach_vectors(ray.data.from_arrow(dup), idx, key_col="vid", doc_key="doc_id")


def test_knn_similarity_cutoff_prefix():
    """similarity keeps a per-query PREFIX with contiguous ranks."""
    import numpy as np
    import pyarrow as pa

    from elasticsearch_assets_ray.query.engine import knn_similarity_cut

    t = pa.table(
        {
            "query_id": [0, 0, 0, 1, 1],
            "doc_id": [5, 6, 7, 8, 9],
            "rank": [1, 2, 3, 1, 2],
            "sim": [0.9, 0.5, 0.1, 0.4, 0.39999999999],
        }
    )
    out = knn_similarity_cut(t, 0.4)
    # round9 contract: 0.39999999999 rounds to exactly 0.4 -> doc 9 kept
    assert out["doc_id"].to_pylist() == [5, 6, 8, 9]
    assert out["rank"].to_pylist() == [1, 2, 1, 2]
    out3 = knn_similarity_cut(t, 0.45)
    assert out3["doc_id"].to_pylist() == [5, 6]
    assert knn_similarity_cut(t, None) is t
