"""Delete-by-query tombstones + expunge merge (index/deletes.py).

Semantics under test (the Elasticsearch ``_delete_by_query`` +
``_forcemerge?only_expunge_deletes`` analogs):
- tombstoned docs vanish from every search/count IMMEDIATELY;
- BM25 collection stats (N, df, avgdl) are UNCHANGED until expunge —
  surviving docs keep their exact pre-delete scores (Lucene deleted-doc
  semantics);
- repeat delete_by_query calls are idempotent;
- pruned top-k stays identical to the exhaustive path under tombstones
  (incl. the θ-seed guard);
- expunge produces an index bit-identical in scoring to a FRESH build
  over the surviving documents (stats recomputed, positions preserved).
"""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.deletes import (
    delete_by_query,
    expunge_deletes,
    load_tombstones,
)
from elasticsearch_assets_ray.query.engine import Searcher

QUERIES = [
    "import",
    "def main",
    "+def +return",
    "def main return value",
    '"def main"',
]
DELETE_Q = "+import"


@pytest.fixture(scope="module")
def del_setup(tmp_path_factory):
    """Corpus + positional index + baseline scores captured BEFORE any
    deletion, then DELETE_Q tombstoned."""
    from elasticsearch_assets_ray.corpus import write_corpus

    corpus = str(tmp_path_factory.mktemp("del_corpus"))
    write_corpus(corpus, 400, seed=7, files=2, row_group_size=128)
    idx = str(tmp_path_factory.mktemp("del_idx"))
    build_index(
        corpus,
        idx,
        target_partition_rows=128,
        runs_per_bucket=2,
        num_shards=2,
        index_positions=True,
    )
    s0 = Searcher(idx)
    baseline = {q: _score_map(s0, q) for q in QUERIES}
    to_delete = set(
        s0.all_scores(DELETE_Q)["doc_id"].to_numpy(zero_copy_only=False).tolist()
    )
    assert 0 < len(to_delete) < s0.n_docs
    n_new = delete_by_query(idx, DELETE_Q)
    assert n_new == len(to_delete)
    return corpus, idx, baseline, to_delete


def _score_map(s: Searcher, q: str) -> dict[int, float]:
    t = s.all_scores(q)
    return dict(
        zip(
            t["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            t["score"].to_numpy(zero_copy_only=False).tolist(),
        )
    )


def test_tombstones_exclude_and_preserve_scores(del_setup):
    _, idx, baseline, deleted = del_setup
    s = Searcher(idx)
    assert s._tombstones.size == len(deleted)
    for q in QUERIES:
        got = _score_map(s, q)
        assert not (set(got) & deleted), q
        want = {d: v for d, v in baseline[q].items() if d not in deleted}
        # stats unchanged until expunge ⇒ surviving scores BIT-identical
        assert got == want, q


def test_delete_is_idempotent(del_setup):
    _, idx, _, deleted = del_setup
    assert delete_by_query(idx, DELETE_Q) == 0
    assert load_tombstones(idx).size == len(deleted)


def test_pruned_topk_matches_exhaustive_under_tombstones(del_setup):
    _, idx, _, _ = del_setup
    sp = Searcher(idx, prune=True)
    se = Searcher(idx, prune=False)
    for q in QUERIES:
        rp = sp.search(q, 10)
        re_ = se.search(q, 10)
        assert rp["doc_id"].to_pylist() == re_["doc_id"].to_pylist(), q
        assert rp["score"].to_pylist() == re_["score"].to_pylist(), q


def test_multisearcher_unions_child_tombstones(del_setup):
    from elasticsearch_assets_ray.index.incremental import MultiSearcher

    _, idx, _, deleted = del_setup
    ms = MultiSearcher([idx])
    assert set(ms._tombstones.tolist()) == deleted
    s = Searcher(idx)
    for q in QUERIES[:3]:
        assert _score_map(ms, q) == _score_map(s, q), q


def test_expunge_matches_fresh_build(del_setup, tmp_path):
    corpus, idx, _, deleted = del_setup
    s = Searcher(idx)
    # natural keys of the deleted docs (docstore keeps them until expunge)
    t = s.hydrate(
        np.array(sorted(deleted), dtype=np.int64),
        columns=["doc_id", "repo", "path", "commit"],
    )
    del_keys = set(
        zip(t["repo"].to_pylist(), t["path"].to_pylist(), t["commit"].to_pylist())
    )
    assert len(del_keys) == len(deleted)

    # fresh build over the surviving rows only
    corpus2 = tmp_path / "corpus2"
    corpus2.mkdir()
    for f in sorted(glob.glob(os.path.join(corpus, "*.parquet"))):
        tab = pq.read_table(f)
        keys = list(
            zip(
                tab["repo"].to_pylist(),
                tab["path"].to_pylist(),
                tab["commit"].to_pylist(),
            )
        )
        keep = pa.array([k not in del_keys for k in keys])
        pq.write_table(
            tab.filter(keep), str(corpus2 / os.path.basename(f)), row_group_size=128
        )
    fresh_dir = str(tmp_path / "fresh_idx")
    build_index(
        str(corpus2),
        fresh_dir,
        target_partition_rows=128,
        runs_per_bucket=2,
        num_shards=2,
        index_positions=True,
    )

    exp_dir = str(tmp_path / "expunged_idx")
    man = expunge_deletes(idx, exp_dir)
    assert man["n_docs"] == s.n_docs - len(deleted)
    assert man["expunged_docs"] == len(deleted)

    sx = Searcher(exp_dir)
    sf = Searcher(fresh_dir)
    assert sx._tombstones.size == 0
    assert sx.n_docs == sf.n_docs
    assert sx.avgdl == pytest.approx(sf.avgdl, rel=0, abs=0)

    def keyed_scores(searcher: Searcher, q: str) -> dict[tuple, float]:
        t = searcher.all_scores(q)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = searcher.hydrate(ids, columns=["doc_id", "repo", "path", "commit"])
        pos = dict(
            zip(h["doc_id"].to_numpy(zero_copy_only=False).tolist(), range(h.num_rows))
        )
        out = {}
        for d, sc in zip(ids.tolist(), t["score"].to_pylist()):
            i = pos[d]
            out[
                (h["repo"][i].as_py(), h["path"][i].as_py(), h["commit"][i].as_py())
            ] = sc
        return out

    for q in QUERIES:
        # stats recomputed + same per-doc tf/dl ⇒ scores bit-identical to
        # a from-scratch build over the surviving corpus
        assert keyed_scores(sx, q) == keyed_scores(sf, q), q


def test_point_in_time_snapshot(ray_session, corpus_dir, tmp_path_factory):
    """ES _pit analog: a search carrying the PIT keeps the tombstone
    view from open_pit time while deletes continue; close_pit releases
    it; an unknown id raises (search_context_missing)."""
    import numpy as np
    import pytest as _pytest

    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.deletes import (
        close_pit,
        delete_by_query,
        open_pit,
    )
    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.query.sharded import ShardedSearcher

    out = str(tmp_path_factory.mktemp("pitidx"))
    build_index(corpus_dir, out, target_partition_rows=128, num_shards=2)
    before = Searcher(out).search("def load", k=20)
    pit = open_pit(out)
    n_del = delete_by_query(out, "def load")
    assert n_del > 0
    # live view excludes the deleted docs; PIT view is unchanged
    live = Searcher(out).search("def load", k=20)
    assert live.num_rows == 0 or set(live["doc_id"].to_pylist()).isdisjoint(
        set(before["doc_id"].to_pylist())
    )
    pinned = Searcher(out, pit=pit).search("def load", k=20)
    assert pinned.equals(before)
    # the sharded path honors the PIT too (bit-identical)
    sharded = ShardedSearcher(out, n_shards=2, use_actors=False, pit=pit)
    sp = sharded.search("def load", k=20)
    assert sp["doc_id"].to_pylist() == before["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        sp["score"].to_numpy(zero_copy_only=False),
        before["score"].to_numpy(zero_copy_only=False),
    )
    # idempotent reopen of the same state; distinct state → distinct id
    pit2 = open_pit(out)
    assert pit2 != pit
    assert open_pit(out) == pit2
    # close releases; a closed pit raises
    assert close_pit(out, pit)
    assert not close_pit(out, pit)
    with _pytest.raises(KeyError):
        Searcher(out, pit=pit)
