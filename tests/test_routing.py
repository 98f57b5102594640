"""Routing co-location + index-resident parent/child (ES join field).

Reference contract: ES routes children to the parent's shard via the
bulk action's ``routing`` (ElasticsearchBulkSender createRoute) and
serves has_child / has_parent shard-locally.  Here: build_routed_index
(index/routing.py) + Searcher.has_child / has_parent (engine) +
ShardedSearcher route-aligned shards (sharded).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.index.routing import (
    build_routed_index,
    route_of,
)
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher

N_PARENTS = 200
WORDS = ["alpha", "beta", "gamma", "delta"]


@pytest.fixture(scope="module")
def routed_idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("routed")
    rng = np.random.default_rng(7)
    pkeys = np.arange(N_PARENTS, dtype=np.int64)
    parents = pa.table(
        {
            "join_name": pa.array(["order"] * N_PARENTS),
            "routing": pa.array(pkeys),
            "content": pa.array([WORDS[i % 4] + " parent" for i in range(N_PARENTS)]),
            "val": pa.array((pkeys * 7 + 3).astype(np.int64)),
        }
    )
    n_children = rng.integers(0, 8, N_PARENTS)
    crout = np.repeat(pkeys, n_children)
    cw = rng.integers(0, 4, crout.size)
    children = pa.table(
        {
            "join_name": pa.array(["line"] * crout.size),
            "routing": pa.array(crout),
            "content": pa.array([WORDS[w] + " child" for w in cw]),
            "val": pa.array(rng.integers(1, 1000, crout.size).astype(np.int64)),
        }
    )
    corpus = pa.concat_tables([parents, children])
    cdir = root / "corpus"
    os.makedirs(cdir)
    pq.write_table(corpus, str(cdir / "corpus.parquet"), row_group_size=128)
    idx = str(root / "idx")
    m = build_routed_index(
        str(cdir),
        idx,
        routing_col="routing",
        n_routes=4,
        join_field={"col": "join_name", "relations": {"order": ["line"]}},
        id_cols=(),
        keep_cols=("join_name", "routing", "val"),
        target_partition_rows=256,
        store_content=False,
    )
    return idx, m, parents, children


def test_manifest_and_route_alignment(routed_idx):
    idx, m, parents, children = routed_idx
    assert m["complete"] and m["n_docs"] == len(parents) + len(children)
    rr = m["routing"]["route_bucket_ranges"]
    assert len(rr) == 4
    # contiguous, ordered bucket ranges covering [0, max)
    assert rr[0][0] == 0
    for a, b in zip(rr, rr[1:]):
        assert a[1] == b[0]
    # every doc's route matches the hash the reader will compute
    s = Searcher(idx)
    t = s.hydrate(s.live_ids(), columns=["doc_id", "routing"])
    routes = route_of(t["routing"], 4)
    pids = t["doc_id"].to_numpy(zero_copy_only=False) >> m["doc_shift"]
    buckets = pids // m["runs_per_bucket"]
    for r in range(4):
        lo, hi = rr[r]
        got = np.unique(buckets[routes == r])
        assert all(lo <= b < hi for b in got)


def test_has_child_matches_two_dataset_operator(routed_idx, ray_session):
    """Index-resident has_child == stages/parentchild.has_child (the
    two-Dataset hash-join operator) on the same corpus."""
    import ray.data

    from elasticsearch_assets_ray.stages.parentchild import has_child as hc_ds

    idx, m, parents, children = routed_idx
    s = Searcher(idx)
    got = s.has_child(
        "alpha", score_mode="sum", min_children=2, k=None, score_field="val"
    )

    pds = ray.data.from_arrow(parents)
    cds = ray.data.from_arrow(children)

    def child_fn(b: pa.Table) -> pa.Table:
        t = b.filter(pc.match_substring(b["content"], "alpha"))
        return pa.table(
            {
                "routing": t["routing"],
                "score_cents": pc.multiply(t["val"], pa.scalar(100, pa.int64())),
            }
        )

    want = hc_ds(
        pds,
        cds,
        parent_key="routing",
        child_key="routing",
        child_fn=child_fn,
        score_mode="sum",
        min_children=2,
        num_partitions=4,
    )
    wt = pa.concat_tables(list(want.iter_batches(batch_format="pyarrow")))
    wt = wt.take(pc.sort_indices(wt["routing"]))
    gt = got.take(pc.sort_indices(got["routing"]))
    assert gt["routing"].to_pylist() == wt["routing"].to_pylist()
    assert gt["n_children"].to_pylist() == wt["n_children"].to_pylist()
    assert gt["score"].to_pylist() == wt["score"].to_pylist()


def test_sharded_parity_and_locality(routed_idx):
    """ShardedSearcher has_child / has_parent == single Searcher, with
    shards carved on route boundaries (the co-location invariant)."""
    idx, m, parents, children = routed_idx
    s = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=4)
    assert sh.routed
    assert [list(r) for r in sh.ranges] == [
        list(r) for r in m["routing"]["route_bucket_ranges"]
    ]
    for mode in ("none", "sum", "max", "avg"):
        a = s.has_child("beta", score_mode=mode, min_children=1, k=25, score_field="val")
        b = sh.has_child("beta", score_mode=mode, min_children=1, k=25, score_field="val")
        assert a.to_pydict() == b.to_pydict(), mode
    # BM25-scored child relevance parity (dfs_query_then_fetch df injection)
    a = s.has_child("gamma", score_mode="max", min_children=1, k=30)
    b = sh.has_child("gamma", score_mode="max", min_children=1, k=30)
    assert a.to_pydict() == b.to_pydict()
    ap = s.has_parent("alpha", score=True, score_field="val", k=None)
    bp = sh.has_parent("alpha", score=True, score_field="val", k=None)
    assert ap.to_pydict() == bp.to_pydict()
    # n_shards smaller than n_routes still groups whole routes
    sh2 = ShardedSearcher(idx, n_shards=2)
    b2 = sh2.has_child("beta", score_mode="sum", min_children=1, k=25, score_field="val")
    a2 = s.has_child("beta", score_mode="sum", min_children=1, k=25, score_field="val")
    assert a2.to_pydict() == b2.to_pydict()


def test_has_parent_scores_and_filters(routed_idx):
    idx, m, parents, children = routed_idx
    s = Searcher(idx)
    t = s.has_parent("alpha", score=True, score_field="val", k=None)
    # every returned child's parent is an alpha parent (keys 0,4,8,…);
    # score == the parent's stored val (7k+3)
    alpha_keys = {i for i in range(N_PARENTS) if i % 4 == 0}
    routs = t["routing"].to_pylist()
    assert set(routs) <= alpha_keys
    for r, sc in zip(routs, t["score"].to_pylist()):
        assert sc == float(r * 7 + 3)
    # child count parity with the raw corpus
    want = sum(1 for r in children["routing"].to_pylist() if r in alpha_keys)
    assert t.num_rows == want
    # score=False → 0.0 scores, same rows
    t0 = s.has_parent("alpha", score=False, k=None)
    assert t0.num_rows == want
    assert set(t0["score"].to_pylist()) == {0.0}


def test_unrouted_index_refuses_sharded_join(tmp_path, ray_session):
    from elasticsearch_assets_ray import build_index
    from elasticsearch_assets_ray.corpus import write_corpus

    cdir = str(tmp_path / "c")
    write_corpus(cdir, 300, files=2)
    idx = str(tmp_path / "i")
    build_index(cdir, idx, target_partition_rows=128)
    sh = ShardedSearcher(idx, n_shards=2)
    assert not sh.routed
    with pytest.raises(ValueError, match="ROUTED index"):
        sh.has_child("def")
    with pytest.raises(ValueError, match="join_field"):
        Searcher(idx).has_child("def")
