"""Regression tests for the round-2 code-review findings."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_docstore_cache_hit_rows_survive_eviction(tmp_path):
    """A batch referencing old HIT keys plus many new keys must enrich
    the hit rows correctly even when eviction triggers (the pre-join
    eviction dropped them and emitted nulls)."""
    from elasticsearch_assets_ray.state.storage import DocstoreCache

    p = str(tmp_path / "store.parquet")
    pq.write_table(
        pa.table({"k": pa.array(range(100), pa.int64()), "v": pa.array(range(100))}),
        p,
    )
    cache = DocstoreCache(p, "k", ["v"], cache_size=10)
    cache(pa.table({"k": pa.array(range(0, 10), pa.int64())}))  # resident: 0-9
    # hits 0-4 + 15 fresh keys → eviction must not null the hit rows
    out = cache(pa.table({"k": pa.array(list(range(0, 5)) + list(range(50, 65)), pa.int64())}))
    got = dict(zip(out["k"].to_pylist(), out["v"].to_pylist()))
    assert got == {**{i: i for i in range(5)}, **{i: i for i in range(50, 65)}}
    assert cache._tbl.num_rows <= 10  # bound still enforced between calls


def test_must_prefix_is_conjunctive(oracle_idx):
    """'+def* hadoopzz' requires ≥1 def-term; docs with only the other
    term are excluded (was silently demoted to SHOULD)."""
    s, oracle = oracle_idx
    from elasticsearch_assets_ray.query.parser import parse_query

    q = parse_query("+def* load")
    assert q.must_prefixes == ["def"]
    r = s.search("+def* load", 20)
    # every hit must contain a def* term: compare against the pure-should
    # variant — the conjunctive set is a subset
    bag = s.search("def* load", 10_000)
    defs = set(s.all_scores("def*")["doc_id"].to_pylist())
    assert set(r["doc_id"].to_pylist()) <= defs
    assert set(bag["doc_id"].to_pylist()) - defs  # bag version has extras
    # rank identity with the oracle for the conjunctive form
    oi, osc = oracle.topk("+def* load", 20)
    assert np.array_equal(r["doc_id"].to_numpy(), oi)
    assert np.array_equal(r["score"].to_numpy(), osc)

    # a must-prefix matching nothing → empty result
    assert s.search("+zzqq* load", 10).num_rows == 0


@pytest.fixture(scope="module")
def oracle_idx(built_index):
    import os

    import pyarrow.dataset as pads

    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.query.oracle import OracleIndex

    idx_dir, _ = built_index
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(
        columns=["doc_id", "content"]
    )
    return Searcher(idx_dir), OracleIndex(doc, content_col="content", id_col="doc_id")


def test_term_cache_clear_does_not_crash(built_index):
    """Crossing the cache bound mid-stream must not KeyError the query
    that triggers it."""
    from elasticsearch_assets_ray.query.engine import Searcher

    s = Searcher(built_index[0])
    s.search("def load", 5)
    # bloat the cache past the bound; the next query must clear-then-
    # refill, not KeyError on its own terms
    s._term_rows_cache.update({f"__pad{i}": None for i in range(200_001)})
    r = s.search("def load index", 5)
    assert r.num_rows == 5
    assert len(s._term_rows_cache) < 200_001


def test_positions_build_with_all_empty_content(ray_session, tmp_path):
    """A partition whose content yields zero kept tokens must not crash
    a positional build."""
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.query.engine import Searcher

    src = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * 4,
                "path": [f"p{i}" for i in range(4)],
                "commit": ["c"] * 4,
                "lang": ["t"] * 4,
                "content": ["", "!!! ...", "  ", "###"],
            }
        ),
        src,
    )
    out = str(tmp_path / "idx")
    m = build_index(src, out, index_positions=True, num_shards=2, runs_per_bucket=2)
    assert m["n_docs"] == 4 and m["total_tokens"] == 0
    assert Searcher(out).search("anything", 5).num_rows == 0


def test_scratch_budget_evicts(built_index):
    from elasticsearch_assets_ray.query.engine import Searcher

    s = Searcher(built_index[0])
    s.scratch_budget = 1  # force eviction after every bucket
    s.search("def load index", 10)
    assert len(s._scratch) <= 1
    # correctness unaffected
    r1 = s.search("def load index", 5)
    s2 = Searcher(built_index[0])
    r2 = s2.search("def load index", 5)
    assert r1["doc_id"].to_pylist() == r2["doc_id"].to_pylist()
    assert r1["score"].to_pylist() == r2["score"].to_pylist()


def test_multisearcher_rejects_mixed_codecs(ray_session, tmp_path, corpus_dir):
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.incremental import MultiSearcher

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(corpus_dir, a, target_partition_rows=512, codec="varint")
    build_index(corpus_dir, b, target_partition_rows=512, codec="pfor")
    with pytest.raises(ValueError, match="mixed codecs"):
        MultiSearcher([a, b])


def test_cold_mode_empty_index(ray_session, tmp_path):
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.query.engine import Searcher

    src = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["t"],
                "content": ["!!!"],
            }
        ),
        src,
    )
    out = str(tmp_path / "idx")
    build_index(src, out, num_shards=2, runs_per_bucket=2)
    cold = Searcher(out, shard_resident=False)
    assert cold.search("anything", 5).num_rows == 0
    assert cold.expand_prefix("a") == []


def test_compact_rejects_mixed_positions(ray_session, tmp_path):
    import json as _json
    import os as _os

    from datetime import datetime

    from elasticsearch_assets_ray.index.build import IndexConfig
    from elasticsearch_assets_ray.index.incremental import IncrementalIndex

    src = str(tmp_path / "ev.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(20), pa.int64()),
                "ts": pa.array([datetime(2024, 1, 1 + i % 10) for i in range(20)]),
                "txt": pa.array(["alpha beta"] * 20),
            }
        ),
        src,
    )
    cfg = IndexConfig(content_col="txt", id_cols=("event_id",), keep_cols=(),
                      store_content=False, num_shards=2, runs_per_bucket=2)
    inc = IncrementalIndex(str(tmp_path / "inc"), config=cfg)
    t1 = inc.tick(src, (datetime(2024, 1, 1), datetime(2024, 1, 6)), "ts")
    t2 = inc.tick(src, (datetime(2024, 1, 6), datetime(2024, 1, 11)), "ts")
    # simulate a config change between ticks
    mp = _os.path.join(t2["dir"], "manifest.json")
    with open(mp) as f:
        m = _json.load(f)
    m["index_positions"] = True
    with open(mp, "w") as f:
        _json.dump(m, f)
    with pytest.raises(ValueError, match="mixed index_positions"):
        inc.compact()
    # early validation leaves no partial compacted dir behind
    assert not [d for d in _os.listdir(str(tmp_path / "inc")) if d.startswith("compacted")]


def test_ingest_source_id_collision(ray_session, tmp_path):
    import json as _json

    from elasticsearch_assets_ray.sources.ingest import jsonl_to_parquet

    src = tmp_path / "hits.jsonl"
    with open(src, "w") as f:
        for i in range(5):
            f.write(
                _json.dumps({"_id": f"env-{i}", "_source": {"_id": "inner", "v": i}})
                + "\n"
            )
    out = jsonl_to_parquet(str(src), str(tmp_path / "pq"), unwrap_source=True)
    import pyarrow.dataset as pads

    t = pads.dataset(out).to_table().sort_by("v")
    assert t["_id"].to_pylist() == [f"env-{i}" for i in range(5)]
    assert t["_source_id"].to_pylist() == ["inner"] * 5
