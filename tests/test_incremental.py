"""Incremental (persistent-mode) builds: window math, barrier, delta
ticks whose merged search equals a monolithic build over the union."""

from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.corpus import generate_corpus
from elasticsearch_assets_ray.index.build import IndexConfig, build_index
from elasticsearch_assets_ray.index.incremental import (
    IncrementalIndex,
    WindowState,
    delayed_stream_segment,
    next_window,
)
from elasticsearch_assets_ray.query.engine import Searcher


def test_window_math():
    now = datetime(2024, 1, 10, 12, 0, 0)
    lo, hi = delayed_stream_segment(now, delay_s=30, interval_s=60)
    assert (now - hi).total_seconds() == 30
    assert (hi - lo).total_seconds() == 60
    lo2, hi2 = next_window((lo, hi), 60)
    assert lo2 == hi and (hi2 - lo2).total_seconds() == 60


def test_window_state_barrier():
    ws = WindowState(3)
    assert not ws.checkin(0)
    assert not ws.checkin(1)
    assert not ws.checkin(0)  # re-checkin is idempotent
    assert ws.checkin(2)  # completes and resets
    assert not ws.checkin(0)
    with pytest.raises(ValueError):
        ws.checkin(7)


@pytest.fixture(scope="module")
def dated_corpus(tmp_path_factory):
    """Corpus with an ingested_at column spanning two windows."""
    t = generate_corpus(240, seed=9)
    n = t.num_rows
    base = datetime(2024, 3, 1)
    ts = [
        datetime(2024, 3, 1, hour) for hour in (np.arange(n) % 12)
    ]
    t = t.append_column("ingested_at", pa.array(ts, pa.timestamp("us")))
    d = tmp_path_factory.mktemp("dated")
    pq.write_table(t, str(d / "part-0.parquet"), row_group_size=64)
    return str(d)


def test_delta_ticks_equal_monolith(dated_corpus, tmp_path, ray_session):
    cfg = IndexConfig(target_partition_rows=64, runs_per_bucket=2, num_shards=4)
    inc = IncrementalIndex(str(tmp_path / "inc"), config=cfg)
    w1 = (datetime(2024, 3, 1, 0), datetime(2024, 3, 1, 6))
    w2 = (datetime(2024, 3, 1, 6), datetime(2024, 3, 1, 12))
    t1 = inc.tick(dated_corpus, w1, "ingested_at")
    t2 = inc.tick(dated_corpus, w2, "ingested_at")
    assert t1["n_docs"] + t2["n_docs"] == 240
    # replaying a completed tick is a no-op (recovery analog)
    t1b = inc.tick(dated_corpus, w1, "ingested_at")
    assert t1b["tick_id"] == t1["tick_id"]

    mono_dir = str(tmp_path / "mono")
    build_index(dated_corpus, mono_dir, config=cfg)
    mono = Searcher(mono_dir, prune=False)
    multi = inc.searcher(prune=False)
    assert multi.n_docs == mono.n_docs
    assert abs(multi.avgdl - mono.avgdl) < 1e-12

    for q in ["def load index", "import parse config", "return user token"]:
        a = multi.search(q, k=8)
        b = mono.search(q, k=8)
        # docIDs differ across layouts — compare by (repo,path) and score
        ka = multi.hydrate(a["doc_id"].to_numpy(zero_copy_only=False), ["doc_id", "repo", "path"])
        kb = mono.hydrate(b["doc_id"].to_numpy(zero_copy_only=False), ["doc_id", "repo", "path"])
        assert ka["path"].to_pylist() == kb["path"].to_pylist()
        assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(), rtol=0, atol=1e-12)


def test_compaction_rank_identical(ray_session, tmp_path):
    """compact() merges all deltas into one index; queries over the
    compacted index are bit-identical to the MultiSearcher over the
    deltas (same N, avgdl, per-term df), and replayed windows stay
    idempotent afterwards."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.index.build import IndexConfig
    from elasticsearch_assets_ray.index.incremental import IncrementalIndex
    from elasticsearch_assets_ray.query.engine import Searcher

    from datetime import datetime

    rng = np.random.default_rng(9)
    vocab = "alpha beta gamma delta index merge scan".split()
    n = 400
    src = str(tmp_path / "ev.parquet")
    ts = [datetime(2024, 1, 1 + int(d)) for d in rng.integers(0, 20, n)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts),
                "txt": pa.array([" ".join(rng.choice(vocab, 10)) for _ in range(n)]),
            }
        ),
        src,
    )
    cfg = IndexConfig(
        content_col="txt", id_cols=("event_id",), keep_cols=(),
        store_content=False, target_partition_rows=128, runs_per_bucket=4,
        num_shards=4,
    )
    inc = IncrementalIndex(str(tmp_path / "inc"), config=cfg)
    w1 = (datetime(2024, 1, 1), datetime(2024, 1, 11))
    w2 = (datetime(2024, 1, 11), datetime(2024, 1, 21))
    inc.tick(src, w1, "ts")
    inc.tick(src, w2, "ts")
    multi = inc.searcher(prune=False)
    before = multi.search("alpha merge scan", k=20)

    entry = inc.compact()
    s = Searcher(entry["dir"], prune=True)
    after = s.search("alpha merge scan", k=20)
    assert before["doc_id"].to_pylist() == after["doc_id"].to_pylist()
    assert before["score"].to_pylist() == after["score"].to_pylist()
    assert s.n_docs == n

    # replayed (absorbed) window is a no-op; a NEW window still builds
    replay = inc.tick(src, w1, "ts")
    assert replay.get("compacted") and replay["complete"]
    # searcher over post-compaction state still answers
    assert inc.searcher(prune=False).search("alpha", k=5).num_rows == 5


def test_multisearcher_phrases_and_prefixes(ray_session, tmp_path):
    """Phrase (positional) and prefix queries work across delta indexes
    and agree with a single compacted index."""
    from datetime import datetime

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.index.build import IndexConfig
    from elasticsearch_assets_ray.index.incremental import IncrementalIndex
    from elasticsearch_assets_ray.query.engine import Searcher

    rng = np.random.default_rng(31)
    vocab = "alpha beta gamma delta index merge scan alphabet".split()
    n = 300
    src = str(tmp_path / "ev.parquet")
    ts = [datetime(2024, 1, 1 + int(d)) for d in rng.integers(0, 20, n)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts),
                "txt": pa.array([" ".join(rng.choice(vocab, 8)) for _ in range(n)]),
            }
        ),
        src,
    )
    cfg = IndexConfig(
        content_col="txt", id_cols=("event_id",), keep_cols=(),
        store_content=True, index_positions=True,
        target_partition_rows=128, runs_per_bucket=4, num_shards=4,
    )
    inc = IncrementalIndex(str(tmp_path / "inc"), config=cfg)
    inc.tick(src, (datetime(2024, 1, 1), datetime(2024, 1, 11)), "ts")
    inc.tick(src, (datetime(2024, 1, 11), datetime(2024, 1, 21)), "ts")
    ms = inc.searcher(prune=False)
    assert ms.manifest["index_positions"]
    assert set(ms.expand_prefix("alpha")) == {"alpha", "alphabet"}
    r_phrase = ms.search('"alpha beta" merge', k=15)
    r_prefix = ms.search("alph* scan", k=15)
    entry = inc.compact()
    s = Searcher(entry["dir"], prune=False)
    c_phrase = s.search('"alpha beta" merge', k=15)
    c_prefix = s.search("alph* scan", k=15)
    assert r_phrase["doc_id"].to_pylist() == c_phrase["doc_id"].to_pylist()
    assert r_phrase["score"].to_pylist() == c_phrase["score"].to_pylist()
    assert r_prefix["doc_id"].to_pylist() == c_prefix["doc_id"].to_pylist()
    assert r_prefix["score"].to_pylist() == c_prefix["score"].to_pylist()
    assert r_phrase.num_rows > 0 and r_prefix.num_rows > 0


def test_multisearcher_round3_query_surface(dated_corpus, tmp_path, ray_session):
    """Boolean trees, range/exists filters, msm and facets all flow
    through MultiSearcher unchanged (inherited funnel + overridden
    pid-map/hydrate), matching a monolithic build over the union."""
    cfg = IndexConfig(target_partition_rows=64, runs_per_bucket=2, num_shards=4)
    inc = IncrementalIndex(str(tmp_path / "inc"), config=cfg)
    inc.tick(dated_corpus, (datetime(2024, 3, 1, 0), datetime(2024, 3, 1, 6)), "ingested_at")
    inc.tick(dated_corpus, (datetime(2024, 3, 1, 6), datetime(2024, 3, 1, 12)), "ingested_at")
    mono_dir = str(tmp_path / "mono")
    build_index(dated_corpus, mono_dir, config=cfg)
    mono = Searcher(mono_dir, prune=False)
    multi = inc.searcher(prune=False)

    queries = [
        "(def OR load) AND index",
        "def AND NOT (load OR index)",
        "(def OR load)^2 AND index AND _exists_:lang",
        "def load doc_len:[50 TO 400}",
    ]
    for q in queries:
        a, b = multi.search(q, k=8), mono.search(q, k=8)
        ka = multi.hydrate(a["doc_id"].to_numpy(zero_copy_only=False), ["doc_id", "path"])
        kb = mono.hydrate(b["doc_id"].to_numpy(zero_copy_only=False), ["doc_id", "path"])
        assert ka["path"].to_pylist() == kb["path"].to_pylist(), q
        assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(), rtol=0, atol=1e-12), q

    # msm filter identical across layouts
    a = multi.search("def load index value", k=8, minimum_should_match=3)
    b = mono.search("def load index value", k=8, minimum_should_match=3)
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(), rtol=0, atol=1e-12)

    # facet counts identical (value space is layout-independent)
    fa = multi.facet("(def OR load) AND index", by="lang")
    fb = mono.facet("(def OR load) AND index", by="lang")
    assert fa.to_pydict() == fb.to_pydict()
    ha = multi.histogram("def load", "doc_len", 100.0)
    hb = mono.histogram("def load", "doc_len", 100.0)
    assert ha.to_pydict() == hb.to_pydict()


def test_multisearcher_round4_agg_surface(dated_corpus, tmp_path, ray_session):
    """The round-4 aggregation/compound surface flows through
    MultiSearcher (delta layouts) unchanged: every op below only uses
    all_scores / match_ids / hydrate / term_dfs, all of which the
    delta-union overrides serve."""
    cfg = IndexConfig(target_partition_rows=64, runs_per_bucket=2, num_shards=4)
    inc = IncrementalIndex(str(tmp_path / "inc4"), config=cfg)
    inc.tick(dated_corpus, (datetime(2024, 3, 1, 0), datetime(2024, 3, 1, 6)), "ingested_at")
    inc.tick(dated_corpus, (datetime(2024, 3, 1, 6), datetime(2024, 3, 1, 12)), "ingested_at")
    mono_dir = str(tmp_path / "mono4")
    build_index(dated_corpus, mono_dir, config=cfg)
    mono = Searcher(mono_dir, prune=False)
    multi = inc.searcher(prune=False)
    q = "def load"
    assert multi.stats_agg(q, "doc_len") == mono.stats_agg(q, "doc_len")
    assert multi.percentiles(q, "doc_len").to_pydict() == mono.percentiles(q, "doc_len").to_pydict()
    assert (
        multi.facet_metric(q, "lang", "doc_len").to_pydict()
        == mono.facet_metric(q, "lang", "doc_len").to_pydict()
    )
    r = [(None, 150.0), (150.0, None)]
    assert multi.range_agg(q, "doc_len", r).to_pydict() == mono.range_agg(q, "doc_len", r).to_pydict()
    qs = {"a": "def", "b": "load index"}
    assert multi.filters_agg(qs).to_pydict() == mono.filters_agg(qs).to_pydict()
    assert multi.adjacency_matrix(qs).to_pydict() == mono.adjacency_matrix(qs).to_pydict()
    st_a = multi.significant_terms(q, size=5, min_doc_count=2)
    st_b = mono.significant_terms(q, size=5, min_doc_count=2)
    assert st_a.to_pydict() == st_b.to_pydict()
    # compound queries: internal docIDs are LAYOUT-dependent, so compare
    # hydrated keys + scores (the same convention the search tests use)
    def paths(s, ids):
        h = s.hydrate(np.asarray(ids, dtype=np.int64), ["doc_id", "path"])
        m = dict(zip(h["doc_id"].to_pylist(), h["path"].to_pylist()))
        return [m[i] for i in ids]

    ca = multi.boosting("def load", "index", negative_boost=0.5, k=6)
    cb = mono.boosting("def load", "index", negative_boost=0.5, k=6)
    assert paths(multi, ca["doc_id"].to_pylist()) == paths(mono, cb["doc_id"].to_pylist())
    assert np.allclose(ca["score"].to_numpy(), cb["score"].to_numpy(), rtol=0, atol=1e-12)
    # constant_score tie-breaks on the (layout-dependent) internal id —
    # with k >= matches the SETS must agree
    sa = multi.constant_score(q, boost=2.0, k=10**6)
    sb = mono.constant_score(q, boost=2.0, k=10**6)
    assert sorted(paths(multi, sa["doc_id"].to_pylist())) == sorted(
        paths(mono, sb["doc_id"].to_pylist())
    )
    # scroll pages cover the same doc set
    ma = [d for p in multi.scan(q, page_size=9) for d in p["doc_id"].to_pylist()]
    mb = [d for p in mono.scan(q, page_size=9) for d in p["doc_id"].to_pylist()]
    assert sorted(paths(multi, ma)) == sorted(paths(mono, mb))
    # term vectors identical for the SAME document across layouts
    d_mono = int(mono.search(q, k=1)["doc_id"][0].as_py())
    p0 = paths(mono, [d_mono])[0]
    d_multi = multi.lookup_docids([p0], col="path")[p0]
    assert multi.term_vectors(d_multi).to_pydict() == mono.term_vectors(d_mono).to_pydict()
