"""ReaderAPI facade: slices in, batches out — fetch/count/response types
and slicer planning (the ElasticsearchReaderAPI surface)."""

import pyarrow as pa
import pytest

from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice


@pytest.fixture(scope="module")
def api(sf_dir):
    return ReaderAPI(
        f"{sf_dir}/events.parquet", date_col="ts", key_col="event_type"
    )


def test_count_and_fetch_date_slice(api, sf_dir):
    import duckdb

    slices = api.make_date_slicer_ranges(4)
    assert len(slices) == 4
    total = sum(api.count(s) for s in slices)
    want = duckdb.sql(f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    assert total == want  # slices disjoint-cover the whole date span
    t = api.fetch(slices[0], columns=["event_id", "ts"])
    assert isinstance(t, pa.Table)
    assert t.num_rows == api.count(slices[0])


def test_key_prefix_slice(api, sf_dir):
    import duckdb

    s = ReaderSlice(keys=["p", "s"])  # purchase, signup
    want = duckdb.sql(
        f"""SELECT count(*) FROM '{sf_dir}/events.parquet'
            WHERE event_type LIKE 'p%' OR event_type LIKE 's%'"""
    ).fetchone()[0]
    assert api.count(s) == want


def test_response_types(api):
    s = ReaderSlice(keys=["e"], limit=5)
    df = api.fetch(s, response_type="data_frame")
    ents = api.fetch(s, response_type="data_entities")
    raw = api.fetch(s, response_type="raw")
    assert isinstance(df, pa.Table) and df.num_rows == 5
    assert isinstance(ents, list) and len(ents) == 5 and isinstance(ents[0], dict)
    back = pa.ipc.open_stream(raw).read_all()  # dfjson/Buffer analog roundtrip
    assert back.equals(df)
    assert api.records_fetched >= 15  # F6 gauge


def test_id_slicer_ranges(api):
    slices = api.make_id_slicer_ranges("abcdefghijklmnopqrstuvwxyz", max_count=400)
    total = sum(s.count for s in slices)
    assert total == api.count(ReaderSlice())
    assert all(s.count <= 400 or len(s.keys[0]) >= 12 for s in slices)


def test_fulltext_slice(built_index):
    idx_dir, _ = built_index
    import os

    api = ReaderAPI(
        os.path.join(idx_dir, "docstore"),
        key_col="repo",
        index_dir=idx_dir,
    )
    s = ReaderSlice(query="def load index", limit=5)
    t = api.fetch(s, columns=["doc_id", "repo", "path"])
    assert t.num_rows == 5
    assert api.count(s) == 5


def test_fulltext_count_is_full_match_count(ray_session, corpus_dir, built_index, tmp_path):
    """F3: count of a fulltext slice = ALL matching docs, not the fetch
    top-k (which defaults to 10)."""
    import os

    from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice

    idx_dir, _ = built_index
    api = ReaderAPI(
        os.path.join(idx_dir, "docstore"), key_col="path", index_dir=idx_dir
    )
    n = api.count(ReaderSlice(query="def"))
    assert n > 10  # 'def' appears in most synthetic code files
    from elasticsearch_assets_ray.query.engine import Searcher

    assert n == Searcher(idx_dir).all_scores("def").num_rows


def test_metrics_gauges(built_index, corpus_dir):
    """T5: records-fetched / count-probe / engine serving gauges
    (reference ReaderAPIFetcher.ts:22-33)."""
    from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice

    idx, _ = built_index
    api = ReaderAPI(corpus_dir, key_col="repo", index_dir=idx)
    t = api.fetch(ReaderSlice(keys=["repo1"]))
    n1 = t.num_rows
    assert api.metrics()["records_fetched"] == n1
    api.count(ReaderSlice(query="def load"))
    m = api.metrics()
    assert m["count_probes"] == 1
    assert m["engine"]["count_score_free"] == 1
    s = api._searcher
    s.search("def load", k=5)
    m = api.metrics()["engine"]
    assert m["queries_served"] == 1
    assert m["records_served"] == 5


def test_adaptive_date_ranges_skewed(tmp_path):
    """P4: count-guided recursion — slices shrink where data is dense,
    grow where sparse; every slice is within budget; disjoint cover."""
    import datetime as dt

    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(7)
    # 5000 rows in one dense hour, 200 rows across a sparse month, a hole
    dense = [base + dt.timedelta(seconds=int(x)) for x in rng.integers(0, 3600, 5000)]
    sparse = [
        base + dt.timedelta(days=10) + dt.timedelta(seconds=int(x))
        for x in rng.integers(0, 20 * 86400, 200)
    ]
    ts = sorted(dense + sparse)
    path = str(tmp_path / "skew.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(ts, pa.timestamp("us")), "v": range(len(ts))}),
        path,
    )
    api = ReaderAPI(path, date_col="ts")
    size = 400
    slices = api.make_adaptive_date_ranges(size)
    # budget: every slice within size (none hits the 1ms floor here)
    assert all(s.count <= size for s in slices)
    assert all(s.count > 0 for s in slices)
    # disjoint cover: counts sum to the full table
    assert sum(s.count for s in slices) == len(ts)
    for a, b in zip(slices, slices[1:]):
        assert a.end <= b.start
    # recounting each emitted slice agrees with its recorded count
    assert all(api.count(s) == s.count for s in slices[:5])
    # adaptivity: dense-hour slices are much narrower than sparse ones
    spans = [(s.end - s.start).total_seconds() for s in slices]
    dense_spans = [
        sp for s, sp in zip(slices, spans) if s.start < base + dt.timedelta(hours=2)
    ]
    sparse_spans = [
        sp for s, sp in zip(slices, spans) if s.start > base + dt.timedelta(days=5)
    ]
    assert dense_spans and sparse_spans
    assert max(dense_spans) < min(sparse_spans)
    # plain halving mode also satisfies the contract
    halved = api.make_adaptive_date_ranges(size, recurse_optimization=False)
    assert sum(s.count for s in halved) == len(ts)
    assert all(s.count <= size for s in halved)
    # oracle: total rows
    want = duckdb.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
    assert sum(s.count for s in slices) == want


def test_date_slicer_metadata_hook(api):
    """DateSlicerMetadataHook analog (reference interfaces.ts:259-275,
    fired from ElasticsearchReaderAPI.ts:557-561): the hook observes the
    discovered per-slicer interval and ISO date range after planning."""
    seen = {}
    slices = api.make_date_slicer_ranges(3, hook=seen.update)
    assert sorted(seen) == [0, 1, 2]
    for i, s in enumerate(slices):
        md = seen[i]
        assert md["start"] == s.start.isoformat()
        assert md["end"] == s.end.isoformat()
        step, unit = md["interval"]
        assert unit == "s" and step > 0


def test_interval_and_adaptive_hooks(api):
    seen = {}
    slices = api.make_date_interval_ranges("2d", hook=seen.update)
    assert len(seen) == len(slices)
    assert all(md["interval"] == (2, "d") for md in seen.values())

    seen2 = {}
    slices2 = api.make_adaptive_date_ranges(500, hook=seen2.update)
    assert len(seen2) == len(slices2)
    # adaptive metadata also exposes the probe count per emitted slice
    assert all(md["count"] == s.count for md, s in zip(seen2.values(), slices2))


def test_reader_api_factory_lifecycle(sf_dir):
    """Named-instance APIFactory lifecycle (reference
    asset/src/elasticsearch_reader_api/api.ts:15-58 over Teraslice's
    APIFactory create/get/remove/entries/keys/values/size)."""
    from elasticsearch_assets_ray import ReaderAPIFactory

    fac = ReaderAPIFactory(table_path=f"{sf_dir}/events.parquet", date_col="ts")
    assert fac.size == 0
    api = fac.create("test")
    assert fac.size == 1
    assert fac.get("test") is api
    assert api.count(ReaderSlice()) > 0
    # per-name override wins over the base config
    api2 = fac.create("docs", table_path=f"{sf_dir}/documents.parquet")
    assert api2.table_path.endswith("documents.parquet")
    assert fac.keys() == ["test", "docs"]
    assert fac.values() == [api, api2]
    assert fac.entries() == [("test", api), ("docs", api2)]
    # duplicate names are an error, like the reference factory
    with pytest.raises(ValueError):
        fac.create("test")
    fac.remove("test")
    assert fac.size == 1 and fac.get("test") is None
    # validation: table_path is mandatory (the reference's index check)
    with pytest.raises(ValueError):
        ReaderAPIFactory().create("nope")
