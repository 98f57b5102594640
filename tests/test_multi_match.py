"""ES multi_match: per-field indexes, type semantics, blended-df
cross_fields (query/multi_match.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.query import multi_match as mm


@pytest.fixture(scope="module")
def field_searchers(ray_session, tmp_path_factory):
    """Two single-field indexes over one tiny corpus: 'title' selective,
    'body' wordy."""
    from elasticsearch_assets_ray.index.build import IndexConfig, build_index
    from elasticsearch_assets_ray.query.engine import Searcher

    d = tmp_path_factory.mktemp("mmcorp")
    rows = {
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "title": pa.array(["alpha news", "beta news", "alpha beta", "gamma"], pa.string()),
        "body": pa.array(
            [
                "beta beta beta filler words here",
                "alpha filler words here too",
                "unrelated filler words",
                "alpha beta gamma filler",
            ],
            pa.string(),
        ),
    }
    pq.write_table(pa.table(rows), str(d / "part-0.parquet"))
    out = {}
    for f in ("title", "body"):
        o = str(tmp_path_factory.mktemp(f"mmidx_{f}"))
        build_index(
            str(d),
            o,
            config=IndexConfig(content_col=f, id_cols=("doc_id",), store_content=False),
        )
        out[f] = Searcher(o)
    return out


def _scores(t):
    return dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))


def test_best_most_fields_combine(field_searchers):
    best = _scores(mm.multi_match(field_searchers, "alpha", "best_fields", 0.5, k=10))
    most = _scores(mm.multi_match(field_searchers, "alpha", "most_fields", k=10))
    mx = _scores(mm.multi_match(field_searchers, "alpha", "best_fields", 0.0, k=10))
    # doc 2 matches only title, doc 1/3 only body; doc 0 title-only
    assert set(best) == {0, 1, 2, 3}
    for d in best:
        assert best[d] == pytest.approx(mx[d] + 0.5 * (most[d] - mx[d]))
        assert most[d] >= mx[d]


def test_most_fields_is_field_sum(field_searchers):
    t = _scores(mm.multi_match({"title": field_searchers["title"]}, "beta", "most_fields", k=10))
    b = _scores(mm.multi_match({"body": field_searchers["body"]}, "beta", "most_fields", k=10))
    both = _scores(mm.multi_match(field_searchers, "beta", "most_fields", k=10))
    for d, v in both.items():
        assert v == pytest.approx(t.get(d, 0.0) + b.get(d, 0.0))


def test_cross_fields_blends_df(field_searchers):
    # 'gamma': df(title)=1, df(body)=1 -> blended 1; 'alpha': title 2, body 2
    cross = _scores(mm.multi_match(field_searchers, "alpha gamma", "cross_fields", k=10))
    assert set(cross) == {0, 1, 2, 3}
    # doc 3 has both terms (gamma in both fields, alpha in body): top hit
    top = max(cross, key=lambda d: cross[d])
    assert top == 3
    # blended df must LOWER a term's idf on its rarer field: compute the
    # single-field score for 'alpha' on title with and without override
    s = field_searchers["title"]
    from elasticsearch_assets_ray.query.parser import parse_query

    n, _ = s.match_count("alpha")
    plain = s.search("alpha", k=n)
    blended = s.search_prepared(
        s._rewrite_prefixes(parse_query("alpha")), k=n, df_override={"alpha": 3}
    )
    assert max(blended["score"].to_pylist()) < max(plain["score"].to_pylist())


def test_unknown_type_raises(field_searchers):
    with pytest.raises(ValueError):
        mm.multi_match(field_searchers, "alpha", "phrase_fields")


def test_combined_fields_hand_computed(field_searchers):
    """combined_fields == hand-computed BM25 over the weighted synthetic
    field (tf/dl weighted sums, blended max df)."""
    from elasticsearch_assets_ray.query import bm25

    s = field_searchers
    out = _scores(
        mm.combined_fields(s, "alpha", weights={"title": 2.0}, k=10)
    )
    # corpus facts: title tfs alpha: d0=1, d2=1; body tfs alpha: d1=1, d3=1
    # dl_title = [2,2,2,1]; dl_body = [6,5,3,4]
    n = 4
    w = {"body": 1.0, "title": 2.0}
    dl_t = np.array([2, 2, 2, 1], dtype=np.float64)
    dl_b = np.array([6, 5, 3, 4], dtype=np.float64)
    dl_c = w["body"] * dl_b + w["title"] * dl_t
    avgdl_c = w["body"] * (dl_b.sum() / n) + w["title"] * (dl_t.sum() / n)
    tf_t = np.array([1, 0, 1, 0], dtype=np.float64)
    tf_b = np.array([0, 1, 0, 1], dtype=np.float64)
    tf_c = w["body"] * tf_b + w["title"] * tf_t
    df_blend = 2  # alpha: df_title=2, df_body=2
    want = bm25.math_idf(df_blend, n) * bm25.tf_saturation(tf_c, dl_c, avgdl_c)
    for d in range(4):
        assert out[d] == want[d]
    # ES contract: weights below 1 are rejected; unknown fields too
    with pytest.raises(ValueError):
        mm.combined_fields(s, "alpha", weights={"title": 0.5})
    with pytest.raises(KeyError):
        mm.combined_fields(s, "alpha", weights={"nope": 2.0})


def test_combined_fields_single_field_is_plain_bm25(field_searchers):
    """Over ONE field with weight 1 the synthetic field IS the field:
    scores equal the plain search scores."""
    s = {"body": field_searchers["body"]}
    a = _scores(mm.combined_fields(s, "alpha filler", k=10))
    r = field_searchers["body"].search("alpha filler", k=10)
    # combined_fields returns orig ids; this corpus has doc_id == internal
    b = dict(zip(r["doc_id"].to_pylist(), r["score"].to_pylist()))
    assert a == b


def test_combined_fields_sharded_parity(sf_dir):
    """combined_fields over per-field ShardedSearchers (duck-typed raw
    surface) == per-field single Searchers, bit-for-bit."""
    from elasticsearch_assets_ray.pipelines.registry import (
        documents_index,
        documents_source_index,
        sharded_searcher,
    )
    from elasticsearch_assets_ray.query.engine import Searcher

    single = {
        "text": Searcher(documents_index(sf_dir)),
        "source": Searcher(documents_source_index(sf_dir)),
    }
    shard = {
        "text": sharded_searcher(documents_index(sf_dir)),
        "source": sharded_searcher(documents_source_index(sf_dir)),
    }
    a = mm.combined_fields(single, "spark table src3", weights={"source": 2.0}, k=25)
    b = mm.combined_fields(shard, "spark table src3", weights={"source": 2.0}, k=25)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(zero_copy_only=False),
        b["score"].to_numpy(zero_copy_only=False),
    )
