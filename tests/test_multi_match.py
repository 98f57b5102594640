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
