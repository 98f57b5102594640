"""ES span queries: pure span-set algebra and end-to-end soundness +
completeness against a brute-force positional check over the corpus."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.query import spans as sp
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def span_index(ray_session, corpus_dir, tmp_path_factory):
    from elasticsearch_assets_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("spanidx"))
    build_index(
        corpus_dir,
        out,
        target_partition_rows=128,
        runs_per_bucket=2,
        num_shards=4,
        index_positions=True,
        store_content=True,
    )
    return out


def _keys(doc_pos: dict[int, list[int]]) -> np.ndarray:
    out = []
    for d, ps in doc_pos.items():
        out.extend((d << 32) | p for p in ps)
    return np.array(sorted(out), dtype=np.int64)


def test_eval_span_term_and_first():
    keys = {"a": _keys({0: [1, 7], 2: [0]})}
    sk, ep = sp.eval_spans({"span_term": "a"}, keys)
    assert list(ep - (sk & 0xFFFFFFFF)) == [1, 1, 1]
    sk, ep = sp.eval_spans(
        {"span_first": {"match": {"span_term": "a"}, "end": 2}}, keys
    )
    # spans ending at <= 2: positions 1 (doc 0) and 0 (doc 2)
    assert [(int(k >> 32), int(k & 0xFFFFFFFF)) for k in sk] == [(0, 1), (2, 0)]


def test_eval_span_near_gap_rule():
    keys = {"a": _keys({0: [0], 1: [0]}), "b": _keys({0: [3], 1: [1]})}
    near = lambda slop: {
        "span_near": {
            "clauses": [{"span_term": "a"}, {"span_term": "b"}],
            "slop": slop,
            "in_order": True,
        }
    }
    sk, _ = sp.eval_spans(near(0), keys)
    assert [int(k >> 32) for k in sk] == [1]  # adjacent only
    sk, _ = sp.eval_spans(near(2), keys)
    assert [int(k >> 32) for k in sk] == [0, 1]  # gap 2 allowed


def test_eval_span_near_greedy_takes_smallest_next():
    # doc 0: a at 0, b at 1 and 5 — greedy must chain to b@1, not b@5
    keys = {"a": _keys({0: [0]}), "b": _keys({0: [1, 5]})}
    sk, ep = sp.eval_spans(
        {
            "span_near": {
                "clauses": [{"span_term": "a"}, {"span_term": "b"}],
                "slop": 0,
                "in_order": True,
            }
        },
        keys,
    )
    assert list(ep) == [2]


def test_eval_span_not_window():
    keys = {"v": _keys({0: [5], 1: [5]}), "x": _keys({0: [6], 1: [8]})}
    spec = lambda pre, post: {
        "span_not": {
            "include": {"span_term": "v"},
            "exclude": {"span_term": "x"},
            "pre": pre,
            "post": post,
        }
    }
    # post=0: exclude at 6 does not overlap [5,6) -> both survive
    sk, _ = sp.eval_spans(spec(0, 0), keys)
    assert sorted(int(k >> 32) for k in sk) == [0, 1]
    # post=1 widens doc 0's window to [5,7): killed; doc 1 (x at 8) lives
    sk, _ = sp.eval_spans(spec(0, 1), keys)
    assert sorted(int(k >> 32) for k in sk) == [1]


def test_eval_span_not_never_crosses_docs():
    # doc 0 has a late exclude; doc 1's include must be unaffected
    keys = {"v": _keys({1: [0]}), "x": _keys({0: [100]})}
    sk, _ = sp.eval_spans(
        {
            "span_not": {
                "include": {"span_term": "v"},
                "exclude": {"span_term": "x"},
                "pre": 200,
                "post": 200,
            }
        },
        keys,
    )
    assert [int(k >> 32) for k in sk] == [1]


def test_eval_span_within_and_containing():
    # doc 0: big [1,4) (a@1, b@3); littles v@2 (inside), v@5 (outside)
    # doc 1: v@0 but no big span — must not match (cross-doc safety)
    # doc 2: big [0,2) only, no little
    keys = {
        "a": _keys({0: [1], 2: [0]}),
        "b": _keys({0: [3], 2: [1]}),
        "v": _keys({0: [2, 5], 1: [0]}),
    }
    big = {
        "span_near": {
            "clauses": [{"span_term": "a"}, {"span_term": "b"}],
            "slop": 2,
            "in_order": True,
        }
    }
    sk, ep = sp.eval_spans(
        {"span_within": {"little": {"span_term": "v"}, "big": big}}, keys
    )
    assert [(int(k >> 32), int(k & 0xFFFFFFFF)) for k in sk] == [(0, 2)]
    assert list(ep) == [(0 << 32) + 3][:1] and int(ep[0]) == 3
    sk, ep = sp.eval_spans(
        {"span_containing": {"big": big, "little": {"span_term": "v"}}}, keys
    )
    # only doc 0's big span contains a little; doc 2's does not
    assert [(int(k >> 32), int(k & 0xFFFFFFFF)) for k in sk] == [(0, 1)]
    assert int(ep[0]) == 4
    # boundary: little must fit INSIDE [start, end) — v@5 not in [1,4)
    keys2 = {**keys, "v": _keys({0: [4]})}
    sk, _ = sp.eval_spans(
        {"span_within": {"little": {"span_term": "v"}, "big": big}}, keys2
    )
    assert sk.size == 0  # [4,5) not within [1,4)


def _brute(spec: dict, toks: list[str]) -> bool:
    if "span_term" in spec:
        return spec["span_term"] in toks
    if "span_first" in spec:
        t = spec["span_first"]["match"]["span_term"]
        e = spec["span_first"]["end"]
        return any(p + 1 <= e for p, x in enumerate(toks) if x == t)
    if "span_not" in spec:
        s = spec["span_not"]
        ti, tx = s["include"]["span_term"], s["exclude"]["span_term"]
        pre, post = s.get("pre", 0), s.get("post", 0)
        xs = [q for q, x in enumerate(toks) if x == tx]
        return any(
            not any(q < p + 1 + post and q + 1 > p - pre for q in xs)
            for p, x in enumerate(toks)
            if x == ti
        )
    if "span_near" in spec:
        s = spec["span_near"]
        a, b = (c["span_term"] for c in s["clauses"])
        slop = s.get("slop", 0)
        ps = [p for p, x in enumerate(toks) if x == a]
        qs = [q for q, x in enumerate(toks) if x == b]
        return any(q > p and (q - p - 1) <= slop for p in ps for q in qs)
    if "span_within" in spec or "span_containing" in spec:
        # big = 2-term ordered near; containment tests against the
        # MINIMAL big span per start (the evaluator's convention)
        s = spec.get("span_within") or spec.get("span_containing")
        tl = s["little"]["span_term"]
        nb = s["big"]["span_near"]
        a, b = (c["span_term"] for c in nb["clauses"])
        slop = nb.get("slop", 0)
        vs = [v for v, x in enumerate(toks) if x == tl]
        for p, x in enumerate(toks):
            if x != a:
                continue
            qs = [q for q, y in enumerate(toks) if y == b and q > p]
            if not qs:
                continue
            q = min(qs)
            if q - p - 1 <= slop and any(p <= v <= q for v in vs):
                return True
        return False
    raise AssertionError


@pytest.mark.parametrize(
    "spec",
    [
        {"span_first": {"match": {"span_term": "go"}, "end": 7}},
        {
            "span_not": {
                "include": {"span_term": "index"},
                "exclude": {"span_term": "def"},
                "pre": 2,
                "post": 2,
            }
        },
        {
            "span_near": {
                "clauses": [{"span_term": "rank"}, {"span_term": "batch"}],
                "slop": 1,
                "in_order": True,
            }
        },
        {
            "span_within": {
                "little": {"span_term": "token"},
                "big": {
                    "span_near": {
                        "clauses": [{"span_term": "def"}, {"span_term": "index"}],
                        "slop": 4,
                        "in_order": True,
                    }
                },
            }
        },
        {
            "span_containing": {
                "big": {
                    "span_near": {
                        "clauses": [{"span_term": "def"}, {"span_term": "index"}],
                        "slop": 4,
                        "in_order": True,
                    }
                },
                "little": {"span_term": "read"},
            }
        },
    ],
)
def test_span_search_matches_brute_force(span_index, spec):
    from elasticsearch_assets_ray.query.engine import Searcher

    s = Searcher(span_index)
    res = sp.span_search(s, spec, k=10_000)
    ids = res["doc_id"].to_numpy(zero_copy_only=False)
    # soundness: every returned doc satisfies the span predicate
    h = s.hydrate(np.sort(ids), columns=["doc_id", "content"])
    texts = dict(zip(h["doc_id"].to_pylist(), h["content"].to_pylist()))
    for d in ids:
        assert _brute(spec, tokenize_text(texts[int(d)])), (spec, d)
    # completeness: count equals brute force over ALL conjunctive candidates
    qstr = " ".join(f"+{t}" for t in sp.positive_terms(spec))
    n, _ = s.match_count(qstr)
    cand = s.search(qstr, k=n)["doc_id"].to_numpy(zero_copy_only=False)
    hc = s.hydrate(np.sort(cand), columns=["doc_id", "content"])
    expect = sum(
        1
        for t in hc["content"].to_pylist()
        if _brute(spec, tokenize_text(t))
    )
    assert ids.size == expect
    assert expect > 0, "gate spec should actually match something"


def test_intervals_query_parity_and_semantics(span_index):
    """ES intervals query (query/intervals.py): sharded == single
    bit-for-bit; an ordered match with max_gaps g is exactly the
    sloppy-phrase filter with slop g (same chain bound); any_of unions
    branch matches; all_of bounds the inter-interval gap."""
    import pytest as _pytest

    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.query.intervals import intervals_search
    from elasticsearch_assets_ray.query.sharded import ShardedSearcher

    single = Searcher(span_index)
    sharded = ShardedSearcher(span_index, n_shards=3, use_actors=False)

    def eq(a, b):
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        np.testing.assert_array_equal(
            a["score"].to_numpy(zero_copy_only=False),
            b["score"].to_numpy(zero_copy_only=False),
        )

    spec = {"match": {"query": "def load", "max_gaps": 1, "ordered": True}}
    r1 = intervals_search(single, spec, k=12)
    r2 = sharded.intervals(spec, k=12)
    eq(r1, r2)
    assert r1.num_rows > 0
    # identical contract to the sloppy phrase query (filter + the same
    # bag-of-words scoring) — tables must match exactly
    sl = single.search('"def load"~1', k=12)
    eq(r1, sl)
    # any_of: union of the two adjacency branches
    spec_or = {
        "any_of": {
            "intervals": [
                {"match": {"query": "def load", "max_gaps": 0, "ordered": True}},
                {"match": {"query": "load def", "max_gaps": 0, "ordered": True}},
            ]
        }
    }
    o1 = intervals_search(single, spec_or, k=500)
    o2 = sharded.intervals(spec_or, k=500)
    eq(o1, o2)
    a = set(single.match_ids('"def load"').tolist())
    b = set(single.match_ids('"load def"').tolist())
    assert a and set(o1["doc_id"].to_pylist()) == (a | b)
    # all_of with a gap budget: hits ⊆ adjacent-"def load" docs that
    # also contain index, with index within the window
    spec_all = {
        "all_of": {
            "intervals": [
                {"match": {"query": "def load", "max_gaps": 0, "ordered": True}},
                {"match": {"query": "index"}},
            ],
            "max_gaps": 2,
            "ordered": True,
        }
    }
    g1 = intervals_search(single, spec_all, k=500)
    g2 = sharded.intervals(spec_all, k=500)
    eq(g1, g2)
    both = set(single.match_ids('+index "def load"').tolist())
    assert both, "fixture corpus must contain def-load + index docs"
    assert set(g1["doc_id"].to_pylist()) <= both
    # brute-force positional re-check of every hit and every miss over
    # the candidate superset (the gap budget decides membership)
    hits = set(g1["doc_id"].to_pylist())
    for d in sorted(both):
        toks = tokenize_text(
            single.hydrate(np.array([d]), columns=["doc_id", "content"])[
                "content"
            ][0].as_py()
        )
        ok = False
        for i in range(len(toks) - 1):
            if toks[i] == "def" and toks[i + 1] == "load":
                for j in range(i + 2, min(i + 6, len(toks))):
                    if toks[j] == "index":
                        ok = True
        assert ok == (d in hits), d
    # unordered trees are rejected with guidance
    with _pytest.raises(ValueError):
        intervals_search(
            single, {"match": {"query": "def load", "ordered": False}}, k=5
        )
