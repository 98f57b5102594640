"""Property-based invariants (hypothesis): tokenizer parity, codec
roundtrips, first-mask correctness, top-k determinism — the randomized
tier the reference's fixed-fixture suite lacks."""

from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

TEXTS = st.lists(
    st.text(
        alphabet="abc XY_12.\n", min_size=0, max_size=60
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=40, deadline=None)
@given(TEXTS)
def test_tokenizer_vectorized_matches_python(texts):
    from elasticsearch_assets_ray.stages.tokenizer import (
        doc_term_freqs,
        tokenize_text,
    )

    tb = doc_term_freqs(pa.array(texts, pa.string()), with_positions=True)
    for row, text in enumerate(texts):
        toks = tokenize_text(text)
        assert tb.doc_len[row] == len(toks)
        got = {
            str(tb.terms[i]): int(tb.tfs[i])
            for i in range(len(tb.terms))
            if tb.doc_idx[i] == row
        }
        assert got == dict(Counter(toks))
        # positions are exactly the token indices, ascending per pair
        for i in range(len(tb.terms)):
            if tb.doc_idx[i] != row:
                continue
            pos = tb.pos_flat[tb.pos_off[i] : tb.pos_off[i + 1]].tolist()
            assert pos == [j for j, t in enumerate(toks) if t == str(tb.terms[i])]


POSTINGS = st.integers(1, 60).flatmap(
    lambda n: st.tuples(
        st.lists(st.integers(0, 1 << 40), min_size=n, max_size=n, unique=True),
        st.lists(st.integers(1, 1000), min_size=n, max_size=n),
        st.lists(st.integers(1, 5000), min_size=n, max_size=n),
    )
)


@settings(max_examples=40, deadline=None)
@given(POSTINGS)
def test_codec_roundtrip_both_codecs(data):
    from elasticsearch_assets_ray.index.codec import (
        decode_postings,
        decode_postings_pfor,
        encode_postings,
        encode_postings_pfor,
    )

    d, tf, dl = data
    d = np.sort(np.array(d, dtype=np.int64))
    tf = np.array(tf, dtype=np.int64)
    dl = np.array(dl, dtype=np.int64)
    for enc, dec in (
        (encode_postings, decode_postings),
        (encode_postings_pfor, decode_postings_pfor),
    ):
        ep = enc(d, tf, dl)
        dd, dtf = dec(bytes(ep.blob), len(d))
        assert np.array_equal(dd, d)
        assert np.array_equal(dtf, tf)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=60)
)
def test_first_mask_matches_pandas(rows):
    import pandas as pd

    from elasticsearch_assets_ray.stages.bulk import _first_mask

    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    import pyarrow.compute as pc

    s = t.take(pc.sort_indices(t, sort_keys=[("k", "ascending"), ("v", "ascending")]))
    kept = s.filter(_first_mask(s, ["k"]))
    exp = (
        t.to_pandas()
        .sort_values(["k", "v"])
        .drop_duplicates("k", keep="first")
        .reset_index(drop=True)
    )
    assert kept["k"].to_pylist() == exp["k"].tolist()
    assert kept["v"].to_pylist() == exp["v"].tolist()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(0, 100, allow_nan=False), min_size=1, max_size=200),
    st.integers(1, 20),
)
def test_sort_topk_deterministic(scores, k):
    from elasticsearch_assets_ray.query.bm25 import sort_topk

    s = np.array(scores, dtype=np.float64)
    ids = np.arange(s.size, dtype=np.int64)
    gi, gs = sort_topk(ids, s, k)
    order = np.lexsort((ids, -s))[:k]
    assert np.array_equal(gi, ids[order])
    assert np.array_equal(gs, s[order])


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="abcdef", min_size=0, max_size=3), st.sets(st.sampled_from("abcdef0123"), min_size=1, max_size=8))
def test_charclass_expansion_matches_regex(lit, chars):
    import re

    from elasticsearch_assets_ray.sources.reader import expand_charclass_prefix

    cls = "".join(sorted(chars))
    pattern = f"{lit}[{cls}].*"
    prefixes = expand_charclass_prefix(pattern)
    rx = re.compile("^" + re.escape(lit) + f"[{cls}]")
    probes = [lit + c + "tail" for c in "abcdef0123xyz"] + [lit, "zz"]
    for p in probes:
        assert any(p.startswith(pre) for pre in prefixes) == bool(rx.match(p)), p


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(1, 8), min_size=1, max_size=30).flatmap(
        lambda tfs: st.tuples(
            st.just(tfs),
            st.lists(
                st.lists(st.integers(0, 5000), unique=True, min_size=max(tfs), max_size=max(tfs)),
                min_size=len(tfs),
                max_size=len(tfs),
            ),
        )
    )
)
def test_position_codec_roundtrip(data):
    from elasticsearch_assets_ray.index.codec import decode_positions, encode_positions

    tfs, pools = data
    pos = np.concatenate(
        [np.sort(np.array(pool[:t], dtype=np.int32)) for t, pool in zip(tfs, pools)]
    )
    tf_arr = np.array(tfs, dtype=np.int64)
    b, _nb = encode_positions(pos, tf_arr)
    assert np.array_equal(decode_positions(b.tobytes(), tf_arr), pos)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5), min_size=1, max_size=300
    ),
    st.text(alphabet="abc", min_size=0, max_size=4),
)
def test_keyspace_probe_properties(keys, probe):
    """KeyspaceIndex invariants: count_prefix equals the naive count;
    count_range('', None) covers everything; quantile boundaries are
    monotone non-decreasing."""
    import pyarrow as pa

    from elasticsearch_assets_ray.sources.keyspace import (
        KeyspaceIndex,
        quantile_key_ranges,
    )

    ks = KeyspaceIndex(pa.array(keys, pa.string()))
    naive = sum(1 for k in keys if k.startswith(probe))
    assert ks.count_prefix(probe) == naive
    assert ks.count_range(None, None) == len(keys)
    bounds = quantile_key_ranges(ks, 4)
    assert bounds == sorted(bounds)


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 500), st.sampled_from(["ms", "s", "m", "h", "d", "w"]))
def test_interval_roundtrip(n, unit):
    from elasticsearch_assets_ray.sources.dates import (
        interval_ms,
        process_interval,
    )

    parsed = process_interval(f"{n}{unit}")
    assert parsed == (n, unit)
    assert interval_ms(parsed) % n == 0


@settings(max_examples=40, deadline=None)
@given(
    st.datetimes(
        min_value=__import__("datetime").datetime(2000, 1, 1),
        max_value=__import__("datetime").datetime(2030, 1, 1),
    ),
    st.integers(1, 40),
    st.sampled_from(["h", "d", "w", "M"]),
    st.integers(1, 9),
)
def test_interval_ranges_properties(start, n, unit, spans):
    """interval_ranges covers [start, limit) with disjoint, ordered,
    touching windows regardless of unit (incl. calendar months)."""
    from elasticsearch_assets_ray.sources.dates import calendar_add, interval_ranges

    limit = calendar_add(start, (n * spans, unit if unit != "M" else "d"))
    r = interval_ranges(start, limit, (n, unit))
    assert r[0][0] == start and r[-1][1] == limit
    for (a, b), (c, _d) in zip(r, r[1:]):
        assert b == c and a < b
    assert r[-1][0] < limit


# ---------------------------------------------------------------------------
# boolean-expression trees: random tree ↔ string round-trip + semantics
# ---------------------------------------------------------------------------

_TERM_ST = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])


def _trees(depth):
    if depth == 0:
        return st.builds(lambda t: ("term", t), _TERM_ST)
    sub = _trees(depth - 1)
    return st.one_of(
        st.builds(lambda t: ("term", t), _TERM_ST),
        st.builds(lambda c: ("not", c), sub),
        st.builds(lambda a, b: ("and", [a, b]), sub, sub),
        st.builds(lambda a, b: ("or", [a, b]), sub, sub),
        st.builds(
            lambda c, f: ("boost", c, float(f)),
            sub,
            st.integers(min_value=1, max_value=4),
        ),
    )


def _eval_tree(node, present):
    kind = node[0]
    if kind == "term":
        return node[1] in present
    if kind == "not":
        return not _eval_tree(node[1], present)
    if kind == "boost":
        return _eval_tree(node[1], present)
    vals = [_eval_tree(c, present) for c in node[1]]
    return all(vals) if kind == "and" else any(vals)


@settings(max_examples=120, deadline=None)
@given(_trees(3))
def test_tree_string_round_trip_preserves_semantics(tree):
    from itertools import product

    from elasticsearch_assets_ray.query.parser import (
        _parse_bool_tree,
        tree_to_string,
    )

    s = tree_to_string(tree)
    back = _parse_bool_tree(s)
    # the reparse may differ structurally (nested or-of-or flattens);
    # semantics over every assignment of the 5 terms must be identical
    terms = ["aa", "bb", "cc", "dd", "ee"]
    for bits in product([False, True], repeat=5):
        present = {t for t, b in zip(terms, bits) if b}
        assert _eval_tree(tree, present) == _eval_tree(back, present), s


@settings(max_examples=120, deadline=None)
@given(_trees(3))
def test_groundedness_check_is_exact(tree):
    """`_tree_possible` says True is reachable with all terms absent IFF
    the brute-force all-absent evaluation is True (no filter leaves →
    the possible-set must be exact, not conservative)."""
    from elasticsearch_assets_ray.query.parser import _tree_possible

    assert (True in _tree_possible(tree)) == _eval_tree(tree, set())


@settings(max_examples=60, deadline=None)
@given(_trees(3))
def test_boost_mults_bound_scores(tree):
    """tree_boost_mults is an upper bound: for every doc assignment, the
    clause-aware score ≤ Σ mult[t]·s(t) over present positive terms —
    the invariant block-max pruning relies on."""
    from itertools import product

    from elasticsearch_assets_ray.query.parser import tree_boost_mults

    W = {"aa": 1.0, "bb": 2.0, "cc": 0.5, "dd": 3.0, "ee": 1.5}

    def score(node, present):
        kind = node[0]
        if kind == "term":
            ok = node[1] in present
            return ok, (W[node[1]] if ok else 0.0)
        if kind == "not":
            m, _ = score(node[1], present)
            return not m, 0.0
        if kind == "boost":
            m, sc = score(node[1], present)
            return m, sc * node[2]
        res = [score(c, present) for c in node[1]]
        sc = sum(x[1] for x in res)
        if kind == "and":
            m = all(x[0] for x in res)
            return m, sc if m else 0.0
        return any(x[0] for x in res), sc

    mult = tree_boost_mults(tree)
    terms = ["aa", "bb", "cc", "dd", "ee"]
    for bits in product([False, True], repeat=5):
        present = {t for t, b in zip(terms, bits) if b}
        _, sc = score(tree, present)
        ub = sum(mult.get(t, 0.0) * W[t] for t in present)
        assert sc <= ub + 1e-9, (tree, present)
