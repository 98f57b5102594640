import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_assets_ray.stages.tokenizer import (
    MAX_TOKEN_LEN,
    doc_term_freqs,
    tokenize_text,
)


def test_basic_code_tokens():
    assert tokenize_text("def getHTTPResponse(self): return foo_bar") == [
        "def", "get", "httpresponse", "self", "return", "foo", "bar",
    ]


def test_camel_snake_digits():
    assert tokenize_text("camelCaseX snake_case v2Fast") == [
        "camel", "case", "x", "snake", "case", "v2", "fast",
    ]


def test_empty_and_overlong():
    assert tokenize_text("") == []
    assert tokenize_text("   \n\t !!! ") == []
    long_tok = "a" * (MAX_TOKEN_LEN + 1)
    assert tokenize_text(f"keep {long_tok} kept") == ["keep", "kept"]
    assert tokenize_text("b" * MAX_TOKEN_LEN) == ["b" * MAX_TOKEN_LEN]


def _freqs_via_python(texts):
    out = []
    for i, t in enumerate(texts):
        toks = tokenize_text(t or "")
        counts = {}
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
        out.append((len(toks), counts))
    return out


def _assert_parity(texts):
    tb = doc_term_freqs(pa.array(texts, type=pa.string()))
    ref = _freqs_via_python(texts)
    assert tb.doc_len.tolist() == [r[0] for r in ref]
    got = {}
    for d, term, tf in zip(tb.doc_idx, tb.terms, tb.tfs):
        got.setdefault(int(d), {})[str(term)] = int(tf)
    for i, (_, counts) in enumerate(ref):
        assert got.get(i, {}) == counts, f"doc {i}"


def test_vectorized_matches_python_reference():
    _assert_parity(
        [
            "def foo(): return barBaz + foo",
            "",
            None,
            "x" * 100 + " ok",
            "import os import os import os",
            "über ASCII-only splitting 例",
        ]
    )


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=200), max_size=8))
def test_vectorized_parity_fuzz(texts):
    _assert_parity(texts)


def test_doc_term_freqs_sorted_and_unique():
    tb = doc_term_freqs(pa.array(["b a b a c", "a a"]))
    # pairs unique per (doc, term)
    pairs = list(zip(tb.doc_idx.tolist(), tb.terms.tolist()))
    assert len(pairs) == len(set(pairs))
    assert tb.doc_len.tolist() == [5, 2]
    assert int(tb.tfs.sum()) == 7
