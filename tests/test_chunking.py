"""Token-window chunking (stages/chunking.py)."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.stages.chunking import chunk_batch, chunk_documents
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text


def _ref_chunks(text, window, stride):
    toks = tokenize_text(text)
    n = len(toks)
    if n == 0:
        return []
    m = 1 if n <= window else -((-(n - window)) // stride) + 1
    out = []
    for k in range(m):
        s = k * stride
        e = min(s + window, n)
        out.append((k, s, e - s, " ".join(toks[s:e])))
    return out


def _batch(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


@pytest.mark.parametrize("window,stride", [(8, 8), (8, 5), (3, 1), (100, 50)])
def test_chunk_batch_matches_reference(window, stride):
    rng = np.random.default_rng(7)
    vocab = ["spark", "table", "join", "getHTTPResponse", "x1", "a"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 30)).tolist())
        for _ in range(40)
    ] + ["", "   ", "one"]
    out = chunk_batch(_batch(texts), window=window, stride=stride)
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_text"])
        )
    for i, t in enumerate(texts):
        assert got.get(i, []) == _ref_chunks(t, window, stride)


def test_chunk_invariants():
    texts = ["w " * 25]  # 25 tokens, window 10 stride 7 -> ceil(15/7)+1 = 4
    out = chunk_batch(_batch(texts), window=10, stride=7).to_pylist()
    assert [r["chunk_id"] for r in out] == [0, 1, 2, 3]
    assert [r["start_tok"] for r in out] == [0, 7, 14, 21]
    assert [r["n_tokens"] for r in out] == [10, 10, 10, 4]
    # last chunk reaches the document end
    assert out[-1]["start_tok"] + out[-1]["n_tokens"] == 25
    # consecutive chunks overlap by window - stride
    assert out[0]["start_tok"] + 10 - out[1]["start_tok"] == 3


def test_chunk_empty_batch_and_validation(ray_session):
    out = chunk_batch(_batch([]), window=4, stride=4)
    assert out.num_rows == 0
    assert out.column_names == [
        "doc_id",
        "chunk_id",
        "start_tok",
        "n_tokens",
        "chunk_text",
    ]
    import ray

    ds = ray.data.from_arrow(_batch(["a b c"]))
    with pytest.raises(ValueError, match="window"):
        chunk_documents(ds, window=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(ds, window=4, stride=5)


def test_chunk_registry_oracle_parity(ray_session, sf_dir):
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    got = (
        pa.concat_tables(
            list(
                R.QUERIES["chunk_documents"](sf_dir).iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(R.ORACLES["chunk_documents"])
        .df()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["doc_id", "chunk_id", "start_tok", "n_tokens"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy())
    assert got["chunk_text"].tolist() == want["chunk_text"].tolist()
