"""Token-window document chunking — LLM training-data preparation.

Splits each document into fixed-size token windows with overlap (the
context-window chunking every pretraining / RAG ingestion pipeline
needs): window ``w``, stride ``s`` ≤ w, chunk k covers kept-token
positions ``[k·s, min(k·s + w, n))``; a document with n ≤ w tokens
yields exactly one chunk, an empty document yields none, and the last
chunk always reaches the document's end (k_max = ⌈(n−w)/s⌉).

Tokens are the canonical analysis chain's KEPT tokens
(stages/tokenizer.py — same positions the positional index stores), and
``chunk_text`` is the space-joined token slice.  That joined-token
contract is what makes the operator exactly oracle-checkable: DuckDB
replicates it as ``array_to_string(ts[k·s+1 : least(k·s+w, n)], ' ')``
over the same token expression.

Scale shape: ONE stateless vectorized ``map_batches`` pass — per batch,
the flat token array is gathered once per chunk position (np.repeat /
cumsum arithmetic, no Python loop over docs or tokens) and the join is
a single Arrow ``binary_join`` kernel.  No shuffle; output size ≈
(1 + overlap) × corpus tokens, streaming through the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from elasticsearch_assets_ray.stages.tokenizer import kept_token_stream, tokenize_column


def chunk_batch(
    batch: pa.Table,
    window: int,
    stride: int,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """One batch → (id, chunk_id, start_tok, n_tokens, chunk_text)."""
    toks = tokenize_column(batch[content_col])
    n_docs = len(toks)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    empty = pa.table(
        {
            id_col: pa.array([], ids.type),
            "chunk_id": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    if n_docs == 0:
        return empty
    flat, doc_idx_all = kept_token_stream(toks)
    n = np.bincount(doc_idx_all, minlength=n_docs).astype(np.int64)
    doc_start = np.concatenate(([0], np.cumsum(n[:-1])))

    # chunks per doc: 0 for empty, 1 for n<=w, else ceil((n-w)/s)+1
    m = np.where(
        n == 0, 0, np.where(n <= window, 1, -((-(n - window)) // stride) + 1)
    ).astype(np.int64)
    total = int(m.sum())
    if total == 0:
        return empty
    doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), m)
    first = np.concatenate(([0], np.cumsum(m[:-1])))
    k = np.arange(total, dtype=np.int64) - first[doc_rep]
    starts = k * stride
    clens = np.minimum(starts + window, n[doc_rep]) - starts

    # gather the (overlapping) chunk token slices in one fancy index
    chunk_off = np.concatenate(([0], np.cumsum(clens))).astype(np.int32)
    take = (
        np.repeat(doc_start[doc_rep] + starts, clens)
        + np.arange(int(clens.sum()), dtype=np.int64)
        - np.repeat(chunk_off[:-1].astype(np.int64), clens)
    )
    gathered = flat.take(pa.array(take, type=pa.int64()))
    chunk_lists = pa.ListArray.from_arrays(pa.array(chunk_off, pa.int32()), gathered)
    texts = pc.binary_join(chunk_lists, pa.scalar(" "))

    return pa.table(
        {
            id_col: ids.take(pa.array(doc_rep, type=pa.int64())),
            "chunk_id": pa.array(k),
            "start_tok": pa.array(starts),
            "n_tokens": pa.array(clens),
            "chunk_text": texts,
        }
    )


def chunk_documents(
    ds,
    window: int,
    stride: int | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
):
    """Dataset → Dataset of token-window chunks (see module docstring).
    ``stride`` defaults to ``window`` (no overlap); ``stride < window``
    overlaps consecutive chunks by ``window - stride`` tokens."""
    if window <= 0:
        raise ValueError("window must be positive")
    stride = window if stride is None else stride
    if not 0 < stride <= window:
        raise ValueError("stride must be in (0, window]")
    import functools

    return ds.map_batches(
        functools.partial(
            chunk_batch,
            window=window,
            stride=stride,
            content_col=content_col,
            id_col=id_col,
        ),
        batch_format="pyarrow",
    )
