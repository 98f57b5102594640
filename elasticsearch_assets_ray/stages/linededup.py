"""Line-level deduplication — RefinedWeb/C4-style boilerplate removal.

Web-scale training corpora are full of lines that repeat across many
documents (navigation bars, cookie banners, license headers, footers).
RefinedWeb (arXiv:2306.01116 §3.3) and C4 (arXiv:1910.10683 §2.2) both
remove such lines from every document: a line occurring in at least
``min_docs`` DISTINCT documents is boilerplate and is cut, and each
document's text is rebuilt from its surviving lines in order.

Ray-Data shape (the 100 TB contract):

1. **Count pass** — one ``map_batches`` splits each doc into segments
   and emits per-batch ``(segment, distinct-doc count)`` PARTIALS
   (a segment repeated inside one doc counts once; a doc's rows never
   span batches, so batch-local distinctness is exact).  The ONE
   shuffle is ``groupby(segment).sum`` over those partials — its size
   is bounded by the number of DISTINCT segments, never by corpus rows.
2. **Frequent set** — segments with total count ≥ ``min_docs``.  By
   construction this is the boilerplate set: its size is bounded by
   (corpus rows / min_docs) and in practice tiny, so it is collected
   and broadcast ONCE via ``ray.put`` (``max_frequent`` guards the
   assumption — a blow-past raises rather than silently OOMing the
   driver).
3. **Rewrite pass** — a second stateless ``map_batches`` over the
   ORIGINAL docs re-splits, drops frequent segments
   (``pc.is_in`` against the broadcast set), and rejoins survivors in
   position order.  Text crosses the wire zero extra times: the
   shuffle carried only (segment, count) pairs.

Two segmentation modes, both fully vectorized (Arrow kernels, no
Python row loops):

- ``delim`` (default ``"\\n"``) — real line splitting, the
  RefinedWeb/C4 semantics.
- ``seg_tokens=k`` — fixed k-token windows over the analyzed token
  stream, for corpora without line structure (this repo's synthetic
  documents are single-line word bags); the oracle-checked gate uses
  this mode.

Reference scope note: the reference repo (terascope/elasticsearch-assets)
has no dedup operators — this stage is part of the beyond-reference
training-data surface (SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from elasticsearch_assets_ray.stages.tokenizer import tokenize_column

__all__ = ["line_dedup"]


def _doc_segments(
    texts: pa.Array | pa.ChunkedArray,
    seg_tokens: int | None,
    delim: str,
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split a column of docs into segments.  Returns (flat segment
    strings, per-doc segment counts, flat→doc index)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n = len(texts)
    if seg_tokens is None:
        lists = pc.split_pattern(texts, delim)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        counts = counts.astype(np.int64)
        segs = lists.flatten()
    else:
        toks = tokenize_column(texts)
        flat = toks.flatten()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # drop empty tokens (the analyzer's step 4; SQL's [a-z0-9]+
        # never emits them) while keeping per-doc offsets aligned
        keep = pc.not_equal(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            ck = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
            kept_per_doc = ck[off[1:]] - ck[off[:-1]]
            off = np.concatenate(([0], np.cumsum(kept_per_doc)))
        lens = off[1:] - off[:-1]
        counts = (lens + seg_tokens - 1) // seg_tokens
        total = int(counts.sum())
        # absolute chunk starts: doc start + seg_tokens·(chunk index
        # within doc); consecutive docs abut, so starts + global end is
        # a valid monotone offsets vector
        first = np.cumsum(counts) - counts
        starts = (
            np.repeat(off[:-1], counts)
            + (np.arange(total) - np.repeat(first, counts)) * seg_tokens
        )
        new_off = np.concatenate([starts, off[-1:]])
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat
        )
        segs = pc.binary_join(chunk_lists, " ")
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    return segs, counts, doc_idx


def line_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_docs: int = 2,
    seg_tokens: int | None = None,
    delim: str = "\n",
    max_frequent: int = 5_000_000,
) -> ray.data.Dataset:
    """Remove every segment occurring in ≥ ``min_docs`` distinct docs;
    rebuild each doc from its surviving segments in order.

    Returns a Dataset of ``(id_col, n_lines, n_removed, clean_text)``
    — one row per input doc (docs whose every segment was boilerplate
    come back with ``clean_text=''``).
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would remove everything)")
    join = " " if seg_tokens is not None else delim

    def seg_counts(batch: pa.Table) -> pa.Table:
        segs, _counts, doc_idx = _doc_segments(
            batch[text_col], seg_tokens, delim
        )
        if len(segs) == 0:
            return pa.table(
                {"seg": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        part = (
            pa.table({"seg": segs, "doc": pa.array(doc_idx)})
            .group_by("seg")
            .aggregate([("doc", "count_distinct")])
        )
        return pa.table(
            {
                "seg": part["seg"],
                "n": part["doc_count_distinct"].cast(pa.int64()),
            }
        )

    totals = (
        ds.map_batches(seg_counts, batch_format="pyarrow")
        .groupby("seg")
        .sum("n")
    )

    def only_frequent(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["sum(n)"], pa.scalar(int(min_docs)))
        ).select(["seg"])

    frequent = totals.map_batches(only_frequent, batch_format="pyarrow")
    freq_parts = list(frequent.iter_batches(batch_format="pyarrow"))
    freq_tbl = (
        pa.concat_tables(freq_parts)
        if freq_parts
        else pa.table({"seg": pa.array([], pa.string())})
    )
    if freq_tbl.num_rows > max_frequent:
        raise ValueError(
            f"frequent-segment set ({freq_tbl.num_rows}) exceeds "
            f"max_frequent={max_frequent}; raise the cap or min_docs"
        )
    freq_ref = ray.put(freq_tbl["seg"].combine_chunks())

    def rewrite(batch: pa.Table) -> pa.Table:
        freq = ray.get(freq_ref)
        segs, counts, _doc_idx = _doc_segments(
            batch[text_col], seg_tokens, delim
        )
        n = batch.num_rows
        if len(segs):
            drop = pc.is_in(segs, value_set=freq).to_numpy(
                zero_copy_only=False
            )
        else:
            drop = np.zeros(0, dtype=bool)
        keep = ~drop
        boundaries = np.concatenate(([0], np.cumsum(counts)))
        ck = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
        kept_per_doc = ck[boundaries[1:]] - ck[boundaries[:-1]]
        kept_segs = segs.filter(pa.array(keep)) if len(segs) else segs
        kept_off = np.concatenate(([0], np.cumsum(kept_per_doc)))
        kept_lists = pa.ListArray.from_arrays(
            pa.array(kept_off, pa.int32()), kept_segs
        )
        clean = pc.binary_join(kept_lists, join)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_lines": pa.array(counts, pa.int64()),
                "n_removed": pa.array(counts - kept_per_doc, pa.int64()),
                "clean_text": clean,
            }
        )

    return ds.map_batches(rewrite, batch_format="pyarrow")
