"""Text-analysis stages for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All stages are stateless vectorized ``map_batches`` functions over Arrow
batches (pyarrow.compute string kernels + numpy); language-ID holds its
profile table as module-level constant state (tiny).  Nothing here exists
in the reference (it delegates all analysis to Elasticsearch); these are
the first-class training-data operators required on top of SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting  (SQL-oracle-compatible contract: tokens = maximal runs of
# [a-z0-9]+ over the lowercased text — same core as the index tokenizer
# minus the camelCase step, which is a no-op on lowercase corpora)
# ---------------------------------------------------------------------------

_TOKEN_RE = r"[a-z0-9]+"


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row token_count, uniq_token_count, char_count."""
    s = pc.utf8_lower(batch[text_col])
    # split on non-token runs; empty fragments dropped by the length mask
    toks = pc.split_pattern_regex(s, "[^a-z0-9]+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = flat.values
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
    keep = lens > 0
    n = len(flat)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    tok_count = np.bincount(doc_idx[keep], minlength=n).astype(np.int64)

    # unique per doc: dictionary-encode tokens, unique (doc, code) pairs
    if keep.any():
        kept_vals = vals.filter(pa.array(keep))
        kept_doc = doc_idx[keep]
        codes = pc.dictionary_encode(kept_vals).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = int(codes.max()) + 1 if codes.size else 1
        pairs = np.unique(kept_doc * vocab + codes)
        uniq_count = np.bincount(pairs // vocab, minlength=n).astype(np.int64)
    else:
        uniq_count = np.zeros(n, dtype=np.int64)

    out = {name: batch[name] for name in batch.column_names}
    out["token_count"] = pa.array(tok_count)
    out["uniq_token_count"] = pa.array(uniq_count)
    out["char_count"] = pc.cast(pc.utf8_length(batch[text_col]), pa.int64())
    return pa.table(out)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = (
    "the a an and or of to in is are was for on with as by at it this that "
    "be from"
).split()


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword-ratio quality features per row.

    Ratios are exact rationals evaluated as float64 numerator/denominator
    divisions — reproducible in SQL for the oracle check."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    lowered = pc.utf8_lower(text)
    # punctuation chars (non-alnum, non-space)
    stripped = pc.replace_substring_regex(lowered, r"[a-z0-9\s]", "")
    n_punct = pc.cast(pc.utf8_length(stripped), pa.int64())
    toks = pc.split_pattern_regex(lowered, "[^a-z0-9]+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = flat.values
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
    keep = lens > 0
    n = len(flat)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    n_words = np.bincount(doc_idx[keep], minlength=n).astype(np.int64)
    stop_mask = pc.is_in(vals, value_set=pa.array(_STOPWORDS)).to_numpy(
        zero_copy_only=False
    ) & keep
    n_stop = np.bincount(doc_idx[stop_mask], minlength=n).astype(np.int64)

    nw = np.maximum(n_words, 1).astype(np.float64)
    nc = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1).astype(np.float64)
    out = {name: batch[name] for name in batch.column_names}
    out["n_words"] = pa.array(n_words)
    out["n_punct"] = n_punct
    out["stopword_ratio"] = pa.array(n_stop.astype(np.float64) / nw)
    out["punct_ratio"] = pa.array(
        n_punct.to_numpy(zero_copy_only=False).astype(np.float64) / nc
    )
    out["mean_word_len"] = pa.array(
        np.where(n_words > 0, np.bincount(doc_idx[keep], weights=lens[keep], minlength=n) / nw, 0.0)
    )
    return pa.table(out)


# ---------------------------------------------------------------------------
# language ID — character n-gram profile heuristic
# ---------------------------------------------------------------------------

# tiny per-language marker sets (function words + diacritics); deterministic,
# no external model.  Score = count of marker-word hits per language.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "que", "dans", "pas"],
    "es": ["el", "la", "los", "y", "es", "una", "por", "que", "con", "para"],
    "zh": ["的", "是", "了", "在", "我", "有", "他", "这", "不", "人"],
}


class LanguageID:
    """Actor-pool stage: marker tables are built once per actor
    (``__init__``), batches scored vectorized.  Use with
    ``ds.map_batches(LanguageID, concurrency=N, batch_format="pyarrow")``."""

    def __init__(self, text_col: str = "text", out_col: str = "pred_lang"):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = sorted(_LANG_MARKERS)
        self.marker_sets = [set(_LANG_MARKERS[lg]) for lg in self.langs]
        flat = []
        owner = []
        for i, lg in enumerate(self.langs):
            for w in _LANG_MARKERS[lg]:
                flat.append(w)
                owner.append(i)
        self.marker_arr = pa.array(flat)
        self.owner = np.array(owner, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(batch[self.text_col])
        toks = pc.split_pattern_regex(lowered, r"[^\w一-鿿]+")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = flat.values
        n = len(flat)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        midx = pc.fill_null(
            pc.index_in(vals, value_set=self.marker_arr), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        hit = midx >= 0
        if hit.any():
            np.add.at(
                scores, (doc_idx[hit], self.owner[midx[hit]]), 1
            )
        # zh marker hits live inside CJK runs: also count CJK chars directly
        cjk = pc.count_substring_regex(batch[self.text_col], r"[一-鿿]")
        zh_i = self.langs.index("zh")
        scores[:, zh_i] += cjk.to_numpy(zero_copy_only=False).astype(np.int64)
        best = np.argmax(scores, axis=1)
        none_mask = scores.max(axis=1) == 0
        pred = np.array(self.langs, dtype=object)[best]
        pred[none_mask] = "unknown"
        out = {name: batch[name] for name in batch.column_names}
        out[self.out_col] = pa.array(pred, type=pa.string())
        return pa.table(out)


# ---------------------------------------------------------------------------
# document fingerprinting — rolling-hash content fingerprint
# ---------------------------------------------------------------------------

_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def _str_byte_view(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], flat uint8 data) view of a string column's
    utf-8 bytes (zero-copy from the Arrow buffers)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    return offs, data


def polynomial_hash(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row Horner hash of the utf-8 bytes, mod 2^64 (uint64 wraparound
    is the modulus — identical in the vectorized and scalar paths).

    Vectorized across rows: pass j processes byte j of every still-active
    row simultaneously (max-row-length passes, each a full-width numpy op)."""
    offsets, data = _str_byte_view(col)
    lens = np.diff(offsets)
    n_rows = len(lens)
    h = np.zeros(n_rows, dtype=np.uint64)
    maxlen = int(lens.max()) if n_rows else 0
    base = np.uint64(_FP_BASE)
    for j in range(maxlen):
        active = lens > j
        idx = offsets[:-1][active] + j
        h[active] = h[active] * base + data[idx]
    return h


def fingerprint(batch: pa.Table, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    """Deterministic 64-bit polynomial rolling hash of the content — an
    order-sensitive document fingerprint, stable across runs/processes."""
    h = polynomial_hash(batch[text_col])
    cols = {name: batch[name] for name in batch.column_names}
    cols[out_col] = pa.array(h.astype(np.int64))
    return pa.table(cols)
