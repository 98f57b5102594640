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


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality rules, Rae et al. 2021 —
# public literature): fraction of characters inside the most frequent
# word n-gram, and the duplicate-word fraction.  High values flag
# boilerplate / spam documents in a training corpus.
# ---------------------------------------------------------------------------


def _flat_tokens(batch: pa.Table, text_col: str):
    """(doc_idx int64[], token values StringArray, n_rows) for the
    non-empty analyzed tokens of each row, document order preserved."""
    s = pc.utf8_lower(batch[text_col])
    toks = pc.split_pattern_regex(s, "[^a-z0-9]+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = flat.values
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
    keep = lens > 0
    n = len(flat)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    return doc_idx[keep], vals.filter(pa.array(keep)), n


def _top_ngram_frac(
    doc_idx: np.ndarray, vals: pa.Array, n_rows: int, total_chars: np.ndarray, n: int
) -> np.ndarray:
    """Per-doc fraction of word characters covered by the most frequent
    word n-gram (occurrences × n-gram word chars / total word chars);
    ties break to the lexicographically smallest n-gram; 0 when the doc
    has fewer than n tokens."""
    if len(vals) < n:
        return np.zeros(n_rows, dtype=np.float64)
    # positions whose n consecutive tokens stay within one document
    valid = doc_idx[: len(doc_idx) - n + 1] == doc_idx[n - 1 :]
    if not valid.any():
        return np.zeros(n_rows, dtype=np.float64)
    parts = [vals.slice(j, len(vals) - n + 1) for j in range(n)]
    ng = pc.binary_join_element_wise(*parts, pa.scalar(" "))
    vmask = pa.array(valid)
    tbl = pa.table(
        {"doc": pa.array(doc_idx[: len(valid)][valid]), "ng": ng.filter(vmask)}
    )
    g = tbl.group_by(["doc", "ng"]).aggregate([("ng", "count")])
    g = g.sort_by(
        [("doc", "ascending"), ("ng_count", "descending"), ("ng", "ascending")]
    )
    docs = g["doc"].to_numpy(zero_copy_only=False)
    first = np.ones(len(docs), dtype=bool)
    first[1:] = docs[1:] != docs[:-1]
    top_doc = docs[first]
    top_cnt = g["ng_count"].to_numpy(zero_copy_only=False)[first].astype(np.float64)
    top_chars = (
        pc.utf8_length(g["ng"].combine_chunks().filter(pa.array(first)))
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
        - (n - 1)  # the n-1 joining spaces are not word characters
    )
    out = np.zeros(n_rows, dtype=np.float64)
    tc = total_chars[top_doc]
    nz = tc > 0
    out[top_doc[nz]] = top_cnt[nz] * top_chars[nz] / tc[nz]
    return out


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row ``dup_word_frac`` (1 − distinct/total words),
    ``top2_char_frac`` and ``top3_char_frac`` (character share of the
    most frequent word 2-/3-gram) — the Gopher repetition signals."""
    doc_idx, vals, n = _flat_tokens(batch, text_col)
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False).astype(np.int64)
    total_chars = np.bincount(doc_idx, weights=lens, minlength=n)
    tok_count = np.bincount(doc_idx, minlength=n).astype(np.float64)

    # distinct words per doc (dictionary codes → unique (doc, code))
    if len(vals):
        codes = (
            pc.dictionary_encode(vals).indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        vocab = int(codes.max()) + 1
        uniq = np.bincount(
            np.unique(doc_idx * vocab + codes) // vocab, minlength=n
        ).astype(np.float64)
    else:
        uniq = np.zeros(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        dup = np.where(tok_count > 0, 1.0 - uniq / tok_count, 0.0)

    out = {name: batch[name] for name in batch.column_names}
    out["dup_word_frac"] = pa.array(dup)
    out["top2_char_frac"] = pa.array(
        _top_ngram_frac(doc_idx, vals, n, total_chars, 2)
    )
    out["top3_char_frac"] = pa.array(
        _top_ngram_frac(doc_idx, vals, n, total_chars, 3)
    )
    return pa.table(out)


# ---------------------------------------------------------------------------
# Unigram language-model perplexity (the CCNet quality signal, Wenzek et
# al. arXiv:1911.00359 — CCNet scores with a KenLM 5-gram; the honest
# in-sandbox analog is the corpus's own unigram LM, computed exactly)
# ---------------------------------------------------------------------------


def unigram_counts(
    ds: "ray.data.Dataset", text_col: str = "text", n_groups: int = 64
) -> pa.Table:
    """Corpus unigram model: (term, cnt) + the grand total, via per-batch
    pre-aggregation and ONE bounded coarse-key groupby (the partial_agg
    shape).  The result is vocabulary-sized — the standard broadcast-side
    table of every LM-scoring pass (vocab ≪ corpus)."""
    import ray.data  # noqa: F811

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, vals, _n = _flat_tokens(batch, text_col)
        if len(vals) == 0:
            return pa.table(
                {"grp": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(vals)
        terms = vc.field("values")
        h = polynomial_hash(terms).astype(np.uint64)
        return pa.table(
            {
                "grp": pa.array((h % np.uint64(n_groups)).astype(np.int64)),
                "term": terms,
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        t = group.group_by("term").aggregate([("cnt", "sum")])
        return pa.table({"term": t["term"], "cnt": t["cnt_sum"]})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(combine, batch_format="pyarrow")
    )
    return pa.concat_tables(list(parts.iter_batches(batch_format="pyarrow")))


class UnigramPerplexity:
    """Actor-pool stage: per-doc perplexity under the corpus unigram LM —
    ``exp(−Σ ln p(tᵢ) / n)`` over token POSITIONS (duplicates count).
    The (term, cnt) model is built once (broadcast via ``ray.put``);
    lookup is a sorted-hash searchsorted per batch, no Python loop.
    Empty docs score 0 (no tokens, no evidence)."""

    def __init__(self, model_ref, text_col: str = "text", out_col: str = "unigram_ppl"):
        import ray

        model: pa.Table = ray.get(model_ref)
        h = polynomial_hash(model["term"].combine_chunks()).astype(np.uint64)
        order = np.argsort(h, kind="stable")
        self._hash = h[order]
        cnt = model["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        total = float(cnt.sum())
        self._logp = np.log(cnt / total)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, vals, n = _flat_tokens(batch, self.text_col)
        out = {name: batch[name] for name in batch.column_names}
        if len(vals) == 0:
            out[self.out_col] = pa.array(np.zeros(n, dtype=np.float64))
            return pa.table(out)
        th = polynomial_hash(vals).astype(np.uint64)
        pos = np.searchsorted(self._hash, th)
        pos = np.minimum(pos, self._hash.size - 1)
        known = self._hash[pos] == th  # OOV only if the model table is partial
        lp = np.where(known, self._logp[pos], np.log(0.5 / max(self._logp.size, 1)))
        s = np.bincount(doc_idx, weights=lp, minlength=n)
        m = np.bincount(doc_idx, minlength=n).astype(np.float64)
        ppl = np.zeros(n, dtype=np.float64)
        nz = m > 0
        ppl[nz] = np.exp(-s[nz] / m[nz])
        out[self.out_col] = pa.array(ppl)
        return pa.table(out)


# ---------------------------------------------------------------------------
# Gopher quality FILTER (Rae et al. 2021, Table A1 rules composed into a
# keep/drop verdict with a per-rule fail bitmask)
# ---------------------------------------------------------------------------


def gopher_filter(
    batch: pa.Table,
    text_col: str = "text",
    *,
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopword_ratio: float = 0.02,
    max_dup_word_frac: float = 0.6,
    max_top2_char_frac: float = 0.20,
    max_top3_char_frac: float = 0.18,
) -> pa.Table:
    """Per-row Gopher keep/drop verdict: ``gopher_keep`` (1 iff every
    rule passes) and ``gopher_fail_mask`` (bit i set ⇔ rule i failed:
    0 word-count, 1 mean-word-length, 2 stopword ratio, 3 dup-word
    fraction, 4 top-2-gram chars, 5 top-3-gram chars).  All signals are
    the exact rationals of quality_stats / repetition_stats, so the
    threshold comparisons are bit-deterministic against the SQL twin."""
    q = quality_stats(batch, text_col)
    r = repetition_stats(batch, text_col)
    nw = q["n_words"].to_numpy(zero_copy_only=False)
    mwl = q["mean_word_len"].to_numpy(zero_copy_only=False)
    sr = q["stopword_ratio"].to_numpy(zero_copy_only=False)
    dup = r["dup_word_frac"].to_numpy(zero_copy_only=False)
    t2 = r["top2_char_frac"].to_numpy(zero_copy_only=False)
    t3 = r["top3_char_frac"].to_numpy(zero_copy_only=False)
    fails = np.zeros(len(nw), dtype=np.int64)
    fails |= ((nw < min_words) | (nw > max_words)) * 1
    fails |= ((mwl < min_mean_word_len) | (mwl > max_mean_word_len)) * 2
    fails |= (sr < min_stopword_ratio) * 4
    fails |= (dup > max_dup_word_frac) * 8
    fails |= (t2 > max_top2_char_frac) * 16
    fails |= (t3 > max_top3_char_frac) * 32
    out = {name: batch[name] for name in batch.column_names}
    out["gopher_keep"] = pa.array((fails == 0).astype(np.int64))
    out["gopher_fail_mask"] = pa.array(fails)
    return pa.table(out)


def string_stats_partials(batch: pa.Table, col: str) -> pa.Table:
    """Per-batch partial for the ES ``string_stats`` aggregation over a
    keyword column: one row per distinct CHARACTER with its count, plus
    sentinel rows (char='') carrying (n values, Σ length, min len, max
    len) — vectorized via a flat byte view, no Python per row.  Merge
    with ``partial_agg`` on ``char`` (counts/sums sum; min/max via the
    matching combiners)."""
    vals = batch[col]
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    vals = vals.drop_null()
    n = len(vals)
    if n == 0:
        return pa.table(
            {
                "char": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "n_vals": pa.array([], pa.int64()),
                "len_sum": pa.array([], pa.int64()),
                "len_min": pa.array([], pa.int64()),
                "len_max": pa.array([], pa.int64()),
            }
        )
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
    offs, data = _str_byte_view(vals)
    bc = np.bincount(data[offs[0] : offs[-1]], minlength=256)
    nz = np.flatnonzero(bc)
    chars = [chr(b) for b in nz] + [""]
    cnts = [int(bc[b]) for b in nz] + [0]
    return pa.table(
        {
            "char": pa.array(chars, pa.string()),
            "cnt": pa.array(cnts, pa.int64()),
            "n_vals": pa.array([0] * len(nz) + [n], pa.int64()),
            "len_sum": pa.array([0] * len(nz) + [int(lens.sum())], pa.int64()),
            "len_min": pa.array([0] * len(nz) + [int(lens.min())], pa.int64()),
            "len_max": pa.array([0] * len(nz) + [int(lens.max())], pa.int64()),
        }
    )


def string_stats(ds, col: str) -> dict:
    """Distributed ES ``string_stats``: count, min/max/avg length and
    Shannon entropy (log2 over the character distribution of all values
    concatenated — the ES ``show_distribution`` base).  One map_batches
    pass; the reduce is bounded by the alphabet (≤ 256 rows for the
    ASCII corpora this repo targets).  NOTE: byte-view char counting —
    exact for ASCII; multi-byte corpora would count bytes (documented)."""
    from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg

    parts = ds.map_batches(
        lambda b: string_stats_partials(b, col), batch_format="pyarrow"
    )
    merged = pa.concat_tables(
        list(
            partial_agg(
                parts,
                ["char"],
                [
                    AggSpec("cnt", "cnt", "sum"),
                    AggSpec("n_vals", "n_vals", "sum"),
                    AggSpec("len_sum", "len_sum", "sum"),
                    AggSpec("len_min", "len_min", "min"),
                    AggSpec("len_max", "len_max", "max"),
                ],
            ).iter_batches(batch_format="pyarrow")
        )
    )
    chars = merged["char"].to_pylist()
    cnt = merged["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    sent = [i for i, c in enumerate(chars) if c == ""]
    n_vals = int(merged["n_vals"].to_numpy(zero_copy_only=False)[sent].sum())
    len_sum = int(merged["len_sum"].to_numpy(zero_copy_only=False)[sent].sum())
    # sentinel min/max merged across batches by the partial_agg combiners;
    # several sentinel rows never exist (one per (char='') group), but the
    # zero-filled char rows force a mask here
    len_min = int(merged["len_min"].to_numpy(zero_copy_only=False)[sent].min())
    len_max = int(merged["len_max"].to_numpy(zero_copy_only=False)[sent].max())
    keep = np.array([c != "" for c in chars], dtype=bool)
    c = cnt[keep]
    total = float(c.sum())
    p = c / total
    entropy = float(-(p * np.log2(p)).sum())
    return {
        "count": n_vals,
        "min_length": len_min,
        "max_length": len_max,
        "avg_length": len_sum / n_vals if n_vals else None,
        "entropy": entropy,
    }
