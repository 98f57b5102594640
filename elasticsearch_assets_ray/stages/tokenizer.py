"""Code-aware tokenizer — the single analysis chain shared by the index
builder AND the brute-force oracle scorer (rank-identity requires one
tokenizer, SURVEY.md §7.4).

Analysis chain (canonical, pinned):

1. camelCase boundary split: insert a space at every lower/digit→UPPER
   boundary (``getHTTPResponse`` → ``get HTTPResponse``).
2. lowercase.
3. split on runs of anything outside ``[a-z0-9]`` (this also splits
   snake_case at ``_`` and dotted paths at ``.``).
4. drop empty tokens and tokens longer than ``MAX_TOKEN_LEN`` (minified
   blobs / embedded base64).

Two implementations with tested parity:

- :func:`tokenize_text` — pure Python, used by the oracle and tests.
- :func:`doc_term_freqs` — vectorized Arrow/numpy path used inside
  ``map_batches(batch_format="pyarrow")``; never iterates Python rows.

The ES analog is the ``standard`` analyzer the reference delegates to
(reference: ElasticsearchReaderClient.ts search/count calls — tokenization
is entirely ES-side there).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_TOKEN_LEN = 64

# lower-or-digit followed by upper = camelCase boundary
_CAMEL_RE_STR = r"([a-z0-9])([A-Z])"
_SPLIT_RE_STR = r"[^a-z0-9]+"

_CAMEL_RE = re.compile(_CAMEL_RE_STR)
_SPLIT_RE = re.compile(_SPLIT_RE_STR)


def tokenize_text(text: str, analyzer=None) -> list[str]:
    """Pure-Python reference tokenizer (oracle path).  ``analyzer`` is
    an optional :class:`~elasticsearch_assets_ray.stages.analysis.AnalyzerSpec`
    whose token-filter chain runs after the canonical steps."""
    if not text:
        return []
    s = _CAMEL_RE.sub(r"\1 \2", text).lower()
    toks = [t for t in _SPLIT_RE.split(s) if 0 < len(t) <= MAX_TOKEN_LEN]
    return analyzer.apply_tokens(toks) if analyzer is not None else toks


@dataclass
class TokenizedBatch:
    """Per-batch tokenization result (all arrays aligned to unique
    (doc, term) pairs except ``doc_len`` which is per input row).

    With positions requested, ``pos_flat``/``pos_off`` hold each pair's
    ascending token positions (index within the doc's KEPT tokens — the
    same sequence :func:`tokenize_text` yields, so position adjacency ≡
    token-list adjacency): pair i's positions are
    ``pos_flat[pos_off[i]:pos_off[i+1]]`` (length = tfs[i])."""

    doc_idx: np.ndarray  # int64, index into the input batch rows
    terms: np.ndarray  # object/str array of terms
    tfs: np.ndarray  # int64 term frequency per (doc, term)
    doc_len: np.ndarray  # int64 kept-token count per input row
    pos_flat: np.ndarray | None = None  # int32 positions (when requested)
    pos_off: np.ndarray | None = None  # int64 offsets per pair


def kept_token_stream(toks: pa.ListArray) -> tuple[pa.Array, np.ndarray]:
    """Flatten a :func:`tokenize_column` result into the canonical KEPT
    token stream: (flat tokens, per-token doc index) with empties and
    over-long tokens dropped (analysis-chain step 4) — the ONE
    implementation every batch-level consumer of the token stream shares
    (index build, chunking, BPE training)."""
    toks = toks.fill_null([])
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values  # StringArray of all tokens incl. empties
    doc_idx_all = np.repeat(
        np.arange(offsets.size - 1, dtype=np.int64), np.diff(offsets)
    )
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = (lens > 0) & (lens <= MAX_TOKEN_LEN)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_idx_all = doc_idx_all[keep]
    return flat, doc_idx_all


def tokenize_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized steps 1-3 → list<string> (may contain empty tokens)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.replace_substring_regex(col, _CAMEL_RE_STR, r"\1 \2")
    s = pc.utf8_lower(s)
    return pc.split_pattern_regex(s, _SPLIT_RE_STR)


def doc_term_freqs(
    col: pa.Array | pa.ChunkedArray,
    with_positions: bool = False,
    analyzer=None,
) -> TokenizedBatch:
    """Vectorized (doc, term, tf) + doc lengths for a batch of texts.

    Hot path of the index build: Arrow kernels for the string work, then
    dictionary-encode + np.unique for the tf counting — no Python loop
    over rows or tokens.  ``with_positions`` additionally emits each
    pair's token positions (one stable argsort over the composite key —
    within a pair, original token order = ascending position).
    """
    def _empty(doc_len: np.ndarray) -> TokenizedBatch:
        e = np.empty(0, dtype=np.int64)
        tb = TokenizedBatch(e, np.empty(0, dtype=object), e, doc_len)
        if with_positions:
            tb.pos_flat = np.empty(0, dtype=np.int32)
            tb.pos_off = np.zeros(1, dtype=np.int64)
        return tb

    toks = tokenize_column(col)
    n_docs = len(toks)
    if n_docs == 0:
        return _empty(np.empty(0, dtype=np.int64))

    flat, doc_idx_all = kept_token_stream(toks)

    if analyzer is not None and analyzer.filters and len(flat) > 0:
        # token-filter chain (stages/analysis.py): transform the batch's
        # UNIQUE terms once, then gather through the dictionary codes —
        # per-token cost is one fancy-index regardless of text volume.
        dict_arr0 = pc.dictionary_encode(flat)
        codes0 = dict_arr0.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab0 = dict_arr0.dictionary.to_numpy(zero_copy_only=False)
        new_terms, keepv = analyzer.apply_vocab(vocab0)
        keep2 = keepv[codes0]
        if not keep2.all():
            codes0 = codes0[keep2]
            doc_idx_all = doc_idx_all[keep2]
        flat = pa.array(new_terms[codes0], pa.string())

    doc_len = np.bincount(doc_idx_all, minlength=n_docs).astype(np.int64)

    if len(flat) == 0:
        return _empty(doc_len)

    # tf per (doc, term): dictionary-encode terms to int codes, then count
    # unique (doc_idx, code) pairs via a single composite int64 key.
    dict_arr = pc.dictionary_encode(flat)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary
    vocab_size = len(vocab)
    key = doc_idx_all * vocab_size + codes
    uniq, tfs = np.unique(key, return_counts=True)
    u_doc = uniq // vocab_size
    u_code = uniq % vocab_size
    u_terms = np.asarray(vocab.take(pa.array(u_code)))
    tb = TokenizedBatch(u_doc, u_terms, tfs.astype(np.int64), doc_len)
    if with_positions:
        # token position within its doc (among KEPT tokens)
        doc_start = np.concatenate(([0], np.cumsum(doc_len[:-1])))
        pos_all = (np.arange(len(codes), dtype=np.int64) - doc_start[doc_idx_all]).astype(np.int32)
        order = np.argsort(key, kind="stable")  # groups pairs; keeps position order
        tb.pos_flat = pos_all[order]
        tb.pos_off = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
    return tb


def analyze(text: str, analyzer=None) -> pa.Table:
    """ES ``_analyze`` analog: run the canonical chain over one string
    and return (token, position, start_offset, end_offset) with offsets
    into the ORIGINAL text.  Token sequence is exactly
    :func:`tokenize_text`'s (pinned by tests): alnum fragments of the
    original split at camelCase boundaries, lowercased, overlong tokens
    dropped (positions count KEPT tokens, the doc_term_freqs
    convention).  With ``analyzer``, the token-filter chain also runs:
    filtered tokens are skipped (positions stay dense over kept tokens)
    and stemmed tokens keep the ORIGINAL surface form's offsets — ES
    ``_analyze`` offset semantics."""
    toks: list[str] = []
    pos: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    p = 0

    def _emit(piece: str, s0: int, e0: int) -> None:
        nonlocal p
        tok = piece.lower()
        if analyzer is not None:
            tok = analyzer.apply_token(tok)
            if tok is None:
                return
        toks.append(tok)
        pos.append(p)
        starts.append(s0)
        ends.append(e0)
        p += 1
    for frag in re.finditer(r"[A-Za-z0-9]+", text or ""):
        s = frag.start()
        sub = frag.group(0)
        # camel boundaries inside the fragment (lower/digit → UPPER)
        cut = 0
        for m in _CAMEL_RE.finditer(sub):
            piece = sub[cut : m.start() + 1]
            if 0 < len(piece) <= MAX_TOKEN_LEN:
                _emit(piece, s + cut, s + cut + len(piece))
            cut = m.start() + 1
        piece = sub[cut:]
        if 0 < len(piece) <= MAX_TOKEN_LEN:
            _emit(piece, s + cut, s + cut + len(piece))
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "position": pa.array(pos, pa.int64()),
            "start_offset": pa.array(starts, pa.int64()),
            "end_offset": pa.array(ends, pa.int64()),
        }
    )
