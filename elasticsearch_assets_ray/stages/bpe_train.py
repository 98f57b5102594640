"""Distributed BPE tokenizer training — LLM training-data preparation.

Classic byte-pair-encoding training (Sennrich et al. 2015; the GPT-2
tokenizer recipe) factors into two stages with very different scaling:

1. **word-frequency dictionary** — corpus-size dependent.  Here it is
   ONE combiner-first :func:`partial_agg` shuffle over the canonical
   analysis chain's tokens (stages/tokenizer.py): per batch the (word,
   count) partials are pre-aggregated, so the exchange is bounded by
   per-batch distinct words, never corpus tokens.  This is the only
   stage that touches the 100 TB corpus.
2. **merge learning** — vocab-size dependent (≤ distinct words, which
   is millions, not trillions).  The loop runs driver-side but fully
   vectorized: symbol sequences live in ONE flat numpy int32 array with
   a word-id row index; each iteration counts adjacent pairs with one
   np.unique over a packed (left<<32 | right) key weighted by word
   frequency, picks argmax (count DESC, pair-id ASC tie-break — fully
   deterministic), and applies the merge with boolean masks.  No Python
   loop over words, ever.

This is exactly how production BPE trainers scale (HuggingFace
tokenizers, SentencePiece): distribute the counting, centralize the
bounded dictionary.  The reference repo has no tokenizer training — it
delegates analysis to ES — so this is a beyond-the-reference
training-data operator (SURVEY.md §2 extension table).

Encoding (:func:`bpe_encode_counts`) applies the learned merge list to
new text vectorized per batch — a stateless ``map_batches`` stage whose
merge table broadcasts by closure capture (small: n_merges entries).

Oracle strategy: iteration-0 pair counts are exactly SQL-replicable
(character bigrams of each distinct word weighted by word frequency) and
ride the ``agg_suite`` gate; the full merge loop and encoder are pinned
against a pure-Python reference implementation in tests/test_bpe_train.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: end-of-word sentinel symbol (classic BPE word-boundary marker)
EOW = "</w>"


# ---------------------------------------------------------------------------
# stage 1 — distributed word-frequency dictionary
# ---------------------------------------------------------------------------


def word_freqs(ds, content_col: str = "text"):
    """(word, count) over the canonical kept-token stream — one
    combiner-first shuffle; returns a Dataset of partial-combined rows."""
    from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg
    from elasticsearch_assets_ray.stages.tokenizer import kept_token_stream, tokenize_column

    def words(batch: pa.Table) -> pa.Table:
        flat, _ = kept_token_stream(tokenize_column(batch[content_col]))
        return pa.table({"word": flat})

    tokens = ds.map_batches(words, batch_format="pyarrow")
    return partial_agg(tokens, ["word"], [AggSpec("count", "word", "count")])


def collect_word_freqs(ds) -> pa.Table:
    """Materialize the (bounded) dictionary, word-ascending for
    determinism."""
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.take(pc.sort_indices(t, sort_keys=[("word", "ascending")]))


# ---------------------------------------------------------------------------
# stage 2 — vectorized merge learning over the dictionary
# ---------------------------------------------------------------------------


def _init_symbols(words: list[str]) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Flatten the dictionary into (sym_ids, word_ids) with EOW appended
    per word; returns the initial alphabet (id → string)."""
    alphabet: dict[str, int] = {}
    sym_list: list[int] = []
    word_ids: list[int] = []
    for wi, w in enumerate(words):
        for ch in w:
            sym_list.append(alphabet.setdefault(ch, len(alphabet)))
            word_ids.append(wi)
        sym_list.append(alphabet.setdefault(EOW, len(alphabet)))
        word_ids.append(wi)
    vocab = [s for s, _ in sorted(alphabet.items(), key=lambda kv: kv[1])]
    return (
        np.asarray(sym_list, dtype=np.int64),
        np.asarray(word_ids, dtype=np.int64),
        vocab,
    )


def pair_counts(
    syms: np.ndarray, word_ids: np.ndarray, weights: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Adjacent-pair weighted counts in one vectorized pass: keys are
    packed ``left * V + right`` only for positions whose neighbor is in
    the SAME word."""
    if syms.size < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    same = word_ids[1:] == word_ids[:-1]
    V = int(syms.max()) + 1
    key = syms[:-1][same] * V + syms[1:][same]
    w = weights[word_ids[:-1][same]]
    uk, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
    return uk, cnt


def learn_bpe(
    word_freq: pa.Table, n_merges: int
) -> tuple[list[tuple[str, str]], list[str]]:
    """Learn ``n_merges`` merges.  Tie-break: count DESC, then the pair's
    (left, right) symbol-id pair ASC — deterministic for any input order
    because symbol ids derive from the word-ascending dictionary."""
    words = word_freq["word"].to_pylist()
    weights = word_freq["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    syms, word_ids, vocab = _init_symbols(words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if syms.size < 2:
            break
        uk, cnt = pair_counts(syms, word_ids, weights)
        if uk.size == 0:
            break
        best_i = np.lexsort((uk, -cnt))[0]
        V = int(syms.max()) + 1
        left, right = int(uk[best_i] // V), int(uk[best_i] % V)
        new_id = len(vocab)
        vocab.append(vocab[left] + vocab[right])
        merges.append((vocab[left], vocab[right]))
        # apply the merge: positions i with (s[i], s[i+1]) == (l, r),
        # non-overlapping left-to-right (mask out an odd-position match
        # whose predecessor also matched — the classic BPE scan rule)
        same = np.concatenate([(word_ids[1:] == word_ids[:-1]), [False]])
        hit = np.zeros(syms.size, dtype=bool)
        hit[:-1] = (syms[:-1] == left) & (syms[1:] == right)
        hit &= same
        if left == right:
            # overlap only possible in runs of the same symbol ("aaaa"):
            # greedy left-to-right keeps the EVEN offsets within each
            # maximal run of matches (merge at 0 and 2, not 1)
            prev = np.concatenate([[False], hit[:-1]])
            idx = np.arange(hit.size, dtype=np.int64)
            rs = np.where(hit & ~prev, idx, -1)
            rs = np.maximum.accumulate(rs)
            hit &= ((idx - rs) % 2) == 0
        syms = syms.copy()
        syms[hit] = new_id
        drop = np.concatenate([[False], hit[:-1]])
        keep = ~drop
        syms = syms[keep]
        word_ids = word_ids[keep]
    return merges, vocab


# ---------------------------------------------------------------------------
# encoding with a learned merge list (pure-Python reference + batch stage)
# ---------------------------------------------------------------------------


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference encoder: repeatedly merge the lowest-rank adjacent pair
    (the canonical BPE inference rule)."""
    parts = list(word) + [EOW]
    while len(parts) > 1:
        best = None
        best_rank = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        parts[best : best + 2] = [parts[best] + parts[best + 1]]
    return parts


def bpe_encode_counts(ds, merges: list[tuple[str, str]], content_col: str = "text"):
    """Per-doc learned-BPE token counts: stateless ``map_batches``; the
    merge table ships once by closure (small).  Per batch the encoder
    memoizes per distinct word — cost ∝ distinct words per batch, not
    tokens."""
    ranks = {m: i for i, m in enumerate(merges)}

    def run(batch: pa.Table) -> pa.Table:
        from elasticsearch_assets_ray.stages.tokenizer import (
            kept_token_stream,
            tokenize_column,
        )

        # the SAME kept-token stream the dictionary was trained on —
        # empties / over-long tokens contribute no pieces
        flat, doc_idx = kept_token_stream(tokenize_column(batch[content_col]))
        n_docs = batch.num_rows
        uniq, inv = np.unique(np.asarray(flat.to_pylist(), dtype=object), return_inverse=True)
        piece_counts = np.asarray(
            [len(bpe_encode_word(w, ranks)) for w in uniq], dtype=np.int64
        )
        per_tok = piece_counts[inv] if inv.size else np.empty(0, np.int64)
        n_pieces = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_pieces, doc_idx, per_tok)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bpe_learned_tokens": pa.array(n_pieces, pa.int64()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")
