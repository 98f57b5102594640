"""ES *phrase suggester* analog: whole-phrase "did you mean" over a
corpus bigram language model.

ES's phrase suggester (``suggest.phrase``) improves on the term
suggester by scoring CANDIDATE PHRASES with an n-gram language model
built from the index (``laplace`` / ``stupid_backoff`` smoothing),
so corrections respect context ("fast scan filter" outranks
"fist scan filter" even when both are 1 edit away).  Reference parity:
the reference delegates suggestion entirely to ES; this is the same
REST surface (``suggest.phrase`` with the default ``stupid_backoff``)
re-expressed Ray-Data-first.

Pipeline shape (the 100 TB story):

- **Model build** (:func:`build_phrase_lm`) is ONE vectorized
  ``map_batches`` pass over the corpus emitting per-batch partial
  (v, w, n) counts — bigrams, plus unigrams as ``w = ''`` rows (tokens
  are never empty, so the sentinel cannot collide) — reduced by the
  combiner-first ``partial_agg``.  Nothing row-wise, nothing driver-side
  until the final (vocab-bounded) collect.  At 100 TB you keep the
  reduced model as a Dataset, truncate to the top-M bigrams, and
  broadcast it via ``ray.put`` (the suggester only ever probes
  ``per_token²`` pairs per adjacent slot); the synthetic-corpus gate
  collects it whole.
- **Serving** (:func:`suggest_phrases`) is per-query work: per-token
  candidate generation by banded Levenshtein over the vocabulary
  (distance ≤ ``max_edits``, ranked distance asc / count desc / term
  asc, top ``per_token`` — the term-suggester contract), then exact
  stupid-backoff scoring of the candidate product space
  (``per_token^n_tokens`` ≤ 125 phrases at the defaults).

Scoring (pinned, mirrored literally by the SQL twin):

    score(w_0..w_k) = ln(c(w_0)/N)
                    + Σ_i  ln(c(w_{i-1} w_i) / c(w_{i-1}))       if seen
                           ln(0.4 · c(w_i) / N)                  else

Ranking: round(score, 9) desc, suggestion asc; reported round(score, 6).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from elasticsearch_assets_ray.query.expand import levenshtein_batch
from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg
from elasticsearch_assets_ray.stages.tokenizer import (
    MAX_TOKEN_LEN,
    tokenize_column,
    tokenize_text,
)

BACKOFF = 0.4


def bigram_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial counts: bigram rows (v, w, n) + unigram rows
    (v, '', n).  All Arrow/numpy — the only Python iteration is over the
    unique keys of THIS batch (bounded by the batch's vocabulary)."""
    toks = tokenize_column(batch[text_col]).fill_null([])
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    n_docs = len(toks)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = (lens > 0) & (lens <= MAX_TOKEN_LEN)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
    if len(flat) == 0:
        return pa.table(
            {
                "v": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    # unigram partials
    uc = pc.value_counts(flat)
    v_out = [uc.field("values").cast(pa.string())]
    w_out = [pa.array([""] * len(uc), pa.string())]
    n_out = [uc.field("counts").cast(pa.int64())]
    # bigram partials: adjacent kept tokens within the same doc
    if len(flat) > 1:
        same = doc_idx[:-1] == doc_idx[1:]
        if same.any():
            sel = pa.array(same)
            left = flat.slice(0, len(flat) - 1).filter(sel)
            right = flat.slice(1).filter(sel)
            pair = pc.binary_join_element_wise(left, right, "\x1f")
            bc = pc.value_counts(pair)
            parts = pc.split_pattern(bc.field("values"), "\x1f")
            v_out.append(pc.list_element(parts, 0).cast(pa.string()))
            w_out.append(pc.list_element(parts, 1).cast(pa.string()))
            n_out.append(bc.field("counts").cast(pa.int64()))

    def _flat(arrs: list) -> pa.ChunkedArray:
        return pa.chunked_array(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrs]
        ).combine_chunks()

    return pa.table({"v": _flat(v_out), "w": _flat(w_out), "n": _flat(n_out)})


@dataclass
class PhraseLM:
    """Collected bigram language model (gate-scale; see module docstring
    for the broadcast/top-M shape at scale)."""

    uni: dict[str, int]
    bi: dict[tuple[str, str], int]
    total: int


def build_phrase_lm(ds, text_col: str = "text") -> PhraseLM:
    """Distributed bigram LM: one map_batches pass + one bounded-key
    partial_agg reduce."""
    parts = ds.map_batches(
        lambda b: bigram_partials(b, text_col), batch_format="pyarrow"
    )
    merged = partial_agg(parts, ["v", "w"], [AggSpec("n", "n", "sum")])
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for v, w, n in zip(
            b["v"].to_pylist(), b["w"].to_pylist(), b["n"].to_pylist()
        ):
            if w == "":
                uni[v] = uni.get(v, 0) + int(n)
            else:
                bi[(v, w)] = bi.get((v, w), 0) + int(n)
    return PhraseLM(uni=uni, bi=bi, total=sum(uni.values()))


def token_candidates(
    lm: PhraseLM, token: str, max_edits: int = 1, per_token: int = 5
) -> list[str]:
    """Vocabulary terms within ``max_edits`` plain-Levenshtein edits,
    ranked (distance asc, count desc, term asc), top ``per_token`` —
    the ES ``direct_generator`` contract."""
    vocab = sorted(lm.uni)
    arr = pa.array(vocab, pa.string())
    d = levenshtein_batch(token, arr)
    cands = [
        (int(d[i]), -lm.uni[t], t) for i, t in enumerate(vocab) if d[i] <= max_edits
    ]
    cands.sort()
    return [t for _, _, t in cands[:per_token]]


def suggest_phrases(
    lm: PhraseLM,
    text: str,
    size: int = 5,
    max_edits: int = 1,
    per_token: int = 5,
) -> pa.Table:
    """Top-``size`` corrected phrases: exact stupid-backoff scoring of
    the per-token candidate product space → (rank, suggestion, score_r)."""
    tokens = tokenize_text(text)
    if not tokens:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "suggestion": pa.array([], pa.string()),
                "score_r": pa.array([], pa.float64()),
            }
        )
    cand_lists = [
        token_candidates(lm, t, max_edits=max_edits, per_token=per_token)
        for t in tokens
    ]
    if any(not c for c in cand_lists):
        # a token with an empty edit-neighborhood keeps itself unscored
        # out of the product space — ES drops the slot's corrections too
        cand_lists = [c if c else [t] for c, t in zip(cand_lists, tokens)]
    n = float(lm.total)
    phrases: list[tuple[str, float]] = []

    def walk(i: int, prev: str | None, acc: float, words: list[str]) -> None:
        if i == len(cand_lists):
            phrases.append((" ".join(words), acc))
            return
        for w in cand_lists[i]:
            c_w = lm.uni.get(w, 0)
            if c_w == 0:
                continue
            if prev is None:
                lp = math.log(c_w / n)
            else:
                cb = lm.bi.get((prev, w), 0)
                if cb > 0:
                    lp = math.log(cb / lm.uni[prev])
                else:
                    lp = math.log(BACKOFF * c_w / n)
            walk(i + 1, w, acc + lp, words + [w])

    walk(0, None, 0.0, [])
    ranked = sorted(phrases, key=lambda p: (-round(p[1], 9), p[0]))[:size]
    return pa.table(
        {
            "rank": pa.array(range(1, len(ranked) + 1), pa.int64()),
            "suggestion": pa.array([p[0] for p in ranked], pa.string()),
            "score_r": pa.array([round(p[1], 6) for p in ranked], pa.float64()),
        }
    )
