"""ES span queries: ``span_term`` / ``span_near`` / ``span_first`` /
``span_not`` over the positional postings.

ES exposes span queries as a structured DSL (they have no query_string
syntax), so this module takes a small dict spec mirroring the ES JSON:

    {"span_term": "scan"}
    {"span_near": {"clauses": [<spec>...], "slop": 0, "in_order": True}}
    {"span_first": {"match": <spec>, "end": 5}}
    {"span_not": {"include": <spec>, "exclude": <spec>,
                  "pre": 0, "post": 0}}
    {"span_within": {"little": <spec>, "big": <spec>}}
    {"span_containing": {"big": <spec>, "little": <spec>}}

Pinned contract (documented divergences match the repo's phrase
precedent — positional constraints FILTER exactly, scoring stays
bag-of-words BM25 over the positive terms):

- a *span* is a half-open token-position interval [start, end);
  a term span is [p, p+1).
- ``span_near`` (in_order=True): clauses left→right, each next span
  starting at or after the previous span's end, greedily taking the
  SMALLEST such start; match iff the total gap Σ(startᵢ − endᵢ₋₁) ≤
  slop.  The greedy minimal chain is an exact existence test for this
  ordered non-overlapping contract (same argument as the sloppy-phrase
  kernel, engine.py freq_batch).
- ``span_first``: match spans whose end ≤ ``end`` (ES's boundary rule).
- ``span_not``: include spans surviving iff NO exclude span overlaps
  the window [start − pre, end + post) (ES pre/post extension).
- ``span_within``: LITTLE spans enclosed by ≥ 1 big span
  (big.start ≤ little.start ∧ little.end ≤ big.end, same doc);
  ``span_containing`` is the mirror — BIG spans enclosing ≥ 1 little
  span.  Containment tests against the spans the evaluator PRODUCES
  (one minimal-end span per start — the minimal-interval convention;
  documented divergence: Lucene's SpanOr/SpanNear can also emit wider
  same-start spans).

Everything is vectorized: per-term position keys are sorted
``cidx << 32 | position`` int64 arrays over the sorted candidate docs
(the same layout as the phrase kernel), span set algebra is
searchsorted passes, and the span_not overlap test is one segmented
prefix-max (doc ids ride the high bits, so a plain cumulative max never
leaks across docs).

Scale shape: candidates come from the conjunctive BM25 search over the
positive terms (span queries are conjunctions, hence selective); the
verification decodes only those terms' postings.  At 100 TB serving
runs per-shard inside the ShardedSearcher actors like every other
positional query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_POS_MASK = (1 << 32) - 1


def positive_terms(spec: dict) -> list[str]:
    """Terms every match must contain (exclude sides omitted), in
    first-appearance order."""
    out: list[str] = []

    def walk(s: dict) -> None:
        if "span_term" in s:
            t = s["span_term"]
            if t not in out:
                out.append(t)
        elif "span_near" in s:
            for c in s["span_near"]["clauses"]:
                walk(c)
        elif "span_first" in s:
            walk(s["span_first"]["match"])
        elif "span_not" in s:
            walk(s["span_not"]["include"])
        elif "span_within" in s:
            # a contained little span implies BOTH sides match the doc
            walk(s["span_within"]["little"])
            walk(s["span_within"]["big"])
        elif "span_containing" in s:
            walk(s["span_containing"]["big"])
            walk(s["span_containing"]["little"])
        elif "span_or" in s:
            # no single term is guaranteed by a disjunction — an OR
            # contributes nothing to the conjunctive candidate set
            pass
        else:
            raise ValueError(f"unknown span spec: {sorted(s)}")

    walk(spec)
    return out


def all_terms(spec: dict) -> list[str]:
    """Every term the evaluator needs positions for (include + exclude +
    every OR branch), in first-appearance order."""
    out: list[str] = []

    def walk(s: dict) -> None:
        if "span_term" in s:
            if s["span_term"] not in out:
                out.append(s["span_term"])
        elif "span_near" in s:
            for c in s["span_near"]["clauses"]:
                walk(c)
        elif "span_first" in s:
            walk(s["span_first"]["match"])
        elif "span_not" in s:
            walk(s["span_not"]["include"])
            walk(s["span_not"]["exclude"])
        elif "span_within" in s:
            walk(s["span_within"]["little"])
            walk(s["span_within"]["big"])
        elif "span_containing" in s:
            walk(s["span_containing"]["big"])
            walk(s["span_containing"]["little"])
        elif "span_or" in s:
            for c in s["span_or"]["clauses"]:
                walk(c)
        else:
            raise ValueError(f"unknown span spec: {sorted(s)}")

    walk(spec)
    return out


def position_keys(searcher, terms: list[str], cs: np.ndarray) -> dict[str, np.ndarray]:
    """Sorted ``cidx << 32 | position`` occurrence keys per term over the
    SORTED candidate docs ``cs`` — the standalone twin of the phrase
    kernel's ``term_keys`` (engine.py:_phrase_pos_ctx), reading the same
    segment rows / posting blobs / positions codec."""
    if not searcher.manifest.get("index_positions"):
        raise RuntimeError("span queries need positional postings (index_positions=True)")
    seg = searcher._segment_rows(sorted(set(terms)))
    out: dict[str, list[np.ndarray]] = {t: [] for t in terms}
    if seg is None or cs.size == 0:
        return {t: np.empty(0, dtype=np.int64) for t in terms}
    pos_codec = searcher.manifest.get("positions_codec")
    seg_terms = seg["term"].to_pylist()
    for i, t in enumerate(seg_terms):
        lo = int(seg["min_docid"][i].as_py())
        hi = int(seg["max_docid"][i].as_py())
        a = int(np.searchsorted(cs, lo))
        b = int(np.searchsorted(cs, hi, side="right"))
        if a == b:
            continue
        d, tf = searcher._decode_postings(
            seg["blob"][i].as_py(), int(seg["df"][i].as_py())
        )
        raw = seg["pos"][i].as_py()
        if pos_codec == "varint-delta":
            from elasticsearch_assets_ray.index.codec import decode_positions

            pos = decode_positions(raw, tf)
        else:
            pos = np.frombuffer(raw, dtype=np.int32)
        off = np.concatenate(([0], np.cumsum(tf))).astype(np.int64)
        j = np.searchsorted(d, cs[a:b])
        ok = (j < d.size) & (d[np.minimum(j, d.size - 1)] == cs[a:b])
        if not ok.any():
            continue
        jj = j[ok]
        cidx = (a + np.flatnonzero(ok)).astype(np.int64)
        starts = off[jj]
        lens = off[jj + 1] - starts
        tot = int(lens.sum())
        if tot == 0:
            continue
        cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        flat = np.repeat(starts - cum, lens) + np.arange(tot)
        out[t].append((np.repeat(cidx, lens) << 32) | pos[flat].astype(np.int64))
    res: dict[str, np.ndarray] = {}
    for t in terms:
        parts = out.get(t, [])
        if not parts:
            res[t] = np.empty(0, dtype=np.int64)
        else:
            k = parts[0] if len(parts) == 1 else np.concatenate(parts)
            k.sort()
            res[t] = k
    return res


def eval_spans(
    spec: dict, keys: dict[str, np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate a span spec → (skey, epos): sorted start keys
    (cidx << 32 | start) and the matching ABSOLUTE end positions
    (exclusive) per span."""
    if "span_term" in spec:
        sk = keys[spec["span_term"]]
        return sk, (sk & _POS_MASK) + 1
    if "span_first" in spec:
        s = spec["span_first"]
        sk, ep = eval_spans(s["match"], keys)
        m = ep <= int(s["end"])
        return sk[m], ep[m]
    if "span_near" in spec:
        s = spec["span_near"]
        clauses = s["clauses"]
        slop = int(s.get("slop", 0))
        if not s.get("in_order", True):
            raise ValueError(
                "span_near(in_order=False) is served by the unordered "
                'proximity query `"a b"~uN` (engine freq_batch); the span '
                "evaluator implements the ordered contract"
            )
        sk, ep = eval_spans(clauses[0], keys)
        start0 = sk
        for c in clauses[1:]:
            if start0.size == 0:
                break
            ck, ce = _min_end_per_start(*eval_spans(c, keys))
            if ck.size == 0:
                start0 = start0[:0]
                ep = ep[:0]
                break
            # greedy: smallest clause span starting at/after prev end
            tgt = (start0 & ~np.int64(_POS_MASK)) | ep
            j = np.searchsorted(ck, tgt)
            ok = j < ck.size
            jn = np.minimum(j, ck.size - 1)
            ok &= (ck[jn] >> 32) == (start0 >> 32)
            start0, ep = start0[ok], ce[jn[ok]]
        if start0.size:
            # total gap = (last end - first start) - sum of clause widths;
            # with term clauses (width 1) == matchLength - m
            width = ep - (start0 & _POS_MASK)
            mwidth = _min_width(spec)
            m = (width - mwidth) <= slop
            start0, ep = start0[m], ep[m]
        return start0, ep
    if "span_or" in spec:
        # Lucene SpanOrQuery / intervals any_of: the UNION of the
        # clauses' span sets, normalized to the minimal end per start
        # (the minimal-interval convention — a wider same-start span can
        # never be needed by an enclosing near/first/not)
        parts = [eval_spans(c, keys) for c in spec["span_or"]["clauses"]]
        parts = [(sk, ep) for sk, ep in parts if sk.size]
        if not parts:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy()
        sk = np.concatenate([p[0] for p in parts])
        ep = np.concatenate([p[1] for p in parts])
        return _min_end_per_start(sk, ep)
    if "span_within" in spec:
        # little spans with ≥ 1 enclosing big span: prefix-max of big
        # ends in (doc, start) order — among big spans starting at or
        # before the little's start (searchsorted right), the max end in
        # the SAME doc decides containment.  Doc ids ride the high bits,
        # so any same-doc big span dominates every earlier doc's in the
        # running max, making the same-doc check on the max exact.
        s = spec["span_within"]
        lsk, lep = eval_spans(s["little"], keys)
        bsk, bep = eval_spans(s["big"], keys)
        if lsk.size == 0 or bsk.size == 0:
            return lsk[:0], lep[:0]
        aug = (bsk & ~np.int64(_POS_MASK)) | bep
        pmax = np.maximum.accumulate(aug)
        j = np.searchsorted(bsk, lsk, side="right")
        pj = pmax[np.maximum(j - 1, 0)]
        ok = (
            (j > 0)
            & ((pj >> 32) == (lsk >> 32))
            & ((pj & _POS_MASK) >= lep)
        )
        return lsk[ok], lep[ok]
    if "span_containing" in spec:
        # big spans enclosing ≥ 1 little span: suffix-MIN of little ends
        # in (doc, start) order — among little spans starting at or
        # after the big's start (searchsorted left), the min (doc|end)
        # belongs to the earliest doc in the suffix, so a same-doc hit
        # with end ≤ big.end is found exactly when one exists.
        s = spec["span_containing"]
        bsk, bep = eval_spans(s["big"], keys)
        lsk, lep = eval_spans(s["little"], keys)
        if lsk.size == 0 or bsk.size == 0:
            return bsk[:0], bep[:0]
        laug = (lsk & ~np.int64(_POS_MASK)) | lep
        sufmin = np.minimum.accumulate(laug[::-1])[::-1]
        j = np.searchsorted(lsk, bsk, side="left")
        pj = sufmin[np.minimum(j, lsk.size - 1)]
        ok = (
            (j < lsk.size)
            & ((pj >> 32) == (bsk >> 32))
            & ((pj & _POS_MASK) <= bep)
        )
        return bsk[ok], bep[ok]
    if "span_not" in spec:
        s = spec["span_not"]
        pre = int(s.get("pre", 0))
        post = int(s.get("post", 0))
        isk, iep = eval_spans(s["include"], keys)
        xsk, xep = eval_spans(s["exclude"], keys)
        if isk.size == 0 or xsk.size == 0:
            return isk, iep
        # prefix max of exclude ends in (doc, start) order; doc ids ride
        # the high bits so the cummax never crosses docs downward
        aug = (xsk & ~np.int64(_POS_MASK)) | xep
        pmax = np.maximum.accumulate(aug)
        # exclude spans with start < include.end + post
        lim = (isk & ~np.int64(_POS_MASK)) | np.minimum(
            iep + post, np.int64(_POS_MASK)
        )
        j = np.searchsorted(xsk, lim)  # count of exclude starts < lim
        has = j > 0
        pj = pmax[np.maximum(j - 1, 0)]
        same_doc = (pj >> 32) == (isk >> 32)
        istart = isk & _POS_MASK
        kill = has & same_doc & ((pj & _POS_MASK) > (istart - pre))
        return isk[~kill], iep[~kill]
    raise ValueError(f"unknown span spec: {sorted(spec)}")


def _min_end_per_start(ck: np.ndarray, ce: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Normalize a clause's span set to ONE span per start — the one
    with the smallest end.  Term spans are already unique per start;
    nested spans may not be, and the greedy chain must advance past the
    least end to stay an exact existence test for term-width clauses
    (conservative — never a false positive — for deeper nestings)."""
    if ck.size <= 1:
        return ck, ce
    o = np.lexsort((ce, ck))
    ck, ce = ck[o], ce[o]
    first = np.concatenate(([True], ck[1:] != ck[:-1]))
    return ck[first], ce[first]


def _min_width(spec: dict) -> int:
    """Sum of clause minimal widths (term = 1) for the near gap rule."""
    if "span_term" in spec:
        return 1
    if "span_first" in spec:
        return _min_width(spec["span_first"]["match"])
    if "span_near" in spec:
        return sum(_min_width(c) for c in spec["span_near"]["clauses"])
    if "span_not" in spec:
        return _min_width(spec["span_not"]["include"])
    if "span_within" in spec:
        return _min_width(spec["span_within"]["little"])
    if "span_containing" in spec:
        return _min_width(spec["span_containing"]["big"])
    if "span_or" in spec:
        return min(_min_width(c) for c in spec["span_or"]["clauses"])
    raise ValueError(f"unknown span spec: {sorted(spec)}")


def span_search(searcher, spec: dict, k: int = 10) -> pa.Table:
    """Top-k span search: BM25-score the conjunction of the positive
    terms through the normal serving path, keep candidates with ≥ 1
    surviving span, return (doc_id, score) like ``Searcher.search``.

    Exhaustive over the conjunctive candidates (selective by
    construction); the chunked best-first sweep of the phrase verifier
    is the drop-in upgrade if a span query is ever broad."""
    pos = positive_terms(spec)
    if not pos:
        raise ValueError(
            "span spec guarantees no term (pure disjunction) — serve it "
            "through intervals_search, whose candidates are the OR match set"
        )
    qstr = " ".join(f"+{t}" for t in pos)
    n, _rel = searcher.match_count(qstr)
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    res = searcher.search(qstr, k=n)
    ids = res["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    scores = res["score"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    cs = ids[order]
    keys = position_keys(searcher, all_terms(spec), cs)
    sk, _ = eval_spans(spec, keys)
    ok_cidx = np.unique(sk >> 32)
    mask = np.zeros(cs.size, dtype=bool)
    mask[ok_cidx] = True
    keep = np.zeros(ids.size, dtype=bool)
    keep[order] = mask
    ids, scores = ids[keep], scores[keep]
    if ids.size > k:
        sel = np.lexsort((ids, -scores))[:k]
        ids, scores = ids[sel], scores[sel]
    return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})
