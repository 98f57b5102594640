"""Safety/scrubbing operators for training-data pipelines: PII
detection + redaction, and benchmark decontamination (n-gram overlap
against a held-out evaluation set) — the two standard filters an LLM
corpus pass applies before training (GPT-3 appendix-C style
decontamination; public data-curation practice).

All stages are vectorized ``map_batches`` kernels:

- :func:`pii_stats` / :func:`redact_pii` — RE2 patterns through
  pyarrow.compute string kernels (count_substring_regex /
  replace_substring_regex).  DuckDB's regexp functions are RE2 too, so a
  SQL oracle sees identical match semantics.
- :func:`contamination_stats` — per-doc count of k-token shingles that
  appear in a BROADCAST benchmark shingle set (``ray.put`` once, sorted
  uint64 membership via searchsorted per batch).  The benchmark side is
  tiny (an eval set); the corpus side streams — no shuffle at all, the
  100 TB shape is exactly this broadcast join.

The reference has no scrubbing surface (SURVEY.md §2.6); these are new
first-class operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible patterns (pyarrow and DuckDB both run RE2, so one
# pattern string serves engine and oracle).  Deliberately conservative:
# high-precision shapes, not exhaustive PII taxonomies.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row non-overlapping match counts for each PII pattern
    (columns ``n_email`` / ``n_ipv4`` / ``n_ssn``)."""
    out = {name: batch[name] for name in batch.column_names}
    s = batch[text_col]
    for kind, pat in PII_PATTERNS.items():
        out[f"n_{kind}"] = pc.cast(
            pc.count_substring_regex(s, pat), pa.int64()
        )
    return pa.table(out)


def redact_pii(
    batch: pa.Table, text_col: str = "text", replacement: str = "[PII]"
) -> pa.Table:
    """Replace every PII match with ``replacement`` (patterns applied in
    the fixed ``PII_PATTERNS`` order so the output is deterministic)."""
    out = {name: batch[name] for name in batch.column_names}
    s = batch[text_col]
    for pat in PII_PATTERNS.values():
        s = pc.replace_substring_regex(s, pat, replacement)
    out[text_col] = s
    return pa.table(out)


def benchmark_shingles(texts: pa.Array | list[str], k: int = 13) -> np.ndarray:
    """Sorted-unique k-token shingle hashes of a (small) benchmark /
    eval corpus — the broadcast side of decontamination."""
    from elasticsearch_assets_ray.stages.dedup import (
        _shingle_hashes,
        _token_lists,
    )

    arr = (
        texts
        if isinstance(texts, (pa.Array, pa.ChunkedArray))
        else pa.array(texts, type=pa.string())
    )
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    th, off = _token_lists(arr)
    flat, _soff = _shingle_hashes(th, off, k)
    return np.unique(flat)


class ContaminationStage:
    """Actor-pool stage: per-doc overlap with a broadcast benchmark
    shingle set.  ``bench_ref`` is a ``ray.ObjectRef`` to the sorted
    uint64 hash array (``ray.put`` ONCE on the driver; every actor
    resolves it zero-copy from the object store in ``__init__`` — never
    re-shipped per batch).  Emits ``n_contam_shingles`` (distinct
    contaminated shingles) and ``contam_frac`` (fraction of the doc's
    distinct shingles found in the benchmark)."""

    suggested_batch_size = 1024

    def __init__(self, bench_ref, text_col: str = "text", k: int = 13):
        import ray

        self.bench = (
            ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        )
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from elasticsearch_assets_ray.stages.dedup import (
            _shingle_hashes,
            _token_lists,
        )

        th, off = _token_lists(batch[self.text_col])
        flat, soff = _shingle_hashes(th, off, self.k)
        # membership of every shingle in the sorted benchmark array
        j = np.searchsorted(self.bench, flat)
        hit = (j < self.bench.size) & (
            self.bench[np.minimum(j, max(self.bench.size - 1, 0))] == flat
        ) if self.bench.size else np.zeros(flat.size, dtype=bool)
        doc_of = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), np.diff(soff)
        )
        n_hit = np.bincount(doc_of[hit], minlength=batch.num_rows).astype(np.int64)
        n_all = np.diff(soff).astype(np.int64)
        out = {name: batch[name] for name in batch.column_names}
        out["n_contam_shingles"] = pa.array(n_hit)
        out["contam_frac"] = pa.array(
            np.where(n_all > 0, n_hit / np.maximum(n_all, 1), 0.0)
        )
        return pa.table(out)


def contamination_stats(
    ds,
    benchmark_texts: list[str] | pa.Array,
    text_col: str = "text",
    k: int = 13,
    concurrency: int | tuple[int, int] = (1, 8),
):
    """Dataset-level decontamination scan: hash the benchmark once,
    broadcast it, and stream the corpus through :class:`ContaminationStage`.
    Filter on ``n_contam_shingles == 0`` (strict) or ``contam_frac``
    (graded) downstream."""
    import ray

    bench = benchmark_shingles(benchmark_texts, k)
    bench_ref = ray.put(bench)
    return ds.map_batches(
        ContaminationStage,
        fn_constructor_kwargs=dict(bench_ref=bench_ref, text_col=text_col, k=k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
