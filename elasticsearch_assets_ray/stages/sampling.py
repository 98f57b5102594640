"""Deterministic sampling / split assignment for training-data pipelines.

The operations a 100-TB corpus pipeline needs around dedup/quality:
assign every document to train/val/test once and forever (stable across
runs, machines and repartitions), draw reproducible Bernoulli samples,
and sample per-stratum at different rates (e.g. downsample English,
keep all low-resource languages).

All of it is ONE stateless ``map_batches`` pass — no shuffle, no
driver-side state, nothing materialized: the assignment of a row
depends only on its id and the salt.  The hash is the repo's uint64
Horner polynomial (:func:`..stages.textstats.polynomial_hash`) over
``f"{id}:{salt}"``, so the DuckDB oracle replicates it exactly
(pipelines/oracles_hard.py machinery); u = h / 2^64 is the uniform
variate, and thresholds are exact integer cutoffs ``floor(p · 2^64)``
— no float comparisons on the hot path.

Beyond-the-reference operator (the reference delegates storage-side
sampling to Elasticsearch; SURVEY.md §2 training-data additions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from elasticsearch_assets_ray.stages.textstats import polynomial_hash

_TWO64 = 1 << 64


def _threshold(p: float) -> np.uint64:
    """Exact integer cutoff: h < floor(p·2^64) ⇔ u < p (clamped)."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"fraction {p!r} outside [0, 1]")
    return np.uint64(min(int(p * _TWO64), _TWO64 - 1))


def splitmix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Steele et al. / Vigna) —
    avalanches the weak polynomial hash so close inputs (sequential ids,
    salts differing in one byte) land on independent uniform variates."""
    z = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def id_hash(col: pa.Array | pa.ChunkedArray, salt: str) -> np.ndarray:
    """uint64 hash of ``f"{value}:{salt}"`` per row: Horner polynomial
    (SQL-replicable) + splitmix64 finalize (also SQL-replicable — see
    oracles_hard.sm64_sql)."""
    s = pc.cast(col, pa.string())
    joined = pc.binary_join_element_wise(s, pa.scalar(salt), pa.scalar(":"))
    return splitmix64(polynomial_hash(joined))


def _cum_thresholds(ratios: dict[str, float]) -> tuple[list[str], np.ndarray]:
    if not ratios:
        raise ValueError("ratios must be non-empty")
    labels = list(ratios)
    fracs = np.array([ratios[k] for k in labels], dtype=np.float64)
    if (fracs < 0).any():
        raise ValueError("ratios must be non-negative")
    if abs(fracs.sum() - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1 (got {fracs.sum()!r})")
    cum = np.minimum(np.floor(np.cumsum(fracs) * _TWO64), _TWO64 - 1)
    cum[-1] = _TWO64 - 1  # the last split absorbs rounding
    return labels, cum.astype(np.uint64)


def split_batch(
    batch: pa.Table,
    ratios: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> pa.Table:
    """Append a deterministic split label drawn from ``ratios`` (label →
    fraction, summing to 1).  Stable under repartitioning: the label is
    a pure function of (id, salt)."""
    labels, cum = _cum_thresholds(ratios)
    h = id_hash(batch[id_col], salt)
    idx = np.searchsorted(cum, h, side="left")
    lab = pa.DictionaryArray.from_arrays(
        pa.array(idx.astype(np.int32)), pa.array(labels, pa.string())
    ).cast(pa.string())
    cols = {n: batch[n] for n in batch.column_names}
    cols[out_col] = lab
    return pa.table(cols)


def assign_splits(
    ds,
    ratios: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
):
    """Dataset → Dataset with a ``split`` column (streaming, no shuffle)."""
    _cum_thresholds(ratios)  # validate before launching tasks
    return ds.map_batches(
        split_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(
            ratios=ratios, id_col=id_col, salt=salt, out_col=out_col
        ),
    )


def bernoulli_batch(
    batch: pa.Table,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> pa.Table:
    """Keep each row iff hash(id:salt) < fraction·2^64 — a reproducible
    Bernoulli(fraction) sample independent of partitioning."""
    h = id_hash(batch[id_col], salt)
    return batch.filter(pa.array(h < _threshold(fraction)))


def bernoulli_sample(ds, fraction: float, id_col: str = "doc_id", salt: str = "sample"):
    _threshold(fraction)  # validate
    return ds.map_batches(
        bernoulli_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(fraction=fraction, id_col=id_col, salt=salt),
    )


def stratified_batch(
    batch: pa.Table,
    fractions: dict[str, float],
    key_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> pa.Table:
    """Per-stratum Bernoulli: row kept iff hash(id:salt) <
    fraction[key]·2^64; keys absent from ``fractions`` use
    ``default_fraction``.  One ``index_in`` + one compare — no
    per-stratum passes, no shuffle."""
    keys = sorted(fractions)
    thr = np.array(
        [_threshold(fractions[k]) for k in keys] + [_threshold(default_fraction)],
        dtype=np.uint64,
    )
    codes = pc.index_in(
        pc.cast(batch[key_col], pa.string()), pa.array(keys, pa.string())
    )
    codes = pc.fill_null(codes, len(keys)).to_numpy(zero_copy_only=False)
    h = id_hash(batch[id_col], salt)
    return batch.filter(pa.array(h < thr[codes]))


def stratified_sample(
    ds,
    fractions: dict[str, float],
    key_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
):
    for p in list(fractions.values()) + [default_fraction]:
        _threshold(p)  # validate
    return ds.map_batches(
        stratified_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(
            fractions=fractions,
            key_col=key_col,
            id_col=id_col,
            salt=salt,
            default_fraction=default_fraction,
        ),
    )


def mixture_batch(
    batch: pa.Table,
    epochs: dict[str, float],
    key_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
    default_epochs: float = 1.0,
) -> pa.Table:
    """Domain-mixture upsampling: each row repeats ``epochs[key]`` times
    — ``floor(e)`` whole copies plus one more iff hash(id:salt) <
    frac(e)·2^64 (the same exact-integer Bernoulli convention as
    :func:`bernoulli_batch`, so the expected per-domain epoch count is
    exactly ``e`` and the decision is a pure function of (id, salt) —
    partitioning-invariant, reproducible, no shuffle).  An ``epoch``
    column (0-based copy index) distinguishes repeats so downstream
    shuffling/packing can keep copies apart."""
    keys = sorted(epochs)
    evals = np.array(
        [float(epochs[k]) for k in keys] + [float(default_epochs)], dtype=np.float64
    )
    if (evals < 0).any():
        raise ValueError("epochs must be >= 0")
    base = np.floor(evals).astype(np.int64)
    fracs = evals - base
    thr = np.array([_threshold(float(f)) for f in fracs], dtype=np.uint64)
    codes = pc.index_in(
        pc.cast(batch[key_col], pa.string()), pa.array(keys, pa.string())
    )
    codes = pc.fill_null(codes, len(keys)).to_numpy(zero_copy_only=False)
    h = id_hash(batch[id_col], salt)
    reps = base[codes] + (h < thr[codes]).astype(np.int64)
    idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), reps)
    out = batch.take(pa.array(idx))
    starts = np.concatenate(([0], np.cumsum(reps)))[:-1]
    epoch = np.arange(idx.size, dtype=np.int64) - starts[idx]
    return out.append_column("epoch", pa.array(epoch))


def mixture_sample(
    ds,
    epochs: dict[str, float],
    key_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
    default_epochs: float = 1.0,
):
    """Dataset-level mixture upsampling (training-data domain mixing:
    epochs > 1 upsample a domain, < 1 downsample, 0 drops it)."""
    for e in list(epochs.values()) + [default_epochs]:
        if e < 0:
            raise ValueError("epochs must be >= 0")
        _threshold(float(e) - np.floor(float(e)))  # validate fractional part
    return ds.map_batches(
        mixture_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(
            epochs=epochs,
            key_col=key_col,
            id_col=id_col,
            salt=salt,
            default_epochs=default_epochs,
        ),
    )
