"""Deterministic sampling / split assignment (stages/sampling.py):
stable pure-function-of-(id, salt) assignment, partitioning-invariant,
exact integer thresholds."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.stages.sampling import (
    _threshold,
    assign_splits,
    bernoulli_batch,
    bernoulli_sample,
    id_hash,
    split_batch,
    stratified_batch,
    stratified_sample,
)


def _tbl(n=5000):
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(
                rng.choice(["de", "en", "fr", "es", "zh"], n).tolist()
            ),
        }
    )


def test_split_deterministic_and_partition_invariant():
    t = _tbl()
    a = split_batch(t, {"train": 0.8, "val": 0.1, "test": 0.1})
    b = split_batch(t, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert a.equals(b)
    # splitting the batch in halves gives the same per-row labels
    h1 = split_batch(t.slice(0, 2500), {"train": 0.8, "val": 0.1, "test": 0.1})
    h2 = split_batch(t.slice(2500), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert pa.concat_tables([h1, h2]).equals(a)
    # every row labeled; proportions near the ratios
    labs = a["split"].to_pylist()
    frac = {k: labs.count(k) / len(labs) for k in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02


def test_split_salt_changes_assignment():
    t = _tbl(2000)
    a = split_batch(t, {"a": 0.5, "b": 0.5}, salt="s1")["split"].to_pylist()
    b = split_batch(t, {"a": 0.5, "b": 0.5}, salt="s2")["split"].to_pylist()
    assert a != b
    agree = sum(x == y for x, y in zip(a, b)) / len(a)
    assert 0.3 < agree < 0.7  # independent hashes


def test_split_validation():
    t = _tbl(10)
    with pytest.raises(ValueError, match="sum to 1"):
        split_batch(t, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="non-negative"):
        split_batch(t, {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        split_batch(t, {})
    with pytest.raises(ValueError, match="outside"):
        bernoulli_batch(t, 1.5)


def test_bernoulli_exact_threshold():
    t = _tbl(4000)
    kept = bernoulli_batch(t, 0.3, salt="x")
    h = id_hash(t["doc_id"], "x")
    want = t.filter(pa.array(h < _threshold(0.3)))
    assert kept.equals(want)
    assert abs(kept.num_rows / t.num_rows - 0.3) < 0.03
    # p=0 keeps nothing, p=1 keeps everything
    assert bernoulli_batch(t, 0.0).num_rows == 0
    assert bernoulli_batch(t, 1.0).num_rows == t.num_rows


def test_stratified_rates_and_default():
    t = _tbl(10000)
    fr = {"de": 0.5, "en": 0.1, "es": 1.0}
    kept = stratified_batch(t, fr, key_col="lang", default_fraction=0.0)
    langs = kept["lang"].to_pylist()
    n_by = {k: t.filter(pa.compute.equal(t["lang"], k)).num_rows for k in fr}
    for k, p in fr.items():
        got = langs.count(k) / n_by[k]
        assert abs(got - p) < 0.06, (k, got)
    # default 0.0 → zh/fr absent entirely
    assert "zh" not in langs and "fr" not in langs
    # es kept exactly (p=1 threshold is 2^64-1; a hash could equal the
    # max — allow off-by-the-measure-zero)
    assert langs.count("es") >= n_by["es"] - 1


def test_dataset_wrappers(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_tbl(1000)).repartition(7)
    out = assign_splits(ds, {"train": 0.9, "test": 0.1})
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    ref = split_batch(_tbl(1000), {"train": 0.9, "test": 0.1})
    assert dict(zip(t["doc_id"].to_pylist(), t["split"].to_pylist())) == dict(
        zip(ref["doc_id"].to_pylist(), ref["split"].to_pylist())
    )
    samp = bernoulli_sample(ds, 0.25, salt="q")
    n = sum(b.num_rows for b in samp.iter_batches(batch_format="pyarrow"))
    ref_n = bernoulli_batch(_tbl(1000), 0.25, salt="q").num_rows
    assert n == ref_n
    strat = stratified_sample(
        ds, {"de": 1.0}, key_col="lang", default_fraction=0.0
    )
    st = pa.concat_tables(list(strat.iter_batches(batch_format="pyarrow")))
    assert set(st["lang"].to_pylist()) <= {"de"}


def test_mixture_sample_semantics(ray_session):
    """Domain mixing: floor(e) whole copies + fractional Bernoulli,
    partitioning-invariant, epoch indices 0..reps-1."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.sampling import (
        _threshold,
        id_hash,
        mixture_sample,
    )

    n = 4000
    langs = np.array(["en", "fr", "de", "zh"])[np.arange(n) % 4]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs.astype(str)),
        }
    )
    epochs = {"en": 2.5, "fr": 0.5, "de": 0.0}
    out1 = mixture_sample(
        ray.data.from_arrow(t).repartition(7), epochs, key_col="lang", id_col="doc_id"
    )
    r1 = pa.concat_tables(list(out1.iter_batches(batch_format="pyarrow")))
    r1 = r1.sort_by([("doc_id", "ascending"), ("epoch", "ascending")])
    # partitioning invariance
    out2 = mixture_sample(
        ray.data.from_arrow(t).repartition(2), epochs, key_col="lang", id_col="doc_id"
    )
    r2 = pa.concat_tables(list(out2.iter_batches(batch_format="pyarrow")))
    r2 = r2.sort_by([("doc_id", "ascending"), ("epoch", "ascending")])
    assert r1.to_pylist() == r2.to_pylist()
    # brute force per-row reps
    h = id_hash(t["doc_id"], "mix")
    import collections

    reps = collections.Counter(r1["doc_id"].to_pylist())
    for d, lang, hv in zip(t["doc_id"].to_pylist(), langs, h):
        e = epochs.get(lang, 1.0)
        want = int(e) + (1 if hv < _threshold(e - int(e)) else 0)
        assert reps.get(d, 0) == want, (d, lang, want)
    # de dropped entirely; zh (default 1.0) exactly once
    assert all(lang != "de" for lang in r1["lang"].to_pylist())
    assert sum(1 for l in r1["lang"].to_pylist() if l == "zh") == n // 4
    # en averages ~2.5 epochs
    en_n = sum(1 for l in r1["lang"].to_pylist() if l == "en")
    assert abs(en_n / (n // 4) - 2.5) < 0.1
    # epoch indices are 0..reps-1 per doc
    by_doc = collections.defaultdict(list)
    for d, e in zip(r1["doc_id"].to_pylist(), r1["epoch"].to_pylist()):
        by_doc[d].append(e)
    for d, es in by_doc.items():
        assert es == list(range(len(es)))
