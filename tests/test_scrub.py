"""PII detection/redaction and benchmark decontamination."""

import numpy as np
import pyarrow as pa
import ray.data

from elasticsearch_assets_ray.stages import scrub
from elasticsearch_assets_ray.stages.dedup import _shingle_hashes, _token_lists


def test_pii_stats_and_redact():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "mail a@b.co and c.d+x@e-f.org now",
                "server 10.1.2.3 and 255.255.255.0 ssn 123-45-6789",
                "clean text with no pii at all",
            ],
        }
    )
    s = scrub.pii_stats(t)
    assert s["n_email"].to_pylist() == [2, 0, 0]
    assert s["n_ipv4"].to_pylist() == [0, 2, 0]
    assert s["n_ssn"].to_pylist() == [0, 1, 0]
    r = scrub.redact_pii(t)
    assert r["text"].to_pylist() == [
        "mail [PII] and [PII] now",
        "server [PII] and [PII] ssn [PII]",
        "clean text with no pii at all",
    ]


def test_pii_word_boundaries():
    # version strings are NOT ipv4 (boundary guards), emails need a TLD
    t = pa.table({"text": ["v1.2.3.4beta no", "x@y nope", "a@b.io yes"]})
    s = scrub.pii_stats(t)
    assert s["n_ipv4"].to_pylist() == [0, 0, 0]
    assert s["n_email"].to_pylist() == [0, 0, 1]


def test_contamination_stage_matches_bruteforce(ray_session):
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
    texts += [texts[0], texts[1][: len(texts[1]) // 2]]  # exact + partial copies
    ids = list(range(len(texts)))
    bench_texts = texts[:5]
    k = 13
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    out = (
        pa.concat_tables(
            list(
                scrub.contamination_stats(
                    ray.data.from_arrow(tbl), bench_texts, k=k
                ).iter_batches(batch_format="pyarrow")
            )
        )
        .sort_by("doc_id")
    )
    # brute force: per-doc distinct k-shingles vs the benchmark set
    th, off = _token_lists(tbl["text"])
    flat, soff = _shingle_hashes(th, off, k)
    bench = set()
    for i in range(5):
        bench |= set(flat[soff[i] : soff[i + 1]].tolist())
    for i in ids:
        mine = flat[soff[i] : soff[i + 1]]
        n_hit = sum(1 for x in mine.tolist() if x in bench)
        assert out["n_contam_shingles"][i].as_py() == n_hit, i
        assert out["contam_frac"][i].as_py() == n_hit / mine.size, i
    # the exact copy of doc 0 is fully contaminated
    full_copy = ids[-2]
    assert out["contam_frac"][full_copy].as_py() == 1.0


def test_contamination_empty_benchmark(ray_session):
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["some words here"]})
    out = pa.concat_tables(
        list(
            scrub.contamination_stats(
                ray.data.from_arrow(tbl), [], k=3
            ).iter_batches(batch_format="pyarrow")
        )
    )
    assert out["n_contam_shingles"].to_pylist() == [0]
