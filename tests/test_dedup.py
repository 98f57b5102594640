"""Dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import numpy as np
import pyarrow as pa
import ray.data

from elasticsearch_assets_ray.stages import dedup


def _collect(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def _table_with_dups():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the winner today",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup of 0
        "the quick brown fox jumps over the lazy dog again and once",  # near dup of 0
        "completely different content about ray data pipelines and arrow",
        "pack my box with five dozen liquor jugs for the winner today",  # exact dup of 1
    ]
    return pa.table({"id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})


def test_exact_dedup_keeps_min_id():
    t = _table_with_dups()
    ds = ray.data.from_arrow(t)
    out = _collect(dedup.exact_dedup(ds, "text", "id"))
    assert sorted(out["id"].to_pylist()) == [0, 1, 3, 4]


def test_ngram_jaccard_bounds():
    assert dedup.ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert dedup.ngram_jaccard("a b c d e", "x y z w v") == 0.0
    mid = dedup.ngram_jaccard("a b c d e f g h", "a b c d e f g x")
    assert 0.0 < mid < 1.0


def test_minhash_lsh_finds_planted_pairs():
    t = _table_with_dups()
    ds = ray.data.from_arrow(t)
    pairs = dedup.minhash_lsh_dedup(
        ds, "text", "id", num_perm=64, bands=16, shingle_k=3, threshold=0.5
    )
    found = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 2) in found  # exact dup → jaccard 1.0
    assert (1, 5) in found
    sims = dict(zip(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()),
                    pairs["jaccard_sim"].to_pylist()))
    assert sims[(0, 2)] == 1.0
    # near dup 0↔3 shares most shingles
    assert (0, 3) in found and 0.5 <= sims[(0, 3)] < 1.0


def test_simhash_near_dups():
    t = _table_with_dups()
    ds = ray.data.from_arrow(t)
    pairs = dedup.simhash_near_dups(ds, "text", "id", max_hamming=3)
    found = dict(zip(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()),
                     pairs["hamming"].to_pylist()))
    assert found[(0, 2)] == 0  # identical text → identical simhash
    assert found[(1, 5)] == 0


def test_simhash_deterministic():
    t = _table_with_dups()
    a = dedup.simhash(t)["simhash"].to_pylist()
    b = dedup.simhash(t)["simhash"].to_pylist()
    assert a == b


def test_minhash_signature_similarity_tracks_jaccard():
    mh = dedup.MinHasher(num_perm=128, shingle_k=3)
    t = _table_with_dups()
    out = mh(t)
    sigs = np.array(out["minhash"].combine_chunks().flatten().to_pylist()).reshape(
        t.num_rows, 128
    )
    est = (sigs[0] == sigs[3]).mean()
    true = dedup.ngram_jaccard(t["text"][0].as_py(), t["text"][3].as_py(), 3)
    assert abs(est - true) < 0.25


def test_distinct_pairs_dataset_path(ray_session):
    """materialize=False returns a Dataset whose distributed distinct
    equals the driver-side path."""
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.dedup import minhash_lsh_dedup

    texts = ["alpha beta gamma delta epsilon zeta " * 5] * 2 + [
        f"unique doc {i} with words {i * 3} {i * 7} filler content here" for i in range(20)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(3)
    tbl = minhash_lsh_dedup(ds, "text", "doc_id", threshold=0.8)
    lazy = minhash_lsh_dedup(
        ray.data.from_arrow(t).repartition(3), "text", "doc_id", threshold=0.8,
        materialize=False,
    )
    got = pa.concat_tables(list(lazy.iter_batches(batch_format="pyarrow"))).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )
    assert got["id_a"].to_pylist() == tbl["id_a"].to_pylist()
    assert got["id_b"].to_pylist() == tbl["id_b"].to_pylist()
    assert got["jaccard_sim"].to_pylist() == tbl["jaccard_sim"].to_pylist()


def test_minhash_dup_heavy_buckets_vectorized(ray_session):
    """Dup-heavy corpus (many multi-row LSH buckets): the vectorized
    sorted-run verify must produce exactly the brute-force per-pair
    Jaccard result."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.dedup import (
        _shingle_hashes,
        _token_lists,
        jaccard,
        minhash_lsh_dedup,
    )

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    texts, ids = [], []
    docid = 0
    for c in range(12):  # 12 clusters of 8 near-identical docs
        base = [words[int(w)] for w in rng.integers(0, len(words), 30)]
        for v in range(8):
            t = list(base)
            if v:  # mutate one word per variant
                t[int(rng.integers(0, len(t)))] = words[int(rng.integers(0, len(words)))]
            texts.append(" ".join(t))
            ids.append(docid)
            docid += 1
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    got = minhash_lsh_dedup(
        ds, "text", "doc_id", num_perm=32, bands=16, shingle_k=3,
        threshold=0.5, n_rows_hint=len(ids),
    )
    # brute force over ALL pairs (small corpus): candidate recall is up to
    # LSH, but every emitted pair's similarity must be the exact Jaccard
    th, off = _token_lists(tbl["text"])
    flat, soff = _shingle_hashes(th, off, 3)
    sets = [flat[soff[i]:soff[i + 1]] for i in range(len(ids))]
    expect = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            s = jaccard(sets[i], sets[j])
            if s >= 0.5:
                expect[(i, j)] = s
    got_pairs = {
        (a, b): s
        for a, b, s in zip(
            got["id_a"].to_pylist(), got["id_b"].to_pylist(), got["jaccard_sim"].to_pylist()
        )
    }
    # dup-heavy: clusters guarantee many multi-row buckets and many pairs
    assert len(got_pairs) >= 12 * 21  # ≥ C(7,2) per cluster surviving
    for k, s in got_pairs.items():
        assert k in expect and abs(expect[k] - s) == 0.0, k


def test_neardup_components_transitive():
    """Min-label components: chains merge transitively, singletons keep
    themselves, canonical = component minimum."""
    import numpy as np
    import pyarrow as pa

    from elasticsearch_assets_ray.stages.dedup import neardup_components

    pairs = pa.table(
        {
            # chain 5-3, 3-9 (component min 3); separate pair 10-20
            "id_a": pa.array([5, 3, 10], pa.int64()),
            "id_b": pa.array([3, 9, 20], pa.int64()),
        }
    )
    out = neardup_components(pairs, np.array([3, 5, 9, 10, 20, 77], dtype=np.int64))
    got = dict(zip(out["doc_id"].to_pylist(), out["canonical_id"].to_pylist()))
    assert got == {3: 3, 5: 3, 9: 3, 10: 10, 20: 10, 77: 77}
    keep = dict(zip(out["doc_id"].to_pylist(), out["keep"].to_pylist()))
    assert [k for k, v in sorted(keep.items()) if v] == [3, 10, 77]
    # empty pair set: everyone is canonical
    empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    out2 = neardup_components(empty, np.array([1, 2], dtype=np.int64))
    assert out2["keep"].to_pylist() == [True, True]


def test_neardup_components_ds_matches_driver(ray_session):
    """Distributed min-label propagation must agree with the driver
    union-find on a graph with a long chain (multiple rounds) plus
    clusters and singletons."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.dedup import (
        neardup_components,
        neardup_components_ds,
    )

    rng = np.random.default_rng(5)
    # chain 0-1-2-...-6 (multi-round diameter), plus random pairs among 100..200
    a = list(range(6)) + rng.integers(100, 200, 40).tolist()
    b = list(range(1, 7)) + rng.integers(100, 200, 40).tolist()
    pairs = pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    uni = np.arange(0, 210, dtype=np.int64)
    want = neardup_components(pairs, uni)
    got_ds = neardup_components_ds(
        ray.data.from_arrow(pairs),
        universe=ray.data.from_arrow(pa.table({"doc_id": pa.array(uni)})),
        num_partitions=4,
    )
    got = pa.concat_tables(list(got_ds.iter_batches(batch_format="pyarrow")))
    got = got.sort_by([("doc_id", "ascending")])
    want = want.sort_by([("doc_id", "ascending")])
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["canonical_id"].to_pylist() == want["canonical_id"].to_pylist()
    assert got["keep"].to_pylist() == want["keep"].to_pylist()


def test_ngram_jaccard_pairs_exact_vs_bruteforce(ray_session):
    """Prefix-filtering self-join is COMPLETE and exact: result equals the
    all-pairs brute-force Jaccard at several thresholds, including empty
    and shorter-than-k docs."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 20)))) for _ in range(80)]
    for i in range(12):  # planted near-dups
        t = texts[i].split()
        texts.append(" ".join(t[: max(1, int(len(t) * 0.9))]))
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)

    th, off = dedup._token_lists(tbl["text"])
    flat, soff = dedup._shingle_hashes(th, off, 3)
    sets = [flat[soff[i] : soff[i + 1]] for i in ids]
    for tau in (0.3, 0.6, 0.9):
        got = dedup.ngram_jaccard_pairs(
            ds, "text", "doc_id", threshold=tau, n_rows_hint=len(ids)
        )
        gset = {
            (a, b): round(s, 12)
            for a, b, s in zip(
                got["id_a"].to_pylist(),
                got["id_b"].to_pylist(),
                got["jaccard_sim"].to_pylist(),
            )
        }
        exp = {}
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                j = dedup.jaccard(sets[x], sets[y])
                if j >= tau:
                    exp[(x, y)] = round(j, 12)
        assert gset == exp


def test_ngram_jaccard_pairs_streaming_path(ray_session):
    """materialize=False returns a Dataset with the same distinct pairs."""
    t = _table_with_dups()
    ds = ray.data.from_arrow(t.rename_columns(["doc_id", "text"]))
    mat = dedup.ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.5)
    stream = dedup.ngram_jaccard_pairs(
        ds, "text", "doc_id", threshold=0.5, materialize=False
    )
    st = _collect(stream).sort_by([("id_a", "ascending"), ("id_b", "ascending")])
    assert mat.equals(st)
    # exact dups (0,2) and (1,5) plus the near-dup (0,3)/(2,3) must be found
    pairs = set(zip(mat["id_a"].to_pylist(), mat["id_b"].to_pylist()))
    assert {(0, 2), (1, 5), (0, 3), (2, 3)} <= pairs


def test_duplicated_span_stats_brute_force(ray_session):
    """duplicated_span_stats matches a per-position brute-force count on a
    corpus with planted repeated 3-grams (across docs AND within a doc)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.dedup import duplicated_span_stats

    texts = [
        "alpha beta gamma delta",          # "alpha beta gamma" also in doc 1
        "zz alpha beta gamma yy",
        "rep rep rep rep",                 # "rep rep rep" twice WITHIN the doc
        "unique words only here",
        "xy",                              # shorter than k: no spans
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(texts)})
    ).repartition(3)
    out = pa.concat_tables(
        list(
            duplicated_span_stats(ds, k=3, n_rows_hint=5).iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    got = {
        d: (p, u)
        for d, p, u in zip(
            out["doc_id"].to_pylist(),
            out["dup_ngram_positions"].to_pylist(),
            out["distinct_dup_ngrams"].to_pylist(),
        )
    }
    # brute force over token windows
    from collections import Counter

    shingles = {
        i: [tuple(t.split()[j : j + 3]) for j in range(max(len(t.split()) - 2, 0))]
        for i, t in enumerate(texts)
    }
    corpus = Counter(s for lst in shingles.values() for s in lst)
    expect = {}
    for i, lst in shingles.items():
        dp = sum(1 for s in lst if corpus[s] >= 2)
        du = len({s for s in lst if corpus[s] >= 2})
        if dp:
            expect[i] = (dp, du)
    assert got == expect
    assert 2 in got and got[2] == (2, 1)  # within-doc repeat counts both positions
    assert 4 not in got and 3 not in got


def test_exact_substr_dedup_semantics():
    """Duplicated >= k-token substrings removed everywhere; unique text
    survives; within-doc repeats count too."""
    import ray.data

    from elasticsearch_assets_ray.stages.dedup import exact_substr_dedup

    shared = "one two three four"  # 4-token span duplicated across docs
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"alpha {shared} beta",
                f"gamma delta {shared}",
                "totally unique words here",
                # within-doc repeat: the span appears twice in ONE doc
                f"{shared} filler {shared}",
            ],
        }
    )
    out = (
        pa.concat_tables(
            list(
                exact_substr_dedup(
                    ray.data.from_arrow(t).repartition(2), k=4
                ).iter_batches(batch_format="pyarrow")
            )
        )
        .sort_by([("doc_id", "ascending")])
        .to_pydict()
    )
    assert out["clean_text"] == [
        "alpha beta",
        "gamma delta",
        "totally unique words here",
        "filler",
    ]
    assert out["n_tokens"] == [6, 6, 4, 9]
    assert out["n_removed"] == [4, 4, 0, 8]


def test_exact_substr_overlapping_spans_merge():
    """Overlapping duplicated windows cover their union, not 2k tokens."""
    import ray.data

    from elasticsearch_assets_ray.stages.dedup import exact_substr_dedup

    # docs share a 5-token run -> two overlapping 4-shingles; coverage is
    # exactly the 5 shared tokens in each doc
    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["x a b c d e y", "z a b c d e w"],
        }
    )
    out = (
        pa.concat_tables(
            list(
                exact_substr_dedup(
                    ray.data.from_arrow(t), k=4
                ).iter_batches(batch_format="pyarrow")
            )
        )
        .sort_by([("doc_id", "ascending")])
        .to_pydict()
    )
    assert out["clean_text"] == ["x y", "z w"]
    assert out["n_removed"] == [5, 5]


def test_line_dedup_delim_and_window_modes(ray_session):
    """RefinedWeb/C4 line dedup: boilerplate lines (>= min_docs distinct
    docs) removed, text rebuilt in order; both segmentation modes."""
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.linededup import line_dedup

    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "keep me\ncommon footer\nunique a",
                "common footer\nunique b",
                "common footer",
                "clean doc\n\nx",
            ],
        }
    )
    out = (
        pa.concat_tables(
            list(
                line_dedup(
                    ray.data.from_arrow(docs), min_docs=3, delim="\n"
                ).iter_batches(batch_format="pyarrow")
            )
        )
        .sort_by("doc_id")
    )
    assert out["clean_text"].to_pylist() == [
        "keep me\nunique a",
        "unique b",
        "",
        "clean doc\n\nx",
    ]
    assert out["n_lines"].to_pylist() == [3, 2, 1, 3]
    assert out["n_removed"].to_pylist() == [1, 1, 1, 0]
    # fixed-token-window mode: "a b c" shared by all three docs
    docs2 = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e f g", "a b c x y z", "a b c q"],
        }
    )
    out2 = (
        pa.concat_tables(
            list(
                line_dedup(
                    ray.data.from_arrow(docs2), min_docs=3, seg_tokens=3
                ).iter_batches(batch_format="pyarrow")
            )
        )
        .sort_by("doc_id")
    )
    assert out2["clean_text"].to_pylist() == ["d e f g", "x y z", "q"]
    assert out2["n_lines"].to_pylist() == [3, 2, 2]
    # a doc repeating the same segment internally counts ONCE toward
    # the distinct-doc threshold
    docs3 = pa.table(
        {"doc_id": [1, 2], "text": ["p q\np q\nz", "only here"]}
    )
    out3 = (
        pa.concat_tables(
            list(
                line_dedup(
                    ray.data.from_arrow(docs3), min_docs=2, delim="\n"
                ).iter_batches(batch_format="pyarrow")
            )
        )
        .sort_by("doc_id")
    )
    assert out3["n_removed"].to_pylist() == [0, 0]


def test_line_dedup_registry_oracle_parity(ray_session, sf_dir):
    """q_line_dedup vs its DuckDB twin at sf0.001."""
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    got = R.QUERIES["line_dedup"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.sql(R.ORACLES["line_dedup"]).df()
    assert len(got) == len(want)
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert (g["n_lines"] == w["n_lines"]).all()
    assert (g["n_removed"] == w["n_removed"]).all()
    assert (g["clean_text"] == w["clean_text"]).all()
    assert int(g["n_removed"].sum()) > 0, "planted dups must trigger removals"
