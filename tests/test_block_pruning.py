"""Block-max pruning stress: pruned top-k must be bit-identical to the
exhaustive path and the brute-force oracle across many random queries,
and the block-skip machinery must actually engage."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from elasticsearch_assets_ray.query import engine as eng
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.oracle import OracleIndex

VOCAB = [
    "import", "return", "def", "class", "self", "value", "error", "index",
    "load", "parse", "merge", "query", "cache", "token", "user", "batch",
    "config", "store", "client", "server", "logger", "info",
]


@pytest.fixture(scope="module")
def stress_setup(built_index):
    idx_dir, _ = built_index
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(
        columns=["doc_id", "content"]
    )
    return (
        Searcher(idx_dir, prune=True),
        Searcher(idx_dir, prune=False),
        OracleIndex(doc, content_col="content", id_col="doc_id"),
    )


def test_random_queries_rank_identical(stress_setup):
    pruned, exact, oracle = stress_setup
    rng = np.random.default_rng(123)
    for _ in range(60):
        n_terms = int(rng.integers(1, 5))
        words = list(rng.choice(VOCAB, size=n_terms, replace=False))
        if rng.random() < 0.2:
            words[0] = "+" + words[0]
        if n_terms > 2 and rng.random() < 0.2:
            words[-1] = "-" + words[-1]
        q = " ".join(words)
        k = int(rng.choice([1, 3, 10, 50]))
        oi, osc = oracle.topk(q, k)
        rp = pruned.search(q, k)
        re_ = exact.search(q, k)
        assert np.array_equal(rp["doc_id"].to_numpy(), oi), (q, k)
        assert np.array_equal(rp["score"].to_numpy(), osc), (q, k)
        assert np.array_equal(re_["doc_id"].to_numpy(), oi), (q, k)


@pytest.fixture(scope="module")
def skewed_index(ray_session, tmp_path_factory):
    """A corpus with REGIONAL score variance — the regime block-max
    pruning exists for: 'alpha' has high tf in a 256-doc hot region (where
    the rare term 'beta' also lives) and tf=1 in long docs elsewhere, so
    whole 128-doc blocks outside the hot region bound below θ."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from elasticsearch_assets_ray.index.build import build_index

    n = 2048
    contents = []
    for i in range(n):
        if i < 256:
            contents.append("alpha alpha alpha alpha beta pad")
        else:
            contents.append("alpha " + "pad " * 50)
    t = pa.table(
        {
            "repo": pa.array([f"r{i % 7}" for i in range(n)]),
            "path": pa.array([f"f{i}.py" for i in range(n)]),
            "commit": pa.array([f"{i:08x}" for i in range(n)]),
            "lang": pa.array(["python"] * n),
            "content": pa.array(contents),
        }
    )
    cd = tmp_path_factory.mktemp("skewcorpus")
    pq.write_table(t, str(cd / "c.parquet"), row_group_size=512)
    out = str(tmp_path_factory.mktemp("skewidx"))
    build_index(str(cd), out, target_partition_rows=512, runs_per_bucket=2, num_shards=4)
    return out


def test_block_skipping_engages(skewed_index, monkeypatch):
    """Partial block decode must fire AND skip most of alpha's blocks,
    with results still oracle-identical."""
    doc = pads.dataset(os.path.join(skewed_index, "docstore")).to_table(
        columns=["doc_id", "content"]
    )
    oracle = OracleIndex(doc, content_col="content", id_col="doc_id")
    s = Searcher(skewed_index, prune=True)
    calls = {"blocks": 0}
    orig_block = s._decode_block

    def counting_block(*a, **kw):
        calls["blocks"] += 1
        return orig_block(*a, **kw)

    s._decode_block = counting_block
    r = s.search("alpha beta", k=1)
    oi, osc = oracle.topk("alpha beta", 1)
    assert np.array_equal(r["doc_id"].to_numpy(), oi)
    assert np.array_equal(r["score"].to_numpy(), osc)
    # alpha spans 16 blocks; only the hot-region blocks should decode
    assert 0 < calls["blocks"] <= 8


def test_skewed_rank_identity_many_k(skewed_index):
    doc = pads.dataset(os.path.join(skewed_index, "docstore")).to_table(
        columns=["doc_id", "content"]
    )
    oracle = OracleIndex(doc, content_col="content", id_col="doc_id")
    s = Searcher(skewed_index, prune=True)
    for q in ["alpha beta", "alpha", "beta pad", "alpha pad", "+beta alpha"]:
        for k in (1, 3, 10, 300):
            oi, osc = oracle.topk(q, k)
            r = s.search(q, k)
            assert np.array_equal(r["doc_id"].to_numpy(), oi), (q, k)
            assert np.array_equal(r["score"].to_numpy(), osc), (q, k)


def test_seed_theta_only_without_filters(stress_setup):
    pruned, _, oracle = stress_setup
    # must/must_not queries take the unseeded path but stay identical
    for q in ["+import return", "import -return def", "+def +class"]:
        oi, osc = oracle.topk(q, 5)
        r = pruned.search(q, 5)
        assert np.array_equal(r["doc_id"].to_numpy(), oi), q
        assert np.array_equal(r["score"].to_numpy(), osc), q


def test_pfor_index_rank_identical(ray_session, tmp_path, corpus_dir):
    """An index built with the PFor codec returns bit-identical results
    to the varint index and the oracle."""
    from elasticsearch_assets_ray.index.build import IndexConfig, build_index

    out = str(tmp_path / "pfor_idx")
    build_index(
        corpus_dir, out,
        config=IndexConfig(codec="pfor", target_partition_rows=128,
                           runs_per_bucket=2, num_shards=4),
    )
    sp = Searcher(out, prune=True)
    doc = pads.dataset(os.path.join(out, "docstore")).to_table(columns=["doc_id", "content"])
    oracle = OracleIndex(doc, content_col="content", id_col="doc_id")
    for q in ["import parse config", "def load index", "+error +return throw"]:
        oi, osc = oracle.topk(q, 10)
        r = sp.search(q, 10)
        assert np.array_equal(r["doc_id"].to_numpy(), oi), q
        assert np.array_equal(r["score"].to_numpy(), osc), q


@pytest.fixture(scope="module")
def drift_index(ray_session, tmp_path_factory):
    """Drifted-vocabulary corpus (per-segment syllable zipf, repo-ordered)
    — the bench_pruned_serving regime at test scale."""
    from elasticsearch_assets_ray.corpus import write_corpus
    from elasticsearch_assets_ray.index.build import build_index

    cd = str(tmp_path_factory.mktemp("driftcorpus"))
    write_corpus(cd, 4000, files=4, row_group_size=256, drift_segments=8)
    out = str(tmp_path_factory.mktemp("driftidx"))
    build_index(cd, out, target_partition_rows=256, runs_per_bucket=2, num_shards=8)
    return out


def test_drift_scoped_queries_skip_and_match(drift_index):
    """Scoped (rare repo token + common terms) queries must skip whole
    buckets AND stay rank-identical to the exhaustive path."""
    pruned = Searcher(drift_index, prune=True)
    exact = Searcher(drift_index, prune=False)
    for q in ["repo3 parse config", "repo11 load index", "repo19 merge shard"]:
        for _ in range(2):  # cold + warm (cache-bypass path)
            rp = pruned.search(q, k=10)
            re_ = exact.search(q, k=10)
            assert rp["doc_id"].to_pylist() == re_["doc_id"].to_pylist(), q
            assert np.array_equal(
                rp["score"].to_numpy(), re_["score"].to_numpy()
            ), q
    assert pruned.stats["buckets_skipped"] > 0
    assert exact.stats["buckets_skipped"] == 0


def test_hydrate_opens_only_touched_parts(built_index):
    """Pid-pruned hydrate: requesting docids from one partition must open
    ONE docstore part file, not scan the dataset."""
    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    pmap = s._pid_map()
    assert len(pmap) > 1
    pid = sorted(pmap)[0]
    ids = np.array([(pid << s._doc_shift) + r for r in (0, 3, 5)], dtype=np.int64)
    t = s.hydrate(ids, columns=["doc_id", "path"])
    assert s.hydrate_files_opened == 1
    assert t["doc_id"].to_pylist() == ids.tolist()
    # requested order is preserved even when ids are unsorted across pids
    pid2 = sorted(pmap)[1]
    mixed = np.array(
        [(pid2 << s._doc_shift) + 1, (pid << s._doc_shift) + 2, (pid2 << s._doc_shift) + 0],
        dtype=np.int64,
    )
    t2 = s.hydrate(mixed, columns=["doc_id"])
    assert t2["doc_id"].to_pylist() == mixed.tolist()
    assert s.hydrate_files_opened == 3  # two more files for the second call
