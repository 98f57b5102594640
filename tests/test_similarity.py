"""Similarity search: brute-force exactness, LSH recall subset, dedup."""

import numpy as np
import pyarrow as pa
import ray.data

from elasticsearch_assets_ray.stages import similarity as sim


def _vectors(n=300, d=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1).astype(np.float32)), d
            ),
        }
    )


def test_brute_force_matches_numpy():
    t = _vectors()
    ds = ray.data.from_arrow(t)
    m = sim._normalize(sim._matrix(t["embedding"]))
    qids = np.array([0, 5], dtype=np.int64)
    res = sim.brute_force_topk(ds, qids, m[[0, 5]], k=4)
    for qi, qvec in zip(qids, m[[0, 5]]):
        sims = m @ qvec
        order = np.lexsort((np.arange(len(sims)), -sims))[:4]
        got = [
            v for q, v in zip(res["query_id"].to_pylist(), res["vec_id"].to_pylist())
            if q == qi
        ]
        assert got == list(order)


def test_lsh_results_subset_of_exact_ranking():
    t = _vectors()
    ds = ray.data.from_arrow(t)
    m = sim._normalize(sim._matrix(t["embedding"]))
    qids = np.array([1], dtype=np.int64)
    res = sim.lsh_topk(ds, qids, m[[1]], dim=16, k=5, n_tables=8, n_planes=6)
    # every returned sim must equal the true cosine for that vec
    for vid, s in zip(res["vec_id"].to_pylist(), res["sim"].to_pylist()):
        assert abs(float(m[vid] @ m[1]) - s) < 1e-9
    # self-match always lands in its own bucket
    assert 1 in res["vec_id"].to_pylist()


def test_embedding_cosine_dedup_finds_planted():
    t = _vectors(100)
    dup = pa.table(
        {
            "vec_id": pa.array(np.arange(100000, 100005, dtype=np.int64)),
            "embedding": t["embedding"].slice(0, 5),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, dup]))
    pairs = sim.embedding_cosine_dedup(ds, dim=16, threshold=0.999)
    found = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    for i in range(5):
        assert (i, 100000 + i) in found


def test_ivf_topk_recall_and_exactness():
    """IVF results are exact cosines for probed vectors; self-match always
    recalled (its own cluster is the top probe); high recall vs brute
    force at nprobe=4/16."""
    t = _vectors(400)
    ds = ray.data.from_arrow(t)
    m = sim._normalize(sim._matrix(t["embedding"]))
    qids = np.array([3, 7], dtype=np.int64)
    res = sim.ivf_topk(ds, qids, m[[3, 7]], k=5, n_centroids=16, nprobe=4)
    for vid, s, qid in zip(res["vec_id"].to_pylist(), res["sim"].to_pylist(),
                           res["query_id"].to_pylist()):
        assert abs(float(m[vid] @ m[qid]) - s) < 1e-9
    by_q = {}
    for qid, vid, rank in zip(res["query_id"].to_pylist(), res["vec_id"].to_pylist(),
                              res["rank"].to_pylist()):
        by_q.setdefault(qid, []).append(vid)
    assert by_q[3][0] == 3 and by_q[7][0] == 7  # self-match rank 1
    exact = sim.brute_force_topk(ds, qids, m[[3, 7]], k=5)
    exact_sets = {}
    for qid, vid in zip(exact["query_id"].to_pylist(), exact["vec_id"].to_pylist()):
        exact_sets.setdefault(qid, set()).add(vid)
    for qid in (3, 7):
        recall = len(set(by_q[qid]) & exact_sets[qid]) / 5
        assert recall >= 0.4, recall  # approximate, but must overlap


def test_train_centroids_deterministic():
    rng = np.random.default_rng(0)
    sample = rng.standard_normal((200, 8))
    a = sim.train_centroids(sample, 8)
    b = sim.train_centroids(sample, 8)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_ivf_partitioned_layout_prunes_reads(ray_session, tmp_path):
    """ivf_build writes one partition dir per cluster; a probe plan opens
    ONLY the probed partitions' files, and search over the pruned read is
    exact for a planted near-identical probe."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.similarity import (
        ivf_build,
        ivf_probed_files,
        ivf_search,
    )

    rng = np.random.default_rng(23)
    n, dim = 400, 16
    mat = rng.standard_normal((n, dim))
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), dim
            ),
        }
    )
    out = str(tmp_path / "ivf")
    man = ivf_build(ray.data.from_arrow(t).repartition(4), out, n_centroids=8)
    assert man["n_centroids"] == 8

    # planted probes: source vectors + small shift -> exact NN is source
    probe_ids = np.array([5, 100, 300])
    probes = mat[probe_ids] + 0.01
    touched, total = ivf_probed_files(out, probes, nprobe=2)
    assert touched < total  # pruning is real: unprobed partitions unopened

    res = ivf_search(out, probe_ids, probes, k=1, nprobe=2)
    got = dict(zip(res["query_id"].to_pylist(), res["vec_id"].to_pylist()))
    assert got == {int(i): int(i) for i in probe_ids}


def test_batched_scorers_many_queries(ray_session, tmp_path):
    """100-query batch serving: LSH and IVF candidates must contain the
    true neighbor for planted probes, with per-query results equal to
    brute force on the candidate sets (exercises the pair-expansion path,
    not the 3-query gate loop)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_search,
        lsh_topk,
    )

    rng = np.random.default_rng(3)
    dim, n = 16, 2000
    base = rng.normal(size=(n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(base.astype(np.float64))),
        }
    )
    ds = ray.data.from_arrow(tbl)
    # planted probes: perturbed copies of 100 random rows
    qsel = rng.choice(n, size=100, replace=False)
    qvecs = base[qsel] + 0.01 * rng.normal(size=(100, dim))
    qids = np.arange(100, dtype=np.int64)

    bf = brute_force_topk(ds, qids, qvecs, k=1)
    bf_map = dict(zip(bf["query_id"].to_pylist(), bf["vec_id"].to_pylist()))
    assert all(bf_map[int(q)] == int(v) for q, v in zip(qids, qsel))

    lsh = lsh_topk(
        ray.data.from_arrow(tbl), qids, qvecs, dim=dim, k=1,
        n_tables=12, n_planes=8,
    )
    lsh_map = dict(zip(lsh["query_id"].to_pylist(), lsh["vec_id"].to_pylist()))
    hits = sum(1 for q in qids if lsh_map.get(int(q)) == int(qsel[q]))
    assert hits >= 95  # near-dup probes: LSH recall must be high

    idx = str(tmp_path / "ivf")
    ivf_build(ray.data.from_arrow(tbl), idx, n_centroids=8)
    ivf = ivf_search(idx, qids, qvecs, k=1, nprobe=3)
    ivf_map = dict(zip(ivf["query_id"].to_pylist(), ivf["vec_id"].to_pylist()))
    hits = sum(1 for q in qids if ivf_map.get(int(q)) == int(qsel[q]))
    assert hits >= 95


def test_kmeans_distributed_converges_and_deterministic(ray_session):
    """Full-corpus spherical k-means: Lloyd monotonicity (mean cosine
    non-decreasing), normalized centers, and run-to-run determinism on a
    fixed partitioning."""
    import numpy as np

    from elasticsearch_assets_ray.stages.similarity import kmeans_distributed

    emb_ds = ray.data.from_arrow(_vectors(n=400, d=16)).repartition(8)
    c1, s1 = kmeans_distributed(emb_ds, "embedding", 6, n_iters=4)
    assert c1.shape[0] == 6
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-12)
    mc = [it["mean_cosine"] for it in s1["iters"]]
    assert all(mc[i + 1] >= mc[i] - 1e-9 for i in range(len(mc) - 1)), mc
    assert sum(s1["sizes"]) == emb_ds.count()
    c2, s2 = kmeans_distributed(emb_ds, "embedding", 6, n_iters=4)
    np.testing.assert_array_equal(c1, c2)
    assert s1["sizes"] == s2["sizes"]


def test_pq_roundtrip_and_adc_accuracy():
    """PQ codebooks are deterministic; ADC sims approximate true cosine
    (planted near-dup probes rank first through the compressed codes)."""
    t = _vectors(n=400, d=32, seed=7)
    m = sim._normalize(sim._matrix(t["embedding"]))
    books1 = sim.pq_train(m, m=8, ksub=16, seed=5)
    books2 = sim.pq_train(m, m=8, ksub=16, seed=5)
    np.testing.assert_array_equal(books1, books2)
    codes = sim.pq_encode(m, books1)
    assert codes.shape == (400, 8) and codes.dtype == np.uint8
    # ADC of a planted probe (vector 17 + small noise) ranks 17 first
    q = m[17] + 0.01
    adc = sim.pq_adc_scores(codes, books1, sim._normalize(q[None, :])[0])
    assert int(np.argmax(adc)) == 17


def test_pq_topk_with_exact_rerank_finds_planted(ray_session):
    """pq_topk (ADC candidates) + exact_rerank retrieves every planted
    probe's source vector at rank 1 with the TRUE cosine as sim."""
    t = _vectors(n=400, d=32, seed=11)
    ds = ray.data.from_arrow(t).repartition(4)
    m = sim._matrix(t["embedding"])
    qids = np.array([3, 40, 250], dtype=np.int64)
    qvecs = m[[3, 40, 250]] + 0.01
    cands = sim.pq_topk(ds, qids, qvecs, k=8, m=8, ksub=16)
    assert set(cands.column_names) == {"query_id", "vec_id", "rank", "sim"}
    res = sim.exact_rerank(ray.data.from_arrow(t), cands, qids, qvecs, k=1)
    got = dict(zip(res["query_id"].to_pylist(), res["vec_id"].to_pylist()))
    assert got == {3: 3, 40: 40, 250: 250}
    # sim is the exact cosine, not the ADC estimate
    mn = sim._normalize(m.astype(np.float64))
    qn = sim._normalize(qvecs.astype(np.float64))
    for row_q, row_v, row_s in zip(
        res["query_id"].to_pylist(), res["vec_id"].to_pylist(), res["sim"].to_pylist()
    ):
        expect = float(mn[row_v] @ qn[list(qids).index(row_q)])
        assert abs(row_s - expect) < 1e-12


def test_semdedup_finds_planted_and_blocks_correctly(ray_session):
    """SemDeDup: exact planted copies co-locate (identical assignment)
    and every within-cluster pair above threshold is found even when
    the blocked triangle spans multiple blocks."""
    t = _vectors(n=300, d=16, seed=13)
    import pyarrow.compute as pc

    head = t.slice(0, 8)
    dup = pa.table(
        {
            "vec_id": pc.add(head["vec_id"], pa.scalar(1000, pa.int64())),
            "embedding": head["embedding"],
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, dup])).repartition(4)
    pairs = sim.semdedup(ds, threshold=0.99, n_centroids=4, n_iters=3, block_rows=32)
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert {(i, i + 1000) for i in range(8)} <= got
    # all returned sims really are >= threshold
    assert all(s >= 0.99 for s in pairs["sim"].to_pylist())
    # tiny block size changes nothing (blocking is exact)
    pairs2 = sim.semdedup(ds, threshold=0.99, n_centroids=4, n_iters=3, block_rows=7)
    assert pairs.equals(pairs2)
