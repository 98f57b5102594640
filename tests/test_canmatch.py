"""can_match shard pre-filter + ES ``?routing=`` shard targeting.

ES parity: the coordinator skips shards that provably cannot hold a
match before scattering (ES's can_match phase / ``_search_shards``),
and a ``routing=`` value restricts the search to the single shard the
value hashes to (reference: ES routing, the same placement contract
ElasticsearchBulkSender's createRoute writes with).  Pruning must be
SOUND: every answer bit-identical to the unpruned scatter.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.routing import build_routed_index, route_of
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.parser import required_term_groups
from elasticsearch_assets_ray.query.sharded import ShardedSearcher


@pytest.fixture(scope="module")
def cm_index(ray_session, tmp_path_factory):
    """400 docs / 4 partitions; 'zebra' only in doc 0, 'okapi' only in
    the last doc — guaranteed shard-local terms for pruning assertions."""
    d = tmp_path_factory.mktemp("cmcorp")
    n = 400
    extra = {0: " zebra", n - 1: " okapi", 5: " quagga", n - 5: " quagga"}
    t = pa.table(
        {
            "repo": pa.array([f"r{i % 5}" for i in range(n)]),
            "path": pa.array([f"p/{i}.py" for i in range(n)]),
            "commit": pa.array(["c0"] * n),
            "lang": pa.array(["python"] * n),
            "content": pa.array(
                [
                    f"def load index value w{i % 11} x{i % 5}" + extra.get(i, "")
                    for i in range(n)
                ]
            ),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"), row_group_size=64)
    out = str(tmp_path_factory.mktemp("cmidx"))
    build_index(
        str(d), out, target_partition_rows=64, runs_per_bucket=2, num_shards=4
    )
    return out


QUERIES = [
    "def load index",
    "+zebra def",
    "zebra OR okapi",
    '"def load" zebra',
    "quagga AND value",
    "(zebra OR okapi) AND def",
    "absentterm",
    "absentterm AND def",
    "value -def",
    "lang:python zebra",
    "okapi x*",
]


def test_can_match_parity_and_pruning(cm_index):
    single = Searcher(cm_index)
    sh = ShardedSearcher(cm_index, n_shards=4)
    off = ShardedSearcher(cm_index, n_shards=4, can_match=False)
    assert sh.n_shards == 4
    for q in QUERIES:
        a = single.search(q, k=20)
        b = sh.search(q, k=20)
        c = off.search(q, k=20)
        assert a.equals(b), q
        assert a.equals(c), q
        assert sh.count(q) == off.count(q) == single.all_scores(q).num_rows
        assert np.array_equal(
            np.sort(sh.match_ids(q)), np.sort(off.match_ids(q))
        ), q
    cm = sh.metrics()["can_match"]
    # 'zebra' lives in one bucket => one shard; pruning must have fired
    assert cm["pruned_queries"] > 0 and cm["shards_skipped"] > 0
    # absent terms answered with ZERO shard RPCs
    assert cm["empty_queries"] > 0
    off_cm = off.metrics()["can_match"]
    assert off_cm["pruned_queries"] == 0 and off_cm["shards_skipped"] == 0
    # _gather_q accounting: a fully-pruned aggregation verb still issues
    # ONE RPC (schema-carrying fallback shard), so it records exactly
    # n_shards-1 skips and is NOT an empty_queries (zero-RPC) answer
    before = sh.metrics()["can_match"]
    sh.facet("absentterm", by="lang")
    after = sh.metrics()["can_match"]
    assert after["shards_skipped"] - before["shards_skipped"] == 3
    assert after["empty_queries"] == before["empty_queries"]


def test_single_term_locality(cm_index):
    """A term present in exactly one bucket scatters to exactly one
    shard, and the prepared-handle cache preserves the pruned plan."""
    sh = ShardedSearcher(cm_index, n_shards=4)
    tmap = sh._shards_for_terms(["zebra", "okapi", "def", "absentterm"])
    assert len(tmap["zebra"]) == 1
    assert len(tmap["okapi"]) == 1
    assert tmap["zebra"] != tmap["okapi"]  # first vs last doc
    assert len(tmap["def"]) == 4
    assert tmap["absentterm"] == frozenset()
    q, _ = sh.prepare("zebra")
    assert sh.can_match_shards(q) == sorted(tmap["zebra"])
    before = sh.metrics()["can_match"]["shards_skipped"]
    sh.search("zebra", k=5)
    sh.search("zebra", k=5)  # cache hit keeps counting skips
    after = sh.metrics()["can_match"]["shards_skipped"]
    assert after - before == 6  # 3 shards skipped per call


def test_minimum_should_match_prunes_split_terms(cm_index):
    """msm=2 over {zebra, okapi} (opposite ends of the doc space): no
    single shard holds both, so NO shard can match — zero RPCs — while
    msm=1 still scatters to their two shards.  Parity either way."""
    single = Searcher(cm_index)
    sh = ShardedSearcher(cm_index, n_shards=4)
    q1, _ = sh.prepare("zebra okapi", minimum_should_match=1)
    assert len(sh.can_match_shards(q1)) == 2
    q2, _ = sh.prepare("zebra okapi", minimum_should_match=2)
    assert sh.can_match_shards(q2) == []
    # quagga appears twice in ONE shard? (doc 5 and n-5 are far apart —
    # two shards); msm=2 over {quagga} alone needs 2 distinct should
    # terms, impossible with one term
    for msm in (1, 2):
        a = single.search("zebra okapi", k=10, minimum_should_match=msm)
        b = sh.search("zebra okapi", k=10, minimum_should_match=msm)
        assert a.equals(b), msm
        assert sh.count("zebra okapi", minimum_should_match=msm) == (
            single.all_scores("zebra okapi", minimum_should_match=msm).num_rows
        )


def test_required_term_groups_shapes():
    from elasticsearch_assets_ray.query.parser import parse_query

    # flat: base group + singleton musts
    g = required_term_groups(parse_query("+alpha beta"))
    assert frozenset({"alpha"}) in g
    assert any("beta" in grp for grp in g)
    # tree: grounded base
    g = required_term_groups(parse_query("(alpha OR beta) AND gamma"))
    assert frozenset({"alpha", "beta", "gamma"}) in g
    assert frozenset({"gamma"}) in g
    assert frozenset({"alpha", "beta"}) in g
    # OR with a filter arm yields no OR-group, base still present
    g = required_term_groups(parse_query("alpha AND (beta OR lang:python)"))
    assert frozenset({"alpha"}) in g
    assert frozenset({"beta"}) not in g


def test_search_shards_introspection(cm_index):
    sh = ShardedSearcher(cm_index, n_shards=4)
    plan = sh.search_shards()
    assert [p["shard"] for p in plan] == [0, 1, 2, 3]
    assert all(p["can_match"] for p in plan)
    # ranges tile the bucket space
    for a, b in zip(plan, plan[1:]):
        assert a["bucket_range"][1] == b["bucket_range"][0]
    zp = sh.search_shards("zebra")
    assert sum(p["can_match"] for p in zp) == 1
    ap = sh.search_shards("absentterm")
    assert sum(p["can_match"] for p in ap) == 0


def test_routing_param_targets_one_shard(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cmrouted")
    n = 300
    keys = np.arange(n, dtype=np.int64)
    words = ["alpha", "beta", "gamma", "delta"]
    corpus = pa.table(
        {
            "join_name": pa.array(["order"] * n),
            "routing": pa.array(keys),
            "content": pa.array([words[i % 4] + " doc body" for i in range(n)]),
            "val": pa.array(keys * 3),
        }
    )
    cdir = root / "corpus"
    os.makedirs(cdir)
    pq.write_table(corpus, str(cdir / "c.parquet"), row_group_size=64)
    idx = str(root / "idx")
    m = build_routed_index(
        str(cdir),
        idx,
        routing_col="routing",
        n_routes=4,
        id_cols=(),
        keep_cols=("join_name", "routing", "val"),
        target_partition_rows=128,
        store_content=False,
    )
    single = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=4)
    # the routing value's shard must serve exactly the full results
    # restricted to that shard's doc range (ES: routing selects the
    # shard; the query still runs normally inside it)
    rpb = m["runs_per_bucket"]
    shift = m["doc_shift"]
    for rv in (0, 7, 123, n - 1):
        s = sh._route_shard(rv)
        lo, hi = sh.ranges[s]
        full = single.all_scores("beta")
        ids = full["doc_id"].to_numpy(zero_copy_only=False)
        buckets = (ids >> shift) // rpb
        in_shard = (buckets >= lo) & (buckets < hi)
        assert sh.count("beta", routing=rv) == int(in_shard.sum())
        assert sh.match_count("beta", routing=rv) == (int(in_shard.sum()), "eq")
        if int(in_shard.sum()) > 1:
            assert sh.match_count("beta", track_total_hits=1, routing=rv) == (
                1,
                "gte",
            )
        got = sh.match_ids("beta", routing=rv)
        assert np.array_equal(np.sort(got), np.sort(ids[in_shard]))
        # every doc returned under routing= lives in the routed shard
        hit = sh.search(words[rv % 4], k=n, routing=rv)
        hids = hit["doc_id"].to_numpy(zero_copy_only=False)
        hb = (hids >> shift) // rpb
        assert hids.size and ((hb >= lo) & (hb < hi)).all()
    # routing= composes with can_match: absent term stays empty
    assert sh.count("absentterm", routing=3) == 0
    # search_shards with routing flags one shard
    plan = sh.search_shards(routing=5)
    assert sum(p["can_match"] for p in plan) == 1


def test_msearch_per_item_can_match(cm_index):
    """msearch applies can_match PER batch item (ES semantics): results
    identical to per-query search() for a batch mixing common,
    single-shard, and absent-term queries; fully-pruned items come back
    as empty tables; a shard every item prunes away gets no RPC."""
    batch = [
        "def load index",
        "zebra",
        "okapi",
        "absentterm",
        "quagga AND value",
        "zebra okapi",
    ]
    for actors in (False, True):
        sh = ShardedSearcher(
            cm_index, n_shards=4, use_actors=actors, num_cpus=0.25
        )
        off = ShardedSearcher(cm_index, n_shards=4, can_match=False)
        try:
            got = sh.msearch(batch, k=15)
            want = [off.search(q, k=15) for q in batch]
            for q, a, b in zip(batch, got, want):
                assert a.equals(b), q
            cm = sh.metrics()["can_match"]
            assert cm["pruned_queries"] >= 4  # zebra/okapi/absent/quagga
            assert cm["empty_queries"] == 1  # absentterm
        finally:
            sh.shutdown()
            off.shutdown()


def test_sharded_match_count_track_total_hits(cm_index):
    """Distributed Q7: the sharded (value, relation) contract matches
    the single searcher at every threshold regime, and shard-side early
    exit actually fires (count_early_exit counters advance)."""
    single = Searcher(cm_index)
    sh = ShardedSearcher(cm_index, n_shards=4)
    true_n = single.match_count("def")[0]
    assert true_n > 8
    assert sh.match_count("def") == (true_n, "eq")
    assert sh.match_count("def", track_total_hits=true_n) == (true_n, "eq")
    assert sh.match_count("def", track_total_hits=true_n + 5) == (true_n, "eq")
    assert sh.match_count("def", track_total_hits=8) == (8, "gte")
    assert sh.match_count("absentterm", track_total_hits=8) == (0, "eq")
    # single-searcher contract identity on the same thresholds
    for tth in (None, 8, true_n, true_n + 5):
        assert sh.match_count("def", track_total_hits=tth) == single.match_count(
            "def", track_total_hits=tth
        )
    # the early exit fired shard-side at the small threshold
    exits = sum(
        s.get("count_early_exit", 0) for s in [w.s.stats for w in sh.shards]
    )
    assert exits > 0


def test_filters_agg_per_item_can_match(cm_index):
    """filters_agg prunes per named filter: identical counts to the
    unpruned scatter for a mix of common / single-shard / absent
    filters, in actor and in-process modes."""
    filters = {
        "common": "def load",
        "first": "zebra",
        "last": "okapi",
        "nowhere": "absentterm",
        "pair": "quagga AND value",
    }
    for actors in (False, True):
        sh = ShardedSearcher(
            cm_index, n_shards=4, use_actors=actors, num_cpus=0.25
        )
        off = ShardedSearcher(cm_index, n_shards=4, can_match=False)
        try:
            a = sh.filters_agg(filters)
            b = off.filters_agg(filters)
            assert a.equals(b)
            by = dict(zip(a["value"].to_pylist(), a["count"].to_pylist()))
            assert by["first"] == 1 and by["last"] == 1 and by["nowhere"] == 0
            cm = sh.metrics()["can_match"]
            assert cm["pruned_queries"] >= 4
            assert cm["empty_queries"] == 1
        finally:
            sh.shutdown()
            off.shutdown()


def test_routing_param_refused_on_unrouted_index(cm_index):
    sh = ShardedSearcher(cm_index, n_shards=4)
    with pytest.raises(ValueError, match="ROUTED"):
        sh.search("def", routing="x")
