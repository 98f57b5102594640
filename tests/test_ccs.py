"""Cross-cluster search (query/ccs.py): rank identity vs a single index
built over the union corpus, content-sha keyed (docIDs differ between
independent builds; content does not)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray import Searcher, build_index
from elasticsearch_assets_ray.corpus import write_corpus
from elasticsearch_assets_ray.query import bm25
from elasticsearch_assets_ray.query.ccs import CrossClusterSearcher

BASE = "/tmp/esr_ccs_test"


@pytest.fixture(scope="module")
def ccs_env(ray_session):
    if not os.path.exists(f"{BASE}/idx_all/manifest.json"):
        shutil.rmtree(BASE, ignore_errors=True)
        os.makedirs(f"{BASE}/corpus_a")
        os.makedirs(f"{BASE}/corpus_b")
        write_corpus(f"{BASE}/corpus_all", 2400, files=4)
        for i in range(4):
            dst = "corpus_a" if i < 2 else "corpus_b"
            shutil.copy(
                f"{BASE}/corpus_all/corpus-{i:04d}.parquet",
                f"{BASE}/{dst}/corpus-{i:04d}.parquet",
            )
        for part in ("a", "b", "all"):
            build_index(
                f"{BASE}/corpus_{part}" if part != "all" else f"{BASE}/corpus_all",
                f"{BASE}/idx_{part}",
                target_partition_rows=600,
            )
    ccs = CrossClusterSearcher(
        {"east": f"{BASE}/idx_a", "west": f"{BASE}/idx_b"}
    )
    single = Searcher(f"{BASE}/idx_all")
    return ccs, single


def _sha_ranked(searcher, table, id_col="doc_id"):
    # hydrate returns rows aligned to the input docid order
    ids = table[id_col].to_numpy(zero_copy_only=False)
    return searcher.hydrate(ids, columns=["sha256"])["sha256"].to_pylist()


def test_ccs_combined_stats_bit_equal(ccs_env):
    ccs, single = ccs_env
    assert ccs.n_docs == single.n_docs
    assert ccs.avgdl == single.avgdl  # bit-equal, not approximately


QUERIES = [
    "def load index",
    "+def +index -java",
    "(load OR save) AND index",
    '"def load"',
    "spark merge table",
    # union-dictionary expansion shapes
    "def loa*",
    "inde?* load",
    "lod~1 index",
    "(loa* OR sav*) AND index",
]


@pytest.mark.parametrize("q", QUERIES)
def test_ccs_rank_identity_vs_union_index(ccs_env, q):
    ccs, single = ccs_env
    k = 12
    got = ccs.search(q, k=k)
    want = single.search(q, k=k)
    gs = bm25.round_half_up(got["score"].to_numpy(zero_copy_only=False), 9)
    ws = bm25.round_half_up(want["score"].to_numpy(zero_copy_only=False), 9)
    np.testing.assert_array_equal(gs, ws)
    # same documents at every score level (content sha, not docID —
    # WITHIN a score tie the two paths may order different-cluster docs
    # differently than the union index orders its docIDs)
    g_sha = _sha_ranked_ccs(ccs, got)
    w_sha = _sha_ranked(single, want)
    gi = wi = 0
    for s in np.unique(ws)[::-1]:
        g_grp = {g_sha[i] for i in range(len(gs)) if gs[i] == s}
        w_grp = {w_sha[i] for i in range(len(ws)) if ws[i] == s}
        assert g_grp == w_grp


def _sha_ranked_ccs(ccs, table):
    out = []
    for cl, did in zip(table["cluster"].to_pylist(), table["doc_id"].to_pylist()):
        h = ccs.hydrate(cl, np.array([did], dtype=np.int64), columns=["sha256"])
        out.append(h["sha256"][0].as_py())
    return out


def test_ccs_count_and_facet_match_union(ccs_env):
    ccs, single = ccs_env
    for q in ("def load", "+index -java"):
        assert ccs.count(q) == int(single.match_ids(q).size)
    f_ccs = ccs.facet("def load index", by="lang")
    f_one = single.facet("def load index", by="lang")
    assert f_ccs.to_pydict() == f_one.to_pydict()


def test_ccs_union_expansion_matches_union_dict(ccs_env):
    ccs, single = ccs_env
    # the federated expansion set equals the union index's expansion set
    for pat in ("loa", "in", "s"):
        assert ccs._expander.expand_prefix(pat) == single.expand_prefix(pat)
    assert ccs._expander.expand_fuzzy("lod", 1) == single.expand_fuzzy("lod", 1)
    # the cap re-check fires on the union even when members fit
    n_union = len(single.expand_prefix("s"))
    assert n_union > 2
    with pytest.raises(ValueError, match="across clusters|expands to more"):
        ccs._expander.expand_prefix("s", max_expansions=n_union - 1)


@pytest.mark.parametrize("q", ["def load index", "spark merge table", "+def +index"])
def test_ccs_search_after_pages_exact(ccs_env, q):
    # two pages through the (score, cluster, doc_id) cursor must equal
    # one k=10 page EXACTLY — no duplicated and no skipped rows even
    # across cross-cluster score ties (the cursor carries the cluster)
    ccs, _ = ccs_env
    p1 = ccs.search(q, k=5)
    cursor = (
        float(p1["score"][4].as_py()),
        p1["cluster"][4].as_py(),
        int(p1["doc_id"][4].as_py()),
    )
    p2 = ccs.search(q, k=5, search_after=cursor)
    both = pa.concat_tables([p1, p2])
    full = ccs.search(q, k=10)
    assert both.to_pydict() == full.to_pydict()
