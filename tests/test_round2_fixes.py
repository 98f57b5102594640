"""Round-2 fix coverage: footer-stats probes, keyspace exact/short-key
coverage, bounded DocstoreCache, coarse-group picks at high key
cardinality, upsert without base-key collection."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# min_max_probe: footer statistics only — no data pages
# ---------------------------------------------------------------------------


def test_min_max_probe_footer_only(tmp_path, monkeypatch):
    import pyarrow.dataset as pads

    from elasticsearch_assets_ray.sources import reader

    p = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"x": pa.array([5, 3, 9, 1, 7], pa.int64())}), p
    )

    real_dataset = pads.dataset

    class NoScan:
        def __init__(self, inner):
            self._inner = inner

        @property
        def files(self):
            return self._inner.files

        def to_table(self, *a, **kw):  # pragma: no cover - should not run
            raise AssertionError("min_max_probe read data pages")

    monkeypatch.setattr(
        reader.pads, "dataset", lambda path: NoScan(real_dataset(path))
    )
    lo, hi = reader.min_max_probe(p, "x")
    assert (lo, hi) == (1, 9)


def test_min_max_probe_matches_scan():
    from elasticsearch_assets_ray.sources.reader import min_max_probe

    p = "/root/testdata/sf0.001/events.parquet"
    lo, hi = min_max_probe(p, "ts")
    t = pq.read_table(p, columns=["ts"])
    assert lo == pc.min(t["ts"]).as_py()
    assert hi == pc.max(t["ts"]).as_py()


# ---------------------------------------------------------------------------
# keyspace: short keys under starting_depth; exact slices don't overlap
# ---------------------------------------------------------------------------


def test_prefix_dfs_short_keys_covered():
    from elasticsearch_assets_ray.sources.keyspace import (
        KeyspaceIndex,
        prefix_dfs_partitions,
    )

    keys = ["a", "ab"] + [f"abc{i%4}" for i in range(40)]
    ks = KeyspaceIndex(np.asarray(keys, dtype=object))
    slices = prefix_dfs_partitions(ks, "abc0123", 10, starting_depth=3)
    # every key is covered exactly once: sum of slice counts == n
    assert sum(s.count for s in slices) == len(keys)
    # the length-1 and length-2 keys surface as exact slices
    exacts = {s.prefix for s in slices if s.exact}
    assert {"a", "ab"} <= exacts


def test_exact_slices_no_double_fetch(tmp_path):
    from elasticsearch_assets_ray.sources.reader_api import ReaderAPI

    keys = ["a"] * 5 + [f"a{c}" for c in "bcdefgh" for _ in range(20)]
    p = str(tmp_path / "k.parquet")
    pq.write_table(
        pa.table({"k": pa.array(keys), "v": pa.array(range(len(keys)))}), p
    )
    api = ReaderAPI(p, key_col="k")
    slices = api.make_id_slicer_ranges("abcdefgh", 30)
    fetched = sum(api.fetch(s).num_rows for s in slices)
    assert fetched == len(keys)  # exact+prefix slices partition the keyspace


def test_keyspace_index_arrow_path():
    from elasticsearch_assets_ray.sources.keyspace import KeyspaceIndex

    arr = pa.array(["b", "a", "ab", "c", "aa"])
    ks = KeyspaceIndex(arr)
    assert ks._arrow
    assert ks.count_prefix("a") == 3
    assert ks.count_range("a", "b") == 3
    assert ks.count_range("a", "a\x00") == 1
    assert ks.key_at(0) == "a"


# ---------------------------------------------------------------------------
# DocstoreCache: batch path honors cache_size
# ---------------------------------------------------------------------------


def test_docstore_cache_bounded(tmp_path):
    from elasticsearch_assets_ray.state.storage import DocstoreCache

    p = str(tmp_path / "store.parquet")
    pq.write_table(
        pa.table(
            {"k": pa.array(range(100), pa.int64()), "v": pa.array(range(100))}
        ),
        p,
    )
    cache = DocstoreCache(p, "k", ["v"], cache_size=10)
    for lo in range(0, 100, 20):
        b = pa.table({"k": pa.array(range(lo, lo + 20), pa.int64())})
        out = cache(b)
        assert out["v"].to_pylist() == list(range(lo, lo + 20))
        assert cache._tbl.num_rows <= 20  # never above max(cache_size, batch keys)
    # evicted keys refetch correctly
    out = cache(pa.table({"k": pa.array([0, 1], pa.int64())}))
    assert out["v"].to_pylist() == [0, 1]


# ---------------------------------------------------------------------------
# coarse-group picks: high key cardinality stays correct
# ---------------------------------------------------------------------------


def test_lww_high_cardinality(ray_session):
    import ray.data

    from elasticsearch_assets_ray.stages.bulk import last_writer_wins

    n = 5000
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2000, n)
    ver = rng.integers(0, 1000, n)
    seq = np.arange(n)
    t = pa.table(
        {
            "k": pa.array(keys),
            "ver": pa.array(ver),
            "seq": pa.array(seq),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    out = pa.concat_tables(
        list(
            last_writer_wins(ds, "k", "ver", tie_break="seq").iter_batches(
                batch_format="pyarrow"
            )
        )
    ).sort_by([("k", "ascending")])
    # oracle: pandas idxmax on (ver, seq)
    import pandas as pd

    df = t.to_pandas().sort_values(["k", "ver", "seq"], ascending=[True, False, False])
    exp = df.groupby("k").first().reset_index()
    assert out.num_rows == len(exp)
    assert out["k"].to_pylist() == exp["k"].tolist()
    assert out["ver"].to_pylist() == exp["ver"].tolist()
    assert out["seq"].to_pylist() == exp["seq"].tolist()


def test_partial_agg_high_cardinality(ray_session):
    import ray.data

    from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg

    n = 4000
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1500, n)
    vals = rng.random(n) * 100
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(6)
    out = pa.concat_tables(
        list(
            partial_agg(
                ds,
                ["k"],
                [
                    AggSpec("s", "v", "sum_cents"),
                    AggSpec("n", "v", "count"),
                    AggSpec("mx", "v", "max"),
                ],
            ).iter_batches(batch_format="pyarrow")
        )
    ).sort_by([("k", "ascending")])
    import pandas as pd

    df = pa.table(
        {"k": pa.array(keys), "c": pa.array(np.round(vals * 100).astype(np.int64)), "v": vals}
    ).to_pandas()
    exp = df.groupby("k").agg(s=("c", "sum"), n=("c", "count"), mx=("v", "max")).reset_index()
    assert out["k"].to_pylist() == exp["k"].tolist()
    assert out["s"].to_pylist() == exp["s"].tolist()
    assert out["n"].to_pylist() == exp["n"].tolist()
    assert np.allclose(out["mx"].to_numpy(), exp["mx"].to_numpy())


def test_exact_dedup_collision_safe(ray_session):
    """Two distinct texts forced into the same hash group must BOTH
    survive (content is compared inside hash runs)."""
    import ray.data

    from elasticsearch_assets_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "id": pa.array(range(6), pa.int64()),
            "txt": pa.array(["x", "y", "x", "z", "y", "x"]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = pa.concat_tables(
        list(exact_dedup(ds, "txt", "id").iter_batches(batch_format="pyarrow"))
    ).sort_by([("id", "ascending")])
    assert out["id"].to_pylist() == [0, 1, 3]
    assert out.column_names == ["id", "txt"]
