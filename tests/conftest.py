import os
import shutil

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small deterministic code corpus (shared across tests)."""
    from elasticsearch_assets_ray.corpus import write_corpus

    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, 600, seed=42, files=3, row_group_size=128)
    return d


@pytest.fixture(scope="session")
def built_index(ray_session, corpus_dir, tmp_path_factory):
    """Index over the shared corpus (small partitions to exercise the
    multi-partition/multi-bucket paths)."""
    from elasticsearch_assets_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("idx"))
    manifest = build_index(
        corpus_dir,
        out,
        target_partition_rows=128,
        runs_per_bucket=2,
        num_shards=4,
    )
    return out, manifest


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not present")
    return SF_DIR


@pytest.fixture(scope="session")
def null_index(ray_session, tmp_path_factory):
    """Index over a corpus whose `lang` is null for half the docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from elasticsearch_assets_ray.index.build import build_index

    d = tmp_path_factory.mktemp("nullcorp")
    n = 200
    t = pa.table(
        {
            "repo": pa.array([f"r{i % 7}" for i in range(n)]),
            "path": pa.array([f"p/{i}.py" for i in range(n)]),
            "commit": pa.array(["c0"] * n),
            "lang": pa.array(
                [None if i % 2 else "python" for i in range(n)], pa.string()
            ),
            "content": pa.array(
                [f"def load index value w{i % 11} x{i % 5}" for i in range(n)]
            ),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"))
    out = str(tmp_path_factory.mktemp("nullidx"))
    build_index(str(d), out, target_partition_rows=64, num_shards=4)
    return out
