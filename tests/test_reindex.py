"""Reindex pipeline (the reference's reader→processor→sender flagship
composition): row-exact output, per-slice checkpoint/resume, spec-change
invalidation, transforms."""

import json
import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from elasticsearch_assets_ray.pipelines.reindex import reindex

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture()
def out(tmp_path):
    return str(tmp_path / "reidx")


def _rows(glob_pat: str) -> int:
    return duckdb.sql(f"SELECT count(*) FROM '{glob_pat}'").fetchone()[0]


def test_reindex_row_exact_and_resume(ray_session, out):
    m1 = reindex(SRC, out, date_col="ts", n_slices=5)
    assert m1["complete"] and m1["slices_skipped_resume"] == 0
    src_n = _rows(SRC)
    assert m1["rows_in"] == m1["rows_out"] == src_n
    assert _rows(f"{out}/part-*.parquet") == src_n
    # full resume: nothing re-runs
    m2 = reindex(SRC, out, date_col="ts", n_slices=5)
    assert m2["slices_skipped_resume"] == 5
    assert m2["rows_out"] == src_n
    # partial resume: drop one checkpoint → exactly that slice re-runs
    os.unlink(f"{out}/part-00002.done.json")
    m3 = reindex(SRC, out, date_col="ts", n_slices=5)
    assert m3["slices_skipped_resume"] == 4
    assert m3["rows_out"] == src_n


def test_reindex_replan_invalidates_only_changed(ray_session, out):
    reindex(SRC, out, date_col="ts", n_slices=5)
    # a different plan (6 slices) changes every slice spec → all re-run
    m = reindex(SRC, out, date_col="ts", n_slices=6)
    assert m["slices_skipped_resume"] == 0
    assert m["rows_out"] == _rows(SRC)


def test_reindex_transform_and_columns(ray_session, out):
    def double_value(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pc.multiply(t["value"], 2.0),
        )

    m = reindex(
        SRC, out, date_col="ts", n_slices=4,
        columns=["event_id", "value", "ts"], transform=double_value,
    )
    assert m["rows_out"] == _rows(SRC)
    got = duckdb.sql(
        f"SELECT round(sum(value), 6) FROM '{out}/part-*.parquet'"
    ).fetchone()[0]
    want = duckdb.sql(
        f"SELECT round(sum(value) * 2, 6) FROM '{SRC}'"
    ).fetchone()[0]
    assert got == want
    cols = duckdb.sql(f"SELECT * FROM '{out}/part-00000.parquet' LIMIT 0").columns
    assert sorted(cols) == ["event_id", "ts", "value"]


def test_reindex_manifest_lineage(ray_session, out):
    m = reindex(SRC, out, date_col="ts", n_slices=3)
    with open(f"{out}/manifest.json") as f:
        man = json.load(f)
    assert man["n_slices"] == 3 and man["complete"]
    assert len(man["entries"]) == 3
    for e in man["entries"]:
        assert os.path.exists(f"{out}/{e['file']}")
        assert e["rows_in"] == e["rows_out"]


def test_reindex_shrink_replan_removes_stale_parts(ray_session, out):
    reindex(SRC, out, date_col="ts", n_slices=6)
    m = reindex(SRC, out, date_col="ts", n_slices=4)
    assert m["n_slices"] == 4
    # the previous run's tail parts are gone — glob readers see ONLY the
    # new plan's output (no silent duplication)
    assert _rows(f"{out}/part-*.parquet") == _rows(SRC)
    assert not os.path.exists(f"{out}/part-00005.parquet")
    assert not os.path.exists(f"{out}/part-00005.done.json")
