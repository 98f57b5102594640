"""ES _transform pivot: continuous ticks == one batch run, exactly."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from elasticsearch_assets_ray.stages.relational import AggSpec
from elasticsearch_assets_ray.stages.transform import PivotTransform


def _mk(tmp_path, hint=16):
    return PivotTransform(
        str(tmp_path / "dest"),
        ["k"],
        [
            AggSpec("n", "v", "count"),
            AggSpec("s_cents", "v", "sum_cents"),
            AggSpec("avg_v", "v", "mean_cents"),
        ],
        "ts",
        distinct_hint=hint,
    )


def _data():
    return pa.table(
        {
            "k": ["a", "b", "a", "b", "a", "c"],
            "v": [1.25, 2.0, 3.5, 0.75, 10.0, 4.0],
            "ts": [1, 2, 3, 4, 5, 6],
        }
    )


def test_continuous_ticks_equal_batch(tmp_path):
    t = _data()
    full = ray.data.from_arrow(t).repartition(3)
    # batch reference
    ref = _mk(tmp_path / "ref")
    ref.tick(full)
    want = ref.result().sort_by([("k", "ascending")]).to_pydict()
    # two continuous ticks: ts <= 3 first, then the full stream
    tr = _mk(tmp_path / "cont")
    first = ray.data.from_arrow(t.filter(pc.less_equal(t["ts"], 3)))
    assert tr.tick(first) > 0
    assert tr.checkpoint() == 3
    assert tr.tick(full) > 0
    assert tr.checkpoint() == 6
    got = tr.result().sort_by([("k", "ascending")]).to_pydict()
    assert got == want
    # idempotent no-op tick: nothing newer
    assert tr.tick(full) == 0
    assert tr.result().sort_by([("k", "ascending")]).to_pydict() == want
    # ground truth
    dd = duckdb.sql(
        "SELECT k, count(*) AS n, sum(CAST(round(v*100) AS BIGINT)) AS s "
        "FROM t GROUP BY k ORDER BY k"
    ).fetchall()
    assert [(k, n, s) for k, n, s in zip(got["k"], got["n"], got["s_cents"])] == dd


def test_spec_change_resets_checkpoint(tmp_path):
    t = _data()
    tr = _mk(tmp_path)
    tr.tick(ray.data.from_arrow(t))
    assert tr.checkpoint() == 6
    # different agg spec over the same dest -> checkpoint invalidated
    tr2 = PivotTransform(
        str(tmp_path / "dest"), ["k"], [AggSpec("n", "v", "count")], "ts"
    )
    assert tr2.checkpoint() is None


def test_cardinality_guard(tmp_path):
    big = pa.table(
        {
            "k": [f"k{i}" for i in range(500)],
            "v": [1.0] * 500,
            "ts": list(range(500)),
        }
    )
    tr = PivotTransform(
        str(tmp_path / "dest"), ["k"], [AggSpec("n", "v", "count")], "ts",
        distinct_hint=2,
    )
    with pytest.raises(ValueError, match="cardinality"):
        tr.tick(ray.data.from_arrow(big).repartition(4))
