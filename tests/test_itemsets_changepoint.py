"""frequent_item_sets (mask closure) + change_point (step detector)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_assets_ray.query.pipeline_aggs import change_point
from elasticsearch_assets_ray.stages.itemsets import frequent_item_sets


def test_frequent_item_sets_hand_case():
    t = pa.table(
        {
            "u": [1, 1, 1, 2, 2, 3, 3, 3, 3],
            "it": ["a", "b", "a", "b", "c", "a", "b", "c", "c"],
        }
    )
    out = frequent_item_sets(
        ray.data.from_arrow(t).repartition(3), "u", "it",
        ["a", "b", "c"], min_support=1, min_size=2,
    )
    got = dict(zip(out["itemset"].to_pylist(), out["support"].to_pylist()))
    # u1={a,b}, u2={b,c}, u3={a,b,c}
    assert got == {"a+b": 2, "a+c": 1, "b+c": 2, "a+b+c": 1}
    # min_support filters
    out2 = frequent_item_sets(
        ray.data.from_arrow(t).repartition(2), "u", "it",
        ["a", "b", "c"], min_support=2, min_size=2,
    )
    assert sorted(out2["itemset"].to_pylist()) == ["a+b", "b+c"]
    with pytest.raises(ValueError):
        frequent_item_sets(ray.data.from_arrow(t), "u", "it", [])


def test_change_point_step():
    # clean step: 10,10,10,10 -> 30,30,30,30 : split at index 4 (new
    # regime starts at 1-based bucket 5), full SSE drop = between-var
    t = pa.table({"n": [10, 10, 10, 10, 30, 30, 30, 30]})
    cp = change_point(t, "n")
    assert cp["index"] == 5
    # sse0 = total SS around grand mean 20 = 8*100 = 800; best sse = 0
    assert cp["score"] == pytest.approx(800.0)
    # tie-break: a flat series picks the SMALLEST split index
    flat = pa.table({"n": [5, 5, 5, 5, 5]})
    assert change_point(flat, "n")["index"] == 2
    with pytest.raises(ValueError):
        change_point(pa.table({"n": [1, 2, 3]}), "n")


def test_change_point_spike_is_isolated():
    # a single spike: the step detector places the boundary next to it
    y = [10] * 6 + [90] + [10] * 5
    cp = change_point(pa.table({"n": y}), "n")
    assert cp["index"] in (7, 8)  # boundary hugs the spike
    assert cp["score"] > 0
