"""EQL sequence (funnel) semantics."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from elasticsearch_assets_ray.stages.eql import eql_sequence


def _ds(rows):
    t = pa.table(
        {
            "u": [r[0] for r in rows],
            "e": [r[1] for r in rows],
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    return ray.data.from_arrow(t).repartition(2)


def _steps(*names):
    return [
        (lambda n: (lambda b: pc.equal(b["e"], pa.scalar(n))))(n) for n in names
    ]


def _run(ds, names, span):
    return eql_sequence(
        ds, _steps(*names), key_col="u", ts_col="ts", maxspan_us=span
    ).to_pydict()


def test_basic_chain_and_span():
    rows = [
        (1, "a", 100), (1, "b", 200), (1, "c", 300),   # full chain, span 200
        (2, "a", 100), (2, "c", 150), (2, "b", 200),   # c before b: no chain
        (3, "a", 100), (3, "b", 200), (3, "c", 5000),  # span 4900 too wide
    ]
    out = _run(_ds(rows), ["a", "b", "c"], span=1000)
    assert out["k"] == [1]
    assert out["t_start"] == [100] and out["t_end"] == [300]
    # widening the span admits user 3
    out2 = _run(_ds(rows), ["a", "b", "c"], span=10000)
    assert out2["k"] == [1, 3]


def test_greedy_earliest_is_optimal_per_start():
    # a at 100; b at 150 and 400; c at 500. greedy takes b=150 -> c=500
    # (span 400). taking b=400 gives the same c; both within span.
    rows = [(1, "a", 100), (1, "b", 150), (1, "b", 400), (1, "c", 500)]
    out = _run(_ds(rows), ["a", "b", "c"], span=450)
    assert out["k"] == [1] and out["t_end"] == [500]


def test_earliest_start_reported():
    rows = [
        (1, "a", 100), (1, "a", 250), (1, "b", 300), (1, "c", 320),
    ]
    # start 100 has span 220 > 200 -> invalid; start 250 valid (span 70)
    out = _run(_ds(rows), ["a", "b", "c"], span=200)
    assert out["t_start"] == [250]


def test_strictly_increasing_ts():
    rows = [(1, "a", 100), (1, "b", 100), (1, "c", 101)]
    # b at the SAME ts as a does not qualify (strict >)
    out = _run(_ds(rows), ["a", "b", "c"], span=100)
    assert out["k"] == []
    with pytest.raises(ValueError):
        _run(_ds(rows), ["a"], span=10)
