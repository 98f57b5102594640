"""Invariant: every registry operator sits under a driver gate.

The external driver verifies at most ~50 ``queries()`` entries, so the
gate layer (pipelines/gates.py) re-packages the full registry into <= 50
composite gates.  Round 3 lost CORRECTNESS rows for 17 operators because
late additions never joined a composite; this test pins the invariant so
a new registry entry without gate membership fails CI immediately.
"""

import re

from elasticsearch_assets_ray.pipelines import gates as G
from elasticsearch_assets_ray.pipelines import registry as R

_GATES_SRC = open(G.__file__.rstrip("c")).read()


def test_every_registry_query_is_gated():
    uncovered = [
        n for n in R.QUERIES if not re.search(rf'["\']{re.escape(n)}["\']', _GATES_SRC)
    ]
    assert uncovered == [], f"registry queries not under any driver gate: {uncovered}"


def test_driver_gate_budget():
    # the driver checks the FIRST 50 queries() entries in dict order
    assert len(G.GATES) <= 50
    # every gate that claims an oracle has one, and vice versa
    assert set(G.GATE_ORACLES) <= set(G.GATES)


def test_every_registry_query_has_oracle():
    missing = [n for n in R.QUERIES if n not in R.ORACLES]
    assert missing == [], f"registry queries without SQL oracles: {missing}"
