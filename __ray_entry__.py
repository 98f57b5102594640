"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (fulltext index build + BM25
block-max top-k search) over /root/testdata/sf0.001.  ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data operators (dedup / similarity / text analysis).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from elasticsearch_assets_ray.pipelines.gates import GATE_ORACLES, GATES


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (SPIMI →
    term-shuffle merge → compressed segments) and serve the pinned query
    set through the block-max BM25 engine."""
    from elasticsearch_assets_ray.pipelines.registry import q_search_topk

    return q_search_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # Consolidated gate layer (<= 50 entries; the driver verifies at most
    # ~50): every operator from pipelines.registry sits under exactly one
    # gate here, either 1:1 or inside a schema-aligned composite.
    return dict(GATES)


def oracle_sql() -> dict[str, str]:
    return dict(GATE_ORACLES)
