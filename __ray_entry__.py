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

from elasticsearch_assets_ray.pipelines.registry import ORACLES, QUERIES


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (SPIMI →
    term-shuffle merge → compressed segments) and serve the pinned query
    set through the block-max BM25 engine."""
    from elasticsearch_assets_ray.pipelines.registry import q_search_topk

    return q_search_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
