"""elasticsearch_assets_ray — a Ray-Data-native fulltext index build + BM25
query engine with the query/data-processing capabilities of
terascope/elasticsearch-assets, built from scratch on ray.data.Dataset.

The reference (see /root/reference, SURVEY.md) is the distributed I/O and
partitioning layer of a search pipeline; the index internals are delegated to
Elasticsearch.  This package implements BOTH halves natively on Ray Data:

- ``index``   — SPIMI posting-list construction in ``map_batches`` over
  zero-copy Arrow, groupby(term) shuffle-merge, delta+varint block
  compression with per-block max-impact metadata, docstore, per-partition
  checkpoint manifests (resume without re-tokenizing).
- ``query``   — query parsing, BM25 (k1=1.2, b=0.75) and block-max WAND
  top-k served from an actor pool holding loaded index shards, plus the
  brute-force reference scorer (the rank-identity oracle).
- ``sources`` — the reference's reader surface (date-range partitioned scan,
  ID-prefix/keyspace scan, projection, count) re-expressed as Dataset plans.
- ``pipelines`` — bulk-action semantics (index/create/update/upsert/delete,
  routing) as keyed merges.
- ``functions`` — training-data ops: dedup (exact, minhash-LSH, simhash,
  n-gram jaccard, embedding cosine), similarity search, text analysis,
  multimodal stubs.
- ``state``   — keyed state-storage lookup (mget/mset analog) actors.

Nothing in this package calls ``ray.init()``; callers own the Ray session.
"""

from elasticsearch_assets_ray.index.build import IndexConfig, build_index  # noqa: F401
from elasticsearch_assets_ray.query.engine import QueryEngineActor, Searcher  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):  # lazy heavy imports
    if name == "ShardedSearcher":
        from elasticsearch_assets_ray.query.sharded import ShardedSearcher

        return ShardedSearcher
    if name == "IncrementalIndex":
        from elasticsearch_assets_ray.index.incremental import IncrementalIndex

        return IncrementalIndex
    if name == "MultiSearcher":
        from elasticsearch_assets_ray.index.incremental import MultiSearcher

        return MultiSearcher
    if name == "ReaderAPI":
        from elasticsearch_assets_ray.sources.reader_api import ReaderAPI

        return ReaderAPI
    if name == "ReaderAPIFactory":
        from elasticsearch_assets_ray.sources.reader_api import ReaderAPIFactory

        return ReaderAPIFactory
    if name == "ReaderSlice":
        from elasticsearch_assets_ray.sources.reader_api import ReaderSlice

        return ReaderSlice
    if name == "SpacesReaderAPI":
        from elasticsearch_assets_ray.sources.spaces import SpacesReaderAPI

        return SpacesReaderAPI
    if name == "SpacesAPIConfig":
        from elasticsearch_assets_ray.sources.spaces import SpacesAPIConfig

        return SpacesAPIConfig
    if name == "VersionedStore":
        from elasticsearch_assets_ray.state.versioned import VersionedStore

        return VersionedStore
    raise AttributeError(name)
