from elasticsearch_assets_ray.pipelines.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    documents_index,
)
