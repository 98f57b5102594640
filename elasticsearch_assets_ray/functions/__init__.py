"""Record/batch-level functions — the per-record transformation layer
(the Teraslice "functions" analog: reusable kernels independent of any
pipeline).  Stage classes (actor-pool setup) live in ``..stages``; these
are the pure callables they and user pipelines compose.
"""

from elasticsearch_assets_ray.index.build import sha256_column, term_shard  # noqa: F401
from elasticsearch_assets_ray.query.bm25 import (  # noqa: F401
    idf,
    score_accumulate,
    sort_topk,
    tf_saturation,
)
from elasticsearch_assets_ray.query.parser import parse_query  # noqa: F401
from elasticsearch_assets_ray.stages.dedup import (  # noqa: F401
    band_keys,
    jaccard,
    ngram_jaccard,
    ngram_jaccard_pairs,
    simhash,
)
from elasticsearch_assets_ray.stages.scrub import (  # noqa: F401
    benchmark_shingles,
    contamination_stats,
    pii_stats,
    redact_pii,
)
from elasticsearch_assets_ray.stages.textstats import (  # noqa: F401
    fingerprint,
    polynomial_hash,
    quality_stats,
    token_stats,
)
from elasticsearch_assets_ray.stages.tokenizer import (  # noqa: F401
    doc_term_freqs,
    tokenize_column,
    tokenize_text,
)
