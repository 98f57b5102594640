"""Source-format ingestion — the reference reads JSON documents from
Elasticsearch; a user switching to this engine lands their data as
Parquet first.  These helpers run the conversion AS a Ray Data pipeline
(streaming, partitioned output) so ingestion scales like every other
stage:

- :func:`jsonl_to_parquet` — newline-delimited JSON → partitioned
  Parquet (the DataEntity-stream analog);
- :func:`csv_to_parquet` — CSV with header → partitioned Parquet;
- :func:`ingest` — extension-dispatching front door.

Output is a DIRECTORY of Parquet files (one per block) — the resumable,
plannable layout ``build_index``/``plan_partitions`` expects.
"""

from __future__ import annotations

import ray.data


def jsonl_to_parquet(
    src: str | list[str],
    out_dir: str,
    *,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
    unwrap_source: bool = False,
) -> str:
    """Stream NDJSON → Parquet.  ``columns`` prunes after parse (JSON has
    no projection pushdown).

    ``unwrap_source=True`` handles Elasticsearch hit envelopes — the
    shape a scroll/dump of the reference's indexes actually produces:
    ``{"_id": ..., "_index": ..., "_source": {fields...}}`` flattens to
    the ``_source`` fields plus an ``_id`` column (the ``_key`` metadata
    the reference attaches to DataEntities,
    docs/asset/apis/elasticsearch_reader_api.md:583-596)."""
    ds = ray.data.read_json(src, override_num_blocks=override_num_blocks)
    if unwrap_source:
        import pyarrow as pa

        def unwrap(batch: "pa.Table") -> "pa.Table":
            flat = batch["_source"]
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            cols = {"_id": batch["_id"]}
            for f in flat.type:
                # the envelope _id is the document key; a _source field of
                # the same name must not clobber it
                name = f.name if f.name not in cols else f"_source{f.name}"
                cols[name] = flat.field(f.name)
            return pa.table(cols)

        ds = ds.map_batches(unwrap, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    ds.write_parquet(out_dir)
    return out_dir


def csv_to_parquet(
    src: str | list[str],
    out_dir: str,
    *,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> str:
    ds = ray.data.read_csv(src, override_num_blocks=override_num_blocks)
    if columns:
        ds = ds.select_columns(columns)
    ds.write_parquet(out_dir)
    return out_dir


def ingest(src: str, out_dir: str, **kw) -> str:
    """Dispatch on extension: .jsonl/.ndjson/.json → JSON reader,
    .csv → CSV reader, .parquet passes through unchanged."""
    low = src.lower()
    if low.endswith((".jsonl", ".ndjson", ".json")):
        return jsonl_to_parquet(src, out_dir, **kw)
    if low.endswith(".csv"):
        return csv_to_parquet(src, out_dir, **kw)
    if low.endswith(".parquet"):
        return src
    raise ValueError(f"unsupported source format: {src!r}")
