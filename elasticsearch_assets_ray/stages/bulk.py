"""Bulk-action semantics — the native analog of the reference's
ElasticsearchBulkSender action stream (reference
packages/elasticsearch-asset-apis/src/elasticsearch-bulk-sender/
ElasticsearchBulkSender.ts:49-151: index/create/update/upsert/delete
action metadata, update_fields projection, `_key` routing).

Against a docstore, each ES action becomes a keyed merge:

- ``index``  → last-writer-wins per key        (:func:`last_writer_wins`)
- ``create`` → keep-first per key              (:func:`keep_first`)
- ``delete`` → anti-filter on a key set        (:func:`delete_keys`)
- ``update``/``update_fields`` → column-projection merge of an update
  stream into the base                          (:func:`update_fields`)
- ``upsert`` → update + insert-if-absent        (:func:`upsert`)
- ``_key`` routing → partitioned write          (:func:`routed_write`)

Scale notes: last_writer_wins / keep_first shuffle by key exactly once
(groupby); delete / update use broadcast semantics when the small side
fits in the object store (ray.put once, Arrow hash join per batch) —
never a per-batch reshipment, never an all-to-all for a small update set.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from elasticsearch_assets_ray.stages.relational import broadcast_join


def _pick_per_key(
    ds: ray.data.Dataset,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    *,
    pick: str,
) -> ray.data.Dataset:
    """One row per key: first row under ``order_cols`` ordering.

    Two-level: per-batch local pick (combiner) → coarse-group global pick.
    The shuffle moves ≤ one row per (batch, key), grouped by
    ``hash(keys) % n_groups`` so the final pick is one vectorized
    sort + first-mask per coarse group — NOT one Python call per distinct
    key (for an update stream keyed by e.g. customer that would be
    per-customer Python)."""
    from elasticsearch_assets_ray.stages.relational import key_group_column

    # sort by keys first so every key's rows are a contiguous run, then by
    # the pick order within the run
    key_sort = [(k, "ascending") for k in keys]
    sort_keys = list(order_cols)
    n_groups = 64

    def local(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=key_sort + sort_keys)
        b = batch.take(idx)
        # first row per key after sort
        mask = _first_mask(b, keys)
        b = b.filter(mask)
        return b.append_column("__grp", key_group_column(b, keys, n_groups))

    def global_pick(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__grp"])
        idx = pc.sort_indices(g, sort_keys=key_sort + sort_keys)
        g = g.take(idx)
        return g.filter(_first_mask(g, keys))

    local_ds = ds.map_batches(local, batch_format="pyarrow")
    return local_ds.groupby("__grp").map_groups(global_pick, batch_format="pyarrow")


def _first_mask(sorted_tbl: pa.Table, keys: list[str]) -> pa.Array:
    """Boolean mask marking the first row of each consecutive key run."""
    n = sorted_tbl.num_rows
    if n == 0:
        return pa.array([], type=pa.bool_())
    neq = None
    for k in keys:
        col = sorted_tbl[k].combine_chunks()
        d = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        d = d.fill_null(True)
        neq = d if neq is None else pc.or_(neq, d)
    import numpy as np

    out = np.ones(n, dtype=bool)
    out[1:] = neq.to_numpy(zero_copy_only=False)
    return pa.array(out)


def last_writer_wins(
    ds: ray.data.Dataset, keys: str | list[str], version_col: str,
    tie_break: str | None = None,
) -> ray.data.Dataset:
    """ES ``index`` action replay: keep the row with the greatest
    ``version_col`` per key (deterministic tie-break on ``tie_break``
    descending, e.g. a sequence number)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [(version_col, "descending")]
    if tie_break:
        order.append((tie_break, "descending"))
    return _pick_per_key(ds, keys, order, pick="first")


def keep_first(
    ds: ray.data.Dataset, keys: str | list[str], version_col: str,
    tie_break: str | None = None,
) -> ray.data.Dataset:
    """ES ``create`` action (put-if-absent): keep the row with the
    smallest ``version_col`` per key."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [(version_col, "ascending")]
    if tie_break:
        order.append((tie_break, "ascending"))
    return _pick_per_key(ds, keys, order, pick="first")


def delete_keys(
    ds: ray.data.Dataset, delete_set: pa.Table, keys: str | list[str]
) -> ray.data.Dataset:
    """ES ``delete`` action: drop rows whose key appears in ``delete_set``
    (broadcast anti-join; the delete set is small by construction)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return broadcast_join(ds, delete_set.select(keys), keys, join_type="anti")


def _require_unique_keys(updates: pa.Table, keys: list[str], op: str) -> None:
    """Duplicate update keys silently DUPLICATE base rows through the
    left-outer join (row-count inflation), unlike ES update semantics
    where later ops apply sequentially — reject them up front."""
    n_unique = updates.group_by(keys, use_threads=False).aggregate([]).num_rows
    if n_unique != updates.num_rows:
        raise ValueError(
            f"{op}: duplicate keys in updates ({updates.num_rows - n_unique} "
            "extra rows) — collapse them first (e.g. last_writer_wins)"
        )


def update_fields(
    base: ray.data.Dataset,
    updates: pa.Table,
    keys: str | list[str],
    fields: list[str],
) -> ray.data.Dataset:
    """ES ``update`` with ``update_fields`` projection (reference
    applyUpdateFields ElasticsearchBulkSender.ts:129-137): overwrite only
    ``fields`` on matched keys; unmatched base rows unchanged.  Updates
    are broadcast (ray.put once); each batch left-joins and coalesces."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    _require_unique_keys(updates, keys, "update_fields")
    upd = updates.select(keys + fields)
    upd = upd.rename_columns(keys + [f"__u_{f}" for f in fields])
    ref = ray.put(upd)

    def apply(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        j = batch.join(small, keys=keys, join_type="left outer", use_threads=False)
        cols = {}
        for name in batch.column_names:
            if name in fields:
                cols[name] = pc.coalesce(j[f"__u_{name}"], j[name])
            else:
                cols[name] = j[name]
        return pa.table(cols)

    return base.map_batches(apply, batch_format="pyarrow")


def upsert(
    base: ray.data.Dataset,
    updates: pa.Table,
    keys: str | list[str],
    fields: list[str],
    defaults: dict[str, object] | None = None,
) -> ray.data.Dataset:
    """ES ``upsert``: update matched keys' ``fields``; insert rows for
    unmatched update keys (base columns absent from the update take
    ``defaults``).  Inserts are appended as one extra block — the update
    set is the small side."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    updated = update_fields(base, updates, keys, fields)

    # insert side: update keys not present in base.  Inverted semi-join —
    # the UPDATE set is the small side: broadcast its keys once, each base
    # batch semi-joins and emits only its MATCHED update keys, so what
    # comes back to the driver is bounded by |updates| (deduped per
    # batch), never by |base| (the old code collected every base key).
    upd_keys = updates.select(keys)
    ukref = ray.put(upd_keys)

    def matched_keys(batch: pa.Table) -> pa.Table:
        m = batch.select(keys).join(
            ray.get(ukref), keys=keys, join_type="left semi", use_threads=False
        )
        return m.group_by(keys, use_threads=False).aggregate([])

    parts = list(
        base.map_batches(matched_keys, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    matched = pa.concat_tables(parts) if parts else upd_keys.slice(0, 0)
    if matched.num_rows:
        matched = matched.group_by(keys, use_threads=False).aggregate([])
    missing = updates.join(matched, keys=keys, join_type="left anti", use_threads=False)
    if missing.num_rows:
        schema = next(iter(updated.iter_batches(batch_format="pyarrow"))).schema
        cols = {}
        for f in schema.names:
            if f in missing.column_names:
                cols[f] = pc.cast(missing[f], schema.field(f).type)
            else:
                dv = (defaults or {}).get(f)
                cols[f] = pa.array([dv] * missing.num_rows, type=schema.field(f).type)
        insert_tbl = pa.table(cols)
        return updated.union(ray.data.from_arrow(insert_tbl))
    return updated


#: registered update scripts (the painless-script registry analog) —
#: name → vectorized callable.  A script receives the joined batch (base
#: columns + ``__u_<col>`` update params + ``__matched`` bool) and
#: returns the replacement values for the columns it updates.
SCRIPTS: dict[str, callable] = {}


def register_script(name: str):
    def deco(fn):
        SCRIPTS[name] = fn
        return fn

    return deco


def scripted_update(
    base: ray.data.Dataset,
    updates: pa.Table,
    keys: str | list[str],
    script: str | callable,
    params: list[str],
) -> ray.data.Dataset:
    """ES scripted update (reference applyScript
    ElasticsearchBulkSender.ts:139-151: a painless script fed
    ``script_params`` extracted from the update record).  Here the script
    is a registered *vectorized* Python UDF: updates are broadcast once
    (``ray.put``); each base batch left-joins its update params and hands
    the joined Arrow table to the script, which returns ``{col: array}``
    replacements applied only where ``__matched``.  Never per-row Python;
    unmatched rows pass through untouched."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    fn = SCRIPTS[script] if isinstance(script, str) else script
    _require_unique_keys(updates, keys, "scripted_update")
    upd = updates.select(keys + params)
    upd = upd.rename_columns(keys + [f"__u_{p}" for p in params])
    upd = upd.append_column("__matched", pa.array([True] * upd.num_rows))
    ref = ray.put(upd)

    def apply(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        j = batch.join(small, keys=keys, join_type="left outer", use_threads=False)
        j = j.set_column(
            j.schema.get_field_index("__matched"),
            "__matched",
            pc.fill_null(j["__matched"], False),
        )
        new_cols = fn(j)
        out = {}
        for name in batch.column_names:
            if name in new_cols:
                out[name] = pc.if_else(j["__matched"], new_cols[name], j[name])
            else:
                out[name] = j[name]
        return pa.table(out)

    return base.map_batches(apply, batch_format="pyarrow")


def update_by_query(
    base: ray.data.Dataset,
    key: str,
    matched_ids,
    script: str | callable,
    params: list[str] | tuple = (),
) -> ray.data.Dataset:
    """ES ``_update_by_query``: the query half runs on the search engine
    (score-free ``match_ids``, distributed over the serving shards), and
    the matched key set — bounded by the match count, never the corpus —
    is broadcast once into a :func:`scripted_update` pass over the
    source dataset.  Exactly ES's architecture: search selects, then a
    bulk scripted update applies (the reference pairs its reader query
    with UpdateActions the same way, ElasticsearchBulkSender.ts:139-151)."""
    import numpy as np

    ids = np.unique(np.asarray(matched_ids, dtype=np.int64))
    upd = pa.table({key: pa.array(ids)})
    return scripted_update(base, upd, key, script, list(params))


def rekey(
    base: ray.data.Dataset,
    moves: pa.Table,
    key: str,
    *,
    delete_col: str = "_delete_id",
) -> ray.data.Dataset:
    """One-pass re-key — the reference's paired ``_delete_id`` bulk
    metadata (createBulkMetadata ElasticsearchBulkSender.ts:49-63): each
    move record DELETES its old id and INDEXES the record under its new
    ``key`` in the same bulk pass.  ``moves`` carries the full new row
    plus ``delete_col`` (the old key).  ES index semantics: a new key
    that already exists in the base overwrites it, so the base drops
    keys ∈ old ∪ new in one broadcast anti-join and the move rows are
    appended as one extra block — exactly one pass over the base, never
    separate delete + index scans."""
    if delete_col not in moves.column_names:
        raise ValueError(f"moves must carry {delete_col!r} (the old key)")
    new_rows = moves.drop_columns([delete_col])
    if key not in new_rows.column_names:
        raise ValueError(f"moves must carry the new {key!r}")
    # duplicate new keys would make the overwrite order ambiguous
    n_unique = new_rows.group_by([key], use_threads=False).aggregate([]).num_rows
    if n_unique != new_rows.num_rows:
        raise ValueError("duplicate new keys in moves — re-key order is ambiguous")
    old_keys = moves.select([delete_col]).rename_columns([key])
    drop = pa.concat_tables([old_keys, new_rows.select([key])])
    drop = drop.group_by([key], use_threads=False).aggregate([])
    survived = delete_keys(base, drop, key)
    return survived.union(ray.data.from_arrow(new_rows))


def dead_letter_split(
    ds: ray.data.Dataset,
    required_cols: list[str],
    key_col: str,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """K1 dead-letter analog (reference elasticsearch_bulk/processor.ts:39-44:
    rejected records go to a dead-letter queue, accepted ones onward).

    A record is rejected when its key is null or any required column is
    null.  Returns (accepted, dead_letter) as two lazy datasets over the
    same tagged intermediate — the tag is computed once per batch."""

    def tag(batch: pa.Table) -> pa.Table:
        ok = pc.is_valid(batch[key_col])
        for c in required_cols:
            ok = pc.and_(ok, pc.is_valid(batch[c]))
        return batch.append_column("__ok", ok)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def keep(flag: bool):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["__ok"], flag)).drop_columns(["__ok"])

        return f

    return (
        tagged.map_batches(keep(True), batch_format="pyarrow"),
        tagged.map_batches(keep(False), batch_format="pyarrow"),
    )


def routed_write(
    ds: ray.data.Dataset, out_dir: str, route_col: str
) -> None:
    """``_key`` routing analog (reference createRoute
    ElasticsearchBulkSender.ts:37-47): partitioned Parquet write, one
    directory per route value — the resumable-output layout."""
    ds.write_parquet(out_dir, partition_cols=[route_col])
