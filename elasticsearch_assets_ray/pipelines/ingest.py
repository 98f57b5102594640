"""ES ingest pipelines — ordered processor chains applied per batch.

The ES `_ingest/pipeline` API registers a named list of processors that
every incoming document passes through before indexing
(set / rename / remove / lowercase / uppercase / convert / gsub /
script / …).  The Ray-native analog is a validated processor chain
compiled ONCE into a callable applied with ``map_batches`` — each
processor is a vectorized Arrow kernel, never a per-row Python loop —
and it composes directly with the reindex pipeline's ``transform=``
seam and the bulk sender (the reference's processor slot in its
reader → processor → sender jobs, SURVEY §3).

Script processors resolve from the SAME registry as scripted bulk
updates (stages/bulk.register_script) — one script surface for both
write paths, like ES stored scripts.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

from elasticsearch_assets_ray.stages.bulk import SCRIPTS

_CONVERT_TYPES = {
    "int": pa.int64(),
    "long": pa.int64(),
    "float": pa.float64(),
    "double": pa.float64(),
    "string": pa.string(),
}


class IngestPipeline:
    """Validated processor chain.  Each processor is a dict with a
    ``type`` plus its parameters; unknown types / missing params raise at
    CONSTRUCTION (the ES PUT-pipeline validation contract), not at batch
    time.  Instances are callables over ``pa.Table`` batches, so
    ``ds.map_batches(pipeline)`` / ``reindex(..., transform=pipeline)``
    just work."""

    def __init__(self, processors: list[dict]):
        self._steps: list[Callable[[pa.Table], pa.Table]] = []
        self.description: list[str] = []
        for i, p in enumerate(processors):
            if not isinstance(p, dict) or "type" not in p:
                raise ValueError(f"processor {i}: expected a dict with 'type'")
            kind = p["type"]
            build = getattr(self, f"_mk_{kind}", None)
            if build is None:
                raise ValueError(f"processor {i}: unknown type {kind!r}")
            self._steps.append(build(i, p))
            self.description.append(kind)

    # ---- processor factories (validate eagerly, return batch fns) ----
    @staticmethod
    def _need(i: int, p: dict, *keys: str):
        for k in keys:
            if k not in p:
                raise ValueError(f"processor {i} ({p['type']}): missing {k!r}")

    def _mk_set(self, i, p):
        self._need(i, p, "field", "value")
        field, value = p["field"], p["value"]

        def run(t: pa.Table) -> pa.Table:
            arr = pa.array([value] * t.num_rows)
            if field in t.column_names:
                t = t.set_column(t.column_names.index(field), field, arr)
            else:
                t = t.append_column(field, arr)
            return t

        return run

    def _mk_rename(self, i, p):
        self._need(i, p, "field", "target_field")
        field, target = p["field"], p["target_field"]

        def run(t: pa.Table) -> pa.Table:
            if field not in t.column_names:
                raise KeyError(f"rename: no field {field!r}")
            return t.rename_columns(
                [target if c == field else c for c in t.column_names]
            )

        return run

    def _mk_remove(self, i, p):
        self._need(i, p, "field")
        field = p["field"]

        def run(t: pa.Table) -> pa.Table:
            if field not in t.column_names:
                raise KeyError(f"remove: no field {field!r}")
            return t.drop_columns([field])

        return run

    def _mk_lowercase(self, i, p):
        self._need(i, p, "field")
        return self._case_fn(p["field"], pc.utf8_lower)

    def _mk_uppercase(self, i, p):
        self._need(i, p, "field")
        return self._case_fn(p["field"], pc.utf8_upper)

    @staticmethod
    def _case_fn(field, kernel):
        def run(t: pa.Table) -> pa.Table:
            idx = t.column_names.index(field)
            return t.set_column(idx, field, kernel(t[field]))

        return run

    def _mk_convert(self, i, p):
        self._need(i, p, "field", "to")
        if p["to"] not in _CONVERT_TYPES:
            raise ValueError(
                f"processor {i} (convert): unknown target {p['to']!r} "
                f"({sorted(_CONVERT_TYPES)})"
            )
        field, typ = p["field"], _CONVERT_TYPES[p["to"]]

        def run(t: pa.Table) -> pa.Table:
            idx = t.column_names.index(field)
            return t.set_column(idx, field, t[field].cast(typ))

        return run

    def _mk_gsub(self, i, p):
        self._need(i, p, "field", "pattern", "replacement")
        field, pat, rep = p["field"], p["pattern"], p["replacement"]
        # validate the RE2 pattern eagerly on a one-element probe (an
        # EMPTY array skips compilation — pyarrow quirk)
        pc.replace_substring_regex(pa.array(["x"]), pattern=pat, replacement=rep)

        def run(t: pa.Table) -> pa.Table:
            idx = t.column_names.index(field)
            return t.set_column(
                idx, field,
                pc.replace_substring_regex(t[field], pattern=pat, replacement=rep),
            )

        return run

    def _mk_script(self, i, p):
        self._need(i, p, "name")
        if p["name"] not in SCRIPTS:
            raise ValueError(
                f"processor {i} (script): no registered script {p['name']!r}"
            )
        fn = SCRIPTS[p["name"]]
        params = p.get("params", {})

        def run(t: pa.Table) -> pa.Table:
            # the registry convention (stages/bulk): a vectorized UDF
            # returning {column: replacement array}
            new_cols = fn(t, **params)
            if not isinstance(new_cols, dict):
                raise TypeError("script processors must return {col: array}")
            for col, arr in new_cols.items():
                if col in t.column_names:
                    t = t.set_column(t.column_names.index(col), col, arr)
                else:
                    t = t.append_column(col, arr)
            return t

        return run

    # ---- application ----
    def __call__(self, batch: pa.Table) -> pa.Table:
        for step in self._steps:
            batch = step(batch)
        return batch

    def run(self, ds):
        """Apply to a Dataset (vectorized, streaming)."""
        return ds.map_batches(self, batch_format="pyarrow")
