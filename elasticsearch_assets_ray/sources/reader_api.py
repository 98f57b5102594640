"""ReaderAPI facade — the shape of the reference's
``ElasticsearchReaderAPI`` (packages/elasticsearch-asset-apis/src/
elasticsearch-reader-api/ElasticsearchReaderAPI.ts) over our native
engine: slices in, record batches out.

- :class:`ReaderSlice` — the partition descriptor
  (reference interfaces.ts:138-168: ``{start?, end?, keys?, count?,
  query?, limit?}``).
- :meth:`ReaderAPI.count` — the slicers' count probe (F3).
- :meth:`ReaderAPI.fetch` — execute a slice: date range + key prefixes +
  an optional fulltext query (Q1/Q2/Q4), with the three response types of
  the reference (interfaces.ts:319-323): ``data_entities`` (list of
  dicts), ``data_frame`` (Arrow table) and ``raw`` (Arrow IPC bytes —
  the dfjson/Buffer analog).
- :meth:`ReaderAPI.make_date_slicer_ranges` /
  :meth:`make_id_slicer_ranges` — the slicer planning entry points
  (ElasticsearchReaderAPI.ts:475-563 / :383-439) mapped onto partition
  planning and keyspace DFS.

The fulltext part of a slice needs a built index (``index_dir``); pure
date/key slices work straight off the docstore/table parquet.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


@dataclass
class ReaderSlice:
    """Partition descriptor (reference interfaces.ts:138-168)."""

    start: object | None = None  # inclusive lower date bound
    end: object | None = None  # exclusive upper date bound
    keys: list[str] = field(default_factory=list)  # key prefixes (OR)
    query: str | None = None  # fulltext query (Q4)
    limit: int | None = None
    count: int | None = None  # filled by slicers (size hint)
    # True: ``keys`` match by EQUALITY, not prefix.  Emitted by the DFS
    # when a hot prefix is itself a key (KeySlice.exact) — translating it
    # to starts_with would overlap every descendant slice and double-fetch
    # those rows.
    keys_exact: bool = False


class ReaderAPI:
    """Slice-oriented reads over a Parquet table (+ optional index)."""

    def __init__(
        self,
        table_path: str,
        *,
        date_col: str | None = None,
        key_col: str | None = None,
        index_dir: str | None = None,
        id_col: str = "doc_id",
        max_result_window: int | None = None,
        serving_shards: int = 0,
    ):
        self.table_path = table_path
        self.date_col = date_col
        self.key_col = key_col
        self.id_col = id_col
        # F4 result-window guard (reference ElasticsearchReaderAPI.ts:
        # 287-295: slice size must not exceed index.max_result_window).
        # None (default) = unbounded — exact partition reads have no
        # window; set it to mirror ES-compatible deployments.
        self.max_result_window = max_result_window
        self._ds = pads.dataset(table_path)
        self._searcher = None
        if index_dir:
            if serving_shards > 1:
                # doc-partitioned scatter-gather serving (actor pool):
                # the 100 TB layout — one node cannot hold the index;
                # results are rank-identical to the single searcher
                from elasticsearch_assets_ray.query.sharded import ShardedSearcher

                # fractional CPU: shard workers are mostly-idle RPC
                # servers; at num_cpus=1 a pool pins whole cores and Ray
                # Data stages in the same small session starve (observed
                # deadlock — see pipelines/registry._sharded note)
                self._searcher = ShardedSearcher(
                    index_dir,
                    n_shards=serving_shards,
                    use_actors=True,
                    num_cpus=0.25,
                )
            else:
                from elasticsearch_assets_ray.query.engine import Searcher

                self._searcher = Searcher(index_dir)
        self.records_fetched = 0  # F6 gauge analog
        self.count_probes = 0  # slicer count-probe gauge
        self._keyspace = None  # lazy SortedKeyspace (see keyspace())

    def metrics(self) -> dict:
        """Reader gauges (reference ReaderAPIFetcher.ts:22-33 exposes
        records-fetched / slice counters to Teraslice's metrics API);
        engine-side searcher gauges are folded in when an index backs
        this reader."""
        out = {
            "records_fetched": self.records_fetched,
            "count_probes": self.count_probes,
        }
        if self._searcher is not None:
            out["engine"] = self._searcher.metrics()
        return out

    def shutdown(self) -> None:
        """Release serving resources (the sharded actor pool, when one
        backs this reader).  Idempotent; the reader stays usable for
        plain parquet scans but index-backed calls will re-raise from
        the searcher."""
        if self._searcher is not None and hasattr(self._searcher, "shutdown"):
            self._searcher.shutdown()
        self._searcher = None

    # ---------- predicates ----------
    def _filter(self, s: ReaderSlice):
        filt = None

        def and_(a, b):
            return b if a is None else (a & b)

        if s.start is not None:
            filt = and_(filt, pc.field(self.date_col) >= s.start)
        if s.end is not None:
            filt = and_(filt, pc.field(self.date_col) < s.end)
        if s.keys:
            kf = None
            for p in s.keys:
                if s.keys_exact:
                    f = pc.field(self.key_col) == p
                else:
                    f = pc.starts_with(pc.field(self.key_col), p)
                kf = f if kf is None else (kf | f)
            filt = and_(filt, kf)
        return filt

    # ---------- API surface ----------
    def count(self, s: ReaderSlice) -> int:
        """F3: the count probe every slicer decision uses.  A fulltext
        slice counts EVERY matching doc (the ES `count` call has no
        result window), not the fetch top-k."""
        self.count_probes += 1
        if s.query:
            if self._searcher is None:
                raise ValueError("fulltext slice needs index_dir")
            # SCORE-FREE match cardinality: an ES count never scores, and
            # BM25 arithmetic is the expensive half of a common-term probe
            ids = self._searcher.match_ids(s.query)
            filt = self._filter(s)
            if filt is None:
                n = ids.size
            else:
                # hydrate ONLY the columns the date/key filter references —
                # a count probe on a common term must not materialize
                # stored content for a large fraction of the corpus
                fcols = [c for c in (self.date_col, self.key_col) if c]
                n = self._searcher.hydrate(ids, columns=fcols).filter(filt).num_rows
            # an explicit slice limit caps what fetch would return
            return min(n, s.limit) if s.limit is not None else n
        filt = self._filter(s)
        if filt is None:
            return self._ds.count_rows()
        return self._ds.count_rows(filter=filt)

    def _fetch_table(self, s: ReaderSlice, columns: list[str] | None = None) -> pa.Table:
        if s.query:
            if self._searcher is None:
                raise ValueError("fulltext slice needs index_dir")
            k = s.limit or 10
            res = self._searcher.search(s.query, k=k)
            ids = res["doc_id"].to_numpy(zero_copy_only=False)
            t = self._searcher.hydrate(ids, columns=columns)
            # apply date/key predicate post-hoc if present
            filt = self._filter(s)
            if filt is not None:
                t = t.filter(filt)
            return t
        filt = self._filter(s)
        t = self._ds.to_table(columns=columns, filter=filt)
        if s.limit is not None:
            t = t.slice(0, s.limit)
        return t

    def fetch(
        self,
        s: ReaderSlice,
        *,
        response_type: str = "data_frame",
        columns: list[str] | None = None,
    ):
        """Execute a slice.  response_type ∈ {data_entities, data_frame,
        raw} (reference FetchResponseType, interfaces.ts:319-323)."""
        if (
            self.max_result_window is not None
            and s.limit is not None
            and s.limit > self.max_result_window
        ):
            raise ValueError(
                f"your size of {s.limit} is larger than the result window "
                f"of {self.max_result_window} (reference F4 guard)"
            )
        t = self._fetch_table(s, columns=columns)
        self.records_fetched += t.num_rows
        if response_type == "data_frame":
            return t
        if response_type == "data_entities":
            return t.to_pylist()
        if response_type == "raw":
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, t.schema) as w:
                w.write_table(t)
            return sink.getvalue().to_pybytes()
        raise ValueError(f"unknown response_type {response_type!r}")

    # ---------- slicer planning ----------
    @staticmethod
    def _fire_hook(hook, entries: list[dict]) -> None:
        """DateSlicerMetadataHook analog (reference interfaces.ts:259-275,
        invoked ElasticsearchReaderAPI.ts:557-561): after planning, the
        caller-supplied hook observes the DISCOVERED interval and date
        range per slicer — `{slicer_id: {start, end, interval}}` with
        ISO-8601 strings and interval as (seconds, "s"); the adaptive
        (count-probed) path adds a `count` key per slice.  The reference
        uses it to write the discovered interval back into job
        metadata."""
        if hook is None:
            return
        hook({i: e for i, e in enumerate(entries)})

    def make_date_slicer_ranges(
        self, n_slicers: int, *, hook=None
    ) -> list[ReaderSlice]:
        """Even division of [min, max] into n contiguous date ranges
        (reference divideRange date-helpers.ts:242-264 + the min/max
        probe ElasticsearchReaderAPI.ts:669-718).  The probe reads Parquet
        footer statistics only — no data pages.  ``hook`` (optional)
        receives the discovered per-slicer metadata, see _fire_hook."""
        from elasticsearch_assets_ray.sources.reader import min_max_probe

        lo, hi = min_max_probe(self.table_path, self.date_col)
        import datetime as _dt

        span = (hi - lo) / n_slicers if n_slicers else None
        out = []
        for i in range(n_slicers):
            s = lo + span * i
            e = hi if i == n_slicers - 1 else lo + span * (i + 1)
            if i == n_slicers - 1:
                e = e + _dt.timedelta(microseconds=1)  # limit-inclusive
            out.append(ReaderSlice(start=s, end=e))
        self._fire_hook(
            hook,
            [
                {
                    "start": r.start.isoformat(),
                    "end": r.end.isoformat(),
                    # the DISCOVERED interval is the even division — the
                    # last slice's end carries a +1 microsecond
                    # limit-inclusivity bump that is a slice-bound
                    # artifact, not part of the discovered interval
                    "interval": (span.total_seconds(), "s"),
                }
                for r in out
            ],
        )
        return out

    def keyspace(self):
        """Distributed keyspace state for this table's key column: a
        one-time sorted layout (fingerprint-cached under /tmp) whose
        probes read boundary metadata + at most one file — never the
        whole key column on the driver (at 1B keys that is GBs)."""
        if self._keyspace is None:
            from elasticsearch_assets_ray.sources.keyspace import SortedKeyspace

            self._keyspace = SortedKeyspace.build(
                self.table_path,
                self.key_col,
                SortedKeyspace.default_layout_dir(self.table_path, self.key_col),
            )
        return self._keyspace

    def make_date_interval_ranges(
        self, interval: str, *, hook=None
    ) -> list[ReaderSlice]:
        """Fixed-interval date slices from a config string ("5m", "2d",
        "1month" — the reference's interval vocabulary, date-helpers.ts
        dateOptions/processInterval): windows of exactly that length
        stepped over [min, max] (footer-statistics probe; limit-inclusive
        like make_date_slicer_ranges).  Calendar units step with real
        calendar arithmetic."""
        import datetime as _dt

        from elasticsearch_assets_ray.sources.dates import (
            interval_ranges,
            process_interval,
        )
        from elasticsearch_assets_ray.sources.reader import min_max_probe

        lo, hi = min_max_probe(self.table_path, self.date_col)
        hi = hi + _dt.timedelta(microseconds=1)  # limit-inclusive
        parsed = process_interval(interval, dates=(lo, hi))
        out = [
            ReaderSlice(start=s, end=e) for s, e in interval_ranges(lo, hi, parsed)
        ]
        self._fire_hook(
            hook,
            [
                {
                    "start": r.start.isoformat(),
                    "end": r.end.isoformat(),
                    "interval": tuple(parsed),
                }
                for r in out
            ],
        )
        return out

    def make_adaptive_date_ranges(
        self,
        size: int,
        *,
        start_interval: str | None = None,
        recurse_optimization: bool = True,
        min_step_us: int = 1000,
        max_probes: int = 10_000,
        hook=None,
    ) -> list[ReaderSlice]:
        """P4 in full: COUNT-GUIDED adaptive slicing (the reference's
        determineSlice recursion, dateSlicer.ts:95-180): each candidate
        window is count-probed; an over-full window (count > size)
        shrinks its end by ratio ``size/count`` (the reference's
        `recurse_optimization`; plain halving otherwise) and re-probes;
        an under-full window lets the NEXT window grow proportionally
        (the reference's expanded-slice behavior); zero-count windows are
        skipped, not emitted (hole handling, P5).  Sequential by design —
        each window's end depends on the previous probe, exactly like the
        reference slicer — and driver-side CHEAP: probes are pruned
        counts, the heavy fetch stays distributed.  Every emitted slice
        satisfies ``count <= size`` unless the window already shrank to
        ``min_step_us`` (the reference's one-millisecond floor)."""
        import datetime as _dt

        from elasticsearch_assets_ray.sources.dates import (
            interval_seconds,
            process_interval,
        )
        from elasticsearch_assets_ray.sources.reader import min_max_probe

        if size <= 0:
            raise ValueError("size must be positive")
        if min_step_us <= 0:
            # a zero floor would pin end == cur (grown=0) and spin the
            # probe loop until max_probes instead of ever advancing
            raise ValueError("min_step_us must be positive")
        lo, hi = min_max_probe(self.table_path, self.date_col)
        hi = hi + _dt.timedelta(microseconds=1)  # limit-inclusive
        total_span = hi - lo
        if start_interval is not None:
            step = _dt.timedelta(
                seconds=interval_seconds(process_interval(start_interval))
            )
        else:
            step = total_span / 16  # self-tunes from here
        min_step = _dt.timedelta(microseconds=min_step_us)
        step = max(step, min_step)
        out: list[ReaderSlice] = []
        cur = lo
        probes = 0
        while cur < hi:
            end = min(cur + step, hi)
            while True:
                probes += 1
                if probes > max_probes:
                    raise RuntimeError(
                        f"adaptive slicer exceeded {max_probes} count probes; "
                        "raise size or min_step_us"
                    )
                c = self.count(ReaderSlice(start=cur, end=end))
                span = end - cur
                if c <= size or span <= min_step:
                    break
                ratio = (
                    max(min(size / c, 0.9), 1e-3) if recurse_optimization else 0.5
                )
                span = max(
                    _dt.timedelta(seconds=span.total_seconds() * ratio), min_step
                )
                end = min(cur + span, hi)
                if end <= cur:
                    end = min(cur + min_step, hi)
            if c > 0:
                out.append(ReaderSlice(start=cur, end=end, count=c))
            # under-full → grow the next window (expanded-slice analog);
            # exactly-full → keep; the shrink loop handles over-full
            grown = end - cur
            if c < size // 2:
                grown = grown * 2
            step = max(min(grown, total_span), min_step)
            cur = end
        self._fire_hook(
            hook,
            [
                {
                    "start": r.start.isoformat(),
                    "end": r.end.isoformat(),
                    "interval": ((r.end - r.start).total_seconds(), "s"),
                    "count": r.count,
                }
                for r in out
            ],
        )
        return out

    def make_id_slicer_ranges(self, alphabet: str, max_count: int) -> list[ReaderSlice]:
        """Keyspace DFS plan (P7) as ReaderSlices, probing the sorted
        layout (driver memory ∝ file boundaries, not rows)."""
        from elasticsearch_assets_ray.sources.keyspace import prefix_dfs_partitions

        return [
            ReaderSlice(keys=[sl.prefix], count=sl.count, keys_exact=sl.exact)
            for sl in prefix_dfs_partitions(self.keyspace(), alphabet, max_count)
        ]


class ReaderAPIFactory:
    """Named-instance lifecycle over configured :class:`ReaderAPI` clients
    (reference asset/src/elasticsearch_reader_api/api.ts:15-58 on top of
    Teraslice's APIFactory create/get/remove/entries/keys/values/size
    surface).  ``base_config`` plays the factory's apiConfig; ``create``
    merges per-name overrides on top, validates eagerly (``table_path``
    required — the analog of the reference's ``index`` check), constructs
    the client ONCE and caches it by name; ``remove`` drops the cached
    instance.  Creating a name twice is an error, exactly like the
    reference factory."""

    def __init__(self, **base_config):
        self._base = dict(base_config)
        self._cache: dict[str, ReaderAPI] = {}

    @staticmethod
    def validate_config(config: dict) -> dict:
        if not isinstance(config, dict):
            raise TypeError(
                f"Invalid config, must be an object, was given {type(config).__name__}"
            )
        tp = config.get("table_path")
        if not tp or not isinstance(tp, str):
            raise ValueError(
                'Invalid parameter "table_path", must provide a valid table path'
            )
        return config

    def create(self, name: str, **overrides) -> ReaderAPI:
        if name in self._cache:
            raise ValueError(f"api instance {name!r} already exists")
        cfg = self.validate_config({**self._base, **overrides})
        cfg = dict(cfg)
        api = ReaderAPI(cfg.pop("table_path"), **cfg)
        self._cache[name] = api
        return api

    def get(self, name: str) -> ReaderAPI | None:
        return self._cache.get(name)

    def remove(self, name: str) -> None:
        # release the instance's serving actors too — dropping only the
        # dict entry leaves a sharded pool's CPU reservations alive until
        # lazy GC (the starvation hazard ShardedSearcher.shutdown exists
        # to prevent); mirrors the reference factory's remove() teardown
        api = self._cache.pop(name, None)
        if api is not None:
            api.shutdown()

    def entries(self):
        return list(self._cache.items())

    def keys(self):
        return list(self._cache.keys())

    def values(self):
        return list(self._cache.values())

    @property
    def size(self) -> int:
        return len(self._cache)
