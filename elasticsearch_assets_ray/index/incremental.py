"""Incremental (persistent-mode) index builds — the native analog of the
reference's persistent lifecycle:

- window math: ``delayed_stream_segment`` computes ``[now − delay −
  interval, now − delay)`` (reference date-helpers.ts:267-285) and
  ``next_window`` advances by ``interval`` (dateSlicer.ts:268-306);
- :class:`WindowState` — the all-slicers-finished barrier
  (reference WindowState.ts:30-54);
- :class:`IncrementalIndex` — each tick builds a *delta* index over the
  rows whose ``date_col`` falls in the window, with a globally disjoint
  docID space (pid ranges aligned to ``runs_per_bucket`` so bucket ids
  never collide across ticks), checkpointed per partition exactly like a
  full build;
- :class:`MultiSearcher` — serves queries over base + all deltas with
  COMBINED global stats (N, avgdl, per-term df summed across ticks), so
  scores equal what a single monolithic build over the union would give.

Same caveat as the reference: data arriving later than ``delay`` is
missed (no watermark replay).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.index.build import IndexConfig, build_index
from elasticsearch_assets_ray.query.engine import Searcher


def _seconds(v: float | str) -> float:
    """Seconds from a number or a reference-style interval string
    ("30s", "5m" — date-helpers.ts vocabulary)."""
    if isinstance(v, str):
        from elasticsearch_assets_ray.sources.dates import interval_seconds

        return interval_seconds(v)
    return float(v)


def delayed_stream_segment(
    now: datetime, delay_s: float | str, interval_s: float | str
) -> tuple[datetime, datetime]:
    """The reference's latency-barrier window: [now−delay−interval,
    now−delay).  ``delay``/``interval`` accept seconds or the config
    strings a reference job uses ("30s", "5m")."""
    hi = now - timedelta(seconds=_seconds(delay_s))
    lo = hi - timedelta(seconds=_seconds(interval_s))
    return lo, hi


def next_window(
    window: tuple[datetime, datetime], interval_s: float | str
) -> tuple[datetime, datetime]:
    lo, hi = window
    step = timedelta(seconds=_seconds(interval_s))
    return lo + step, hi + step


class WindowState:
    """Per-slicer barrier: a window may advance only after every slicer
    id has checked in (reference WindowState.ts:30-54).  Driver-side
    state — in a Ray deployment this lives on the driver or a named
    actor."""

    def __init__(self, n_slicers: int):
        self.n_slicers = n_slicers
        self._checked: set[int] = set()

    def checkin(self, slicer_id: int) -> bool:
        """Returns True iff this checkin completes the window (and resets
        for the next one)."""
        if not (0 <= slicer_id < self.n_slicers):
            raise ValueError(f"slicer id {slicer_id} out of range")
        self._checked.add(slicer_id)
        if len(self._checked) == self.n_slicers:
            self._checked.clear()
            return True
        return False


def _align_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class IncrementalIndex:
    """A root directory of delta index builds with one shared docID
    space.  ``root/state.json`` tracks ticks and the next free pid."""

    def __init__(self, root: str, config: IndexConfig | None = None):
        self.root = root
        self.cfg = config or IndexConfig()
        os.makedirs(root, exist_ok=True)
        self._state_path = os.path.join(root, "state.json")
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                self.state = json.load(f)
        else:
            self.state = {"ticks": [], "next_pid": 0}

    def _save(self) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, self._state_path)

    def tick(
        self,
        paths: str | list[str],
        window: tuple[object, object],
        date_col: str,
    ) -> dict:
        """Build one delta over rows with ``window[0] <= date_col <
        window[1]``.  Idempotent per (window): a completed tick is
        skipped on replay (the recovery analog)."""
        import pyarrow.compute as pc

        lo, hi = window
        tick_id = f"{_ts(lo)}__{_ts(hi)}"
        for t in self.state["ticks"]:
            if t["tick_id"] == tick_id and t.get("complete"):
                return t
        if tick_id in self.state.get("compacted_ticks", []):
            # window already absorbed into a compacted index (replay)
            return {"tick_id": tick_id, "complete": True, "compacted": True,
                    "n_docs": 0}
        out_dir = os.path.join(self.root, "deltas", tick_id)
        pid_base = _align_up(self.state["next_pid"], self.cfg.runs_per_bucket)
        filt = (pc.field(date_col) >= lo) & (pc.field(date_col) < hi)
        manifest = build_index(
            paths,
            out_dir,
            config=self.cfg,
            resume=True,
            pid_base=pid_base,
            row_filter=filt,
            filter_cols=(date_col,),
        )
        entry = {
            "tick_id": tick_id,
            "dir": out_dir,
            "pid_base": pid_base,
            "n_partitions": manifest["n_partitions"],
            "n_docs": manifest["n_docs"],
            "complete": True,
        }
        self.state["ticks"] = [t for t in self.state["ticks"] if t["tick_id"] != tick_id]
        self.state["ticks"].append(entry)
        self.state["next_pid"] = manifest.get(
            "max_pid", pid_base + manifest["n_partitions"] - 1
        ) + 1
        self._save()
        return entry

    def searcher(self, prune: bool = True) -> "MultiSearcher":
        dirs = [t["dir"] for t in self.state["ticks"] if t.get("complete")]
        return MultiSearcher(dirs, prune=prune)

    def compact(self) -> dict:
        """Merge every completed delta into ONE index (the force-merge
        analog): docstore/run part files are HARDLINKED into a fresh dir
        (pid spaces are disjoint, so this is a pure union — no data is
        rewritten), then phase 2 re-runs once over the union, producing
        a single segments tree with globally merged postings.  Query
        results are identical to the MultiSearcher over the deltas (same
        N, avgdl, per-term df — the stats are sums either way).  The
        replaced ticks' ids are remembered so replayed windows stay
        idempotent."""
        import glob
        import shutil

        from elasticsearch_assets_ray.index.build import (
            TERM_HASH_ID,
            run_phase2,
        )
        from elasticsearch_assets_ray.sources.partition import DOC_SHIFT

        ticks = [t for t in self.state["ticks"] if t.get("complete")]
        if not ticks:
            raise ValueError("nothing to compact")
        # validate EVERY merge-relevant setting across deltas BEFORE any
        # file is linked: mixing codec / positional layout / shard count /
        # bucket width would corrupt or crash the merge, and raising early
        # leaves no partial compacted dir behind
        manifests = []
        for t in ticks:
            with open(os.path.join(t["dir"], "manifest.json")) as fh:
                manifests.append(json.load(fh))
        from elasticsearch_assets_ray.index.build import MANIFEST_VERSION

        # an old-layout delta (e.g. v1 runs without offs_le) would pass a
        # mixed-value check if ALL deltas are old — require the current
        # layout outright before any file is linked
        for m in manifests:
            if m.get("version") != MANIFEST_VERSION:
                raise ValueError(
                    f"delta manifest version {m.get('version')!r} != "
                    f"{MANIFEST_VERSION}; rebuild the delta before compacting"
                )
        for key, default in (
            ("codec", "varint"),
            ("index_positions", False),
            ("num_shards", 32),
            ("runs_per_bucket", 32),
        ):
            vals = {m.get(key, default) for m in manifests}
            if len(vals) > 1:
                raise ValueError(
                    f"cannot compact deltas with mixed {key} settings: {sorted(map(str, vals))}"
                )
        gen = int(self.state.get("compact_gen", 0))
        out = os.path.join(self.root, f"compacted-{gen:03d}")
        shutil.rmtree(out, ignore_errors=True)
        for sub in ("docstore", "runs"):
            os.makedirs(os.path.join(out, sub))
        n_docs = total_tokens = n_parts = n_raw = 0
        child_manifest = manifests[0]
        for t, m in zip(ticks, manifests):
            n_docs += m["n_docs"]
            total_tokens += m["total_tokens"]
            n_parts += m["n_partitions"]
            n_raw += m.get("n_raw_rows", 0)
            for sub in ("docstore", "runs"):
                for f in glob.glob(os.path.join(t["dir"], sub, "part-*.parquet")):
                    os.link(f, os.path.join(out, sub, os.path.basename(f)))
        # build settings come from the deltas' own manifests (a CLI
        # compact may construct IncrementalIndex with a default config)
        merge_cfg = IndexConfig(
            codec=child_manifest.get("codec", "varint"),
            num_shards=int(child_manifest.get("num_shards", 32)),
            runs_per_bucket=int(child_manifest.get("runs_per_bucket", 32)),
            content_col=child_manifest.get("content_col", "content"),
            id_cols=tuple(child_manifest.get("id_cols", ())),
            store_content=bool(child_manifest.get("store_content", False)),
            index_positions=bool(child_manifest.get("index_positions", False)),
        )
        run_phase2(out, merge_cfg)
        manifest = {
            # the validated common value (NOT a leaked loop variable)
            "version": child_manifest.get("version"),
            "complete": True,
            "compacted_from": [t["tick_id"] for t in ticks],
            "n_partitions": n_parts,
            "n_docs": n_docs,
            "n_raw_rows": n_raw,
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "doc_shift": child_manifest.get("doc_shift", DOC_SHIFT),
            "term_hash": TERM_HASH_ID,
            "codec": merge_cfg.codec,
            "num_shards": merge_cfg.num_shards,
            "runs_per_bucket": merge_cfg.runs_per_bucket,
            "content_col": merge_cfg.content_col,
            "id_cols": list(merge_cfg.id_cols),
            "store_content": merge_cfg.store_content,
            "index_positions": merge_cfg.index_positions,
            "positions_codec": child_manifest.get("positions_codec"),
        }
        with open(os.path.join(out, "manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        done_ids = set(self.state.get("compacted_ticks", []))
        done_ids.update(t["tick_id"] for t in ticks)
        entry = {
            "tick_id": f"compacted-{gen:03d}",
            "dir": out,
            "n_partitions": n_parts,
            "n_docs": n_docs,
            "complete": True,
        }
        self.state["ticks"] = [
            t for t in self.state["ticks"] if not t.get("complete")
        ] + [entry]
        self.state["compacted_ticks"] = sorted(done_ids)
        self.state["compact_gen"] = gen + 1
        self._save()
        return entry


def _ts(x) -> str:
    s = x.isoformat() if hasattr(x, "isoformat") else str(x)
    return s.replace(":", "-")


class MultiSearcher(Searcher):
    """Search base + delta indexes as one logical index: segment rows are
    concatenated across children and scored with COMBINED corpus stats —
    per-term df sums naturally because `_score` already sums df over
    segment rows, and docID spaces are disjoint by construction."""

    def __init__(self, dirs: list[str], prune: bool = True):
        if not dirs:
            raise ValueError("no delta indexes yet")
        self.children = [Searcher(d, prune=prune) for d in dirs]
        self.prune = prune
        codecs = {c.manifest.get("codec", "varint") for c in self.children}
        if len(codecs) > 1:
            # segment rows from every child decode through ONE codec —
            # mixed codecs would silently produce garbage postings
            raise ValueError(
                f"delta indexes use mixed codecs {sorted(codecs)}; rebuild "
                "the deltas with one codec (or compact each group separately)"
            )
        self._set_codec(codecs.pop())
        # positions / docID layout must also agree: mixed position
        # encodings would silently decode garbage in _verify_phrases_pos
        # and mixed doc_shift would mis-route docids — raise, don't guess
        for key in ("positions_codec", "doc_shift"):
            vals = {c.manifest.get(key) for c in self.children}
            if len(vals) > 1:
                raise ValueError(
                    f"delta indexes disagree on {key}: {sorted(map(str, vals))}; "
                    "rebuild with one setting or compact each group separately"
                )
        # the analysis chain must agree across deltas (mixed chains would
        # tokenize the same query differently per child); adopt it
        specs = {
            json.dumps(c.manifest.get("analyzer"), sort_keys=True)
            for c in self.children
        }
        if len(specs) > 1:
            raise ValueError(
                "delta indexes disagree on the analyzer chain; rebuild the "
                "deltas with one analyzer"
            )
        self.analyzer = self.children[0].analyzer
        self.n_docs = sum(c.n_docs for c in self.children)
        total_tokens = sum(c.manifest["total_tokens"] for c in self.children)
        self.avgdl = (total_tokens / self.n_docs) if self.n_docs else 0.0
        self.num_shards = self.children[0].num_shards
        c0 = self.children[0].manifest
        self.manifest = {
            "n_docs": self.n_docs,
            "total_tokens": total_tokens,
            "avgdl": self.avgdl,
            "num_shards": self.num_shards,
            "doc_shift": c0.get("doc_shift"),
            "runs_per_bucket": c0.get("runs_per_bucket", 32),
            # phrase-path capabilities follow the children
            "index_positions": all(
                c.manifest.get("index_positions", False) for c in self.children
            ),
            "positions_codec": c0.get("positions_codec"),
            "store_content": all(
                c.manifest.get("store_content", False) for c in self.children
            ),
            "content_col": c0.get("content_col"),
        }
        self._init_runtime_state()
        # children load their own tombstones (disjoint docID spaces →
        # plain sorted union); _init_runtime_state reset ours to empty
        # because a MultiSearcher has no single index_dir
        tombs = [c._tombstones for c in self.children if c._tombstones.size]
        if tombs:
            self._tombstones = np.unique(np.concatenate(tombs))

    def _term_dict_slices(self, lo: str | None = None, hi: str | None = None):
        """Chain the children's term dictionaries — prefix, wildcard and
        fuzzy expansion then work unchanged over the union."""
        for c in self.children:
            yield from c._term_dict_slices(lo, hi)

    def _segment_rows(self, terms: list[str]):
        parts = [t for t in (c._segment_rows(terms) for c in self.children) if t is not None]
        if not parts:
            return None
        return pa.concat_tables(parts)

    def _pid_map(self) -> dict[int, str]:
        """Union of the children's pid → docstore-file maps (pid spaces
        are disjoint by construction, so this is a plain merge)."""
        if self._pid_files is None:
            m: dict[int, str] = {}
            for c in self.children:
                m.update(c._pid_map())
            self._pid_files = m
        return self._pid_files

    def hydrate(self, docids: np.ndarray, columns=None):
        want = columns
        if columns is not None and "doc_id" not in columns:
            # the cross-child reorder below needs doc_id; restore the
            # caller's projection afterwards
            columns = ["doc_id"] + list(columns)
        parts = []
        for c in self.children:
            t = c.hydrate(docids, columns=columns)
            if t.num_rows:
                parts.append(t)
        if not parts:
            t = self.children[0].hydrate(docids, columns=columns)
            return t.select(want) if want is not None else t
        t = pa.concat_tables(parts)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = {int(d): i for i, d in enumerate(ids)}
        take = [pos[int(d)] for d in docids if int(d) in pos]
        t = t.take(pa.array(take, type=pa.int64()))
        return t.select(want) if want is not None else t
