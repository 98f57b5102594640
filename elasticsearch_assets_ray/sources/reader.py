"""Reader surface — the native analogs of the reference's readers.

- :func:`date_range_read` — S1 `elasticsearch_reader`: date-partitioned
  scan with predicate pushdown (reference slicer date windows, utils.ts:55-63
  builds the range clause; here the range is a Parquet row-group-pruning
  filter on ``read_parquet`` — slices are blocks).
- :func:`key_prefix_read` — S2 `id_reader`: wildcard key-prefix scan
  (reference utils.ts:82-90 builds ``wildcard: {field: "ab*"}``; here a
  ``starts_with`` pushdown filter).
- :func:`projected_read` — Q6 `fields`/_source projection →
  ``columns=[...]`` at the read, so unneeded columns never leave storage.
- :func:`predicate_count` — F3 `count`: the slicers' count probe;
  Parquet statistics + filtered count, no full materialization.
- :func:`min_max_probe` — the reference's index date-range discovery
  (ElasticsearchReaderAPI.ts:669-718 1-doc sorted probes) as an Arrow
  statistics aggregate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data


def date_range_read(
    path: str,
    date_col: str,
    lo,
    hi,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Rows with ``lo <= date_col < hi`` (reference gte/lt semantics,
    utils.ts:55-63), filter pushed into the Parquet scan."""
    filt = (pc.field(date_col) >= lo) & (pc.field(date_col) < hi)
    return ray.data.read_parquet(path, columns=columns, filter=filt)


def key_prefix_read(
    path: str,
    key_col: str,
    prefixes: list[str],
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Rows whose ``key_col`` starts with any prefix (reference wildcard
    OR-list, utils.ts:82-90)."""
    filt = None
    for p in prefixes:
        f = pc.starts_with(pc.field(key_col), p)
        filt = f if filt is None else (filt | f)
    return ray.data.read_parquet(path, columns=columns, filter=filt)


def expand_charclass_prefix(pattern: str) -> list[str]:
    """Expand a reference-style key regexp ``lit[class].*`` (the
    recurse_optimization predicate, reference utils.ts:72-81 emits e.g.
    ``regexp: {field: "a[b-f].*"}``) into its equivalent list of literal
    prefixes — one per class member, ranges expanded.  ``^``-anchored
    prefix semantics: the trailing ``.*`` (implicit if absent) matches any
    remainder, so the regexp equals an OR of starts_with prefixes."""
    import re as _re

    m = _re.fullmatch(r"([^\[\]*.]*)\[([^\]]+)\](?:\.\*)?", pattern)
    if not m:
        raise ValueError(
            f"unsupported char-class pattern {pattern!r} (expected 'lit[class].*')"
        )
    lit, cls = m.group(1), m.group(2)
    chars: list[str] = []
    i = 0
    while i < len(cls):
        if i + 2 < len(cls) and cls[i + 1] == "-":
            lo, hi = ord(cls[i]), ord(cls[i + 2])
            if hi < lo:
                raise ValueError(f"bad range in class {cls!r}")
            chars.extend(chr(c) for c in range(lo, hi + 1))
            i += 3
        else:
            chars.append(cls[i])
            i += 1
    return [lit + c for c in dict.fromkeys(chars)]


def key_charclass_read(
    path: str,
    key_col: str,
    pattern: str,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Q3: char-class regexp key predicate ``lit[class].*`` as a pushdown
    scan — expanded to a starts_with OR-list so Parquet row-group pruning
    still applies (a regexp kernel would scan every row)."""
    return key_prefix_read(
        path, key_col, expand_charclass_prefix(pattern), columns=columns
    )


def projected_read(path: str, columns: list[str]) -> ray.data.Dataset:
    """Q6: column projection at the read."""
    return ray.data.read_parquet(path, columns=columns)


def predicate_count(path: str, filt=None) -> int:
    """F3 count probe.  With no filter, Parquet footer metadata only (no
    data scan — the planner's free count, SURVEY.md P3); with a filter,
    a columns-pruned scan counting matching rows."""
    if filt is None:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows if path.endswith(".parquet") else pads.dataset(path).count_rows()
    return pads.dataset(path).count_rows(filter=filt)


def min_max_probe(path: str, col: str) -> tuple[object, object]:
    """Discover [min, max] of a column — the reference's date-range probe
    (two 1-doc sorted searches, ElasticsearchReaderAPI.ts:669-718) done
    from Parquet row-group FOOTER statistics: zero data pages read when
    every row group carries min/max for the column (the free count-probe
    principle of SURVEY.md P3 applied to range discovery).  Falls back to
    a single-column scan only when statistics are absent."""
    import pyarrow.parquet as pq

    ds = pads.dataset(path)
    los: list[object] = []
    his: list[object] = []
    from_stats = True
    for f in ds.files:
        meta = pq.ParquetFile(f).metadata
        try:
            ci = meta.schema.names.index(col)
        except ValueError:
            from_stats = False
            break
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                from_stats = False
                break
            los.append(st.min)
            his.append(st.max)
        if not from_stats:
            break
    if from_stats and los:
        return min(los), max(his)
    t = ds.to_table(columns=[col])
    return pc.min(t[col]).as_py(), pc.max(t[col]).as_py()
