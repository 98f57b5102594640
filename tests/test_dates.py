"""Interval / date-math helpers (reference date-helpers.ts parity)."""

from datetime import datetime, timedelta, timezone

import pytest

from elasticsearch_assets_ray.sources.dates import (
    calendar_add,
    date_unit,
    interval_ms,
    interval_ranges,
    interval_seconds,
    parse_date,
    process_interval,
)


def test_date_unit_aliases():
    # reference dateOptions alias table (date-helpers.ts:13-54)
    assert date_unit("minutes") == date_unit("min") == date_unit("m") == "m"
    assert date_unit("M") == date_unit("mo") == date_unit("months") == "M"
    assert date_unit("ms") == date_unit("milliseconds") == "ms"
    assert date_unit("wk") == "w" and date_unit("hrs") == "h"
    with pytest.raises(ValueError, match="malformed"):
        date_unit("fortnight")


def test_process_interval_parse_and_errors():
    assert process_interval("12s") == (12, "s")
    assert process_interval("5min") == (5, "m")
    assert process_interval("1hour") == (1, "h")
    with pytest.raises(ValueError, match="incorrectly formatted"):
        process_interval("abc")
    # anchored parse: malformed strings are rejected, not misparsed
    # ("1.5h" used to silently parse as 5 hours)
    for bad in ("1.5h", "-5m", "5m!", "h5"):
        with pytest.raises(ValueError, match="incorrectly formatted"):
            process_interval(bad)


def test_process_interval_clamps_to_span():
    # compareInterval (date-helpers.ts:79-106): interval > data span
    # collapses to the span (seconds resolution rounds up)
    lo, hi = datetime(2024, 1, 1), datetime(2024, 1, 1, 0, 0, 30, 500000)
    assert process_interval("1d", dates=(lo, hi)) == (30500, "ms")
    assert process_interval("1d", "s", dates=(lo, hi)) == (31, "s")
    assert process_interval("10s", dates=(lo, hi)) == (10, "s")  # fits
    # calendar units clamp via calendar stepping instead of raising
    assert process_interval("1month", dates=(lo, hi)) == (30500, "ms")
    assert process_interval("1y", dates=(lo, datetime(2024, 3, 1))) == (
        5184000000, "ms",
    )
    fits = process_interval("1M", dates=(datetime(2024, 1, 1), datetime(2024, 6, 1)))
    assert fits == (1, "M")
    # sub-millisecond span still yields a usable (nonzero) interval
    tiny = process_interval("5d", dates=(lo, lo + timedelta(microseconds=1)))
    assert tiny == (1, "ms")
    assert interval_ranges(lo, lo + timedelta(microseconds=1), tiny)


def test_interval_ms_parity():
    # reference getMilliseconds (date-helpers.ts:123-133)
    assert interval_ms((2, "d")) == 172800000
    assert interval_ms((3, "h")) == 10800000
    assert interval_ms((5, "m")) == 300000
    assert interval_ms((7, "s")) == 7000
    assert interval_ms((9, "ms")) == 9
    assert interval_seconds("90s") == 90.0
    with pytest.raises(ValueError, match="calendar"):
        interval_ms((1, "M"))


def test_calendar_add_month_clamp():
    assert calendar_add(datetime(2024, 1, 31), (1, "M")) == datetime(2024, 2, 29)
    assert calendar_add(datetime(2024, 2, 29), (1, "y")) == datetime(2025, 2, 28)
    assert calendar_add(datetime(2024, 1, 1), (2, "w")) == datetime(2024, 1, 15)


def test_parse_date():
    assert parse_date("2024-01-02T03:04:05.678") == datetime(2024, 1, 2, 3, 4, 5, 678000)
    assert parse_date(datetime(2024, 1, 1)) == datetime(2024, 1, 1)
    # epoch seconds/ms → naive UTC, machine-timezone-independent
    assert parse_date("1704153600") == datetime(2024, 1, 2)
    assert parse_date("1704153600500") == datetime(2024, 1, 2, 0, 0, 0, 500000)
    # tz-aware inputs converted to UTC then stripped: mixes freely with
    # the engine's naive footer-stat datetimes
    z = parse_date("2024-01-02T03:04:05+02:00")
    assert z == datetime(2024, 1, 2, 1, 4, 5) and z.tzinfo is None
    assert parse_date("2024-01-02T00:00:00Z").tzinfo is None
    assert parse_date(
        datetime(2024, 1, 2, tzinfo=timezone.utc)
    ) == datetime(2024, 1, 2)
    # Z-suffixed starts compare against naive limits without TypeError
    r = interval_ranges(parse_date("2024-01-01T00:00:00Z"), datetime(2024, 1, 3), "1d")
    assert len(r) == 2


def test_interval_ranges_cover_disjoint():
    lo, hi = datetime(2024, 1, 1), datetime(2024, 1, 14, 12)
    r = interval_ranges(lo, hi, "5d")
    assert r[0][0] == lo and r[-1][1] == hi
    for (a, b), (c, d) in zip(r, r[1:]):
        assert b == c and a < b
    # calendar-month stepping
    rm = interval_ranges(datetime(2024, 1, 31), datetime(2024, 4, 15), (1, "M"))
    assert [x[0] for x in rm] == [
        datetime(2024, 1, 31), datetime(2024, 2, 29), datetime(2024, 3, 29),
    ]


def test_date_range_agg_matches_oracle(ray_session, sf_dir):
    """ES date_range agg: overlapping + open-ended named ranges, each
    carrying event count and exact distinct users, vs its SQL twin."""
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    t = R.QUERIES["date_range_agg"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    o = con.sql(R.ORACLES["date_range_agg"]).df()
    cols = sorted(t.columns)
    assert sorted(o.columns) == cols
    a = t[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].sort_values(cols).reset_index(drop=True)
    assert a["value"].tolist() == b["value"].tolist()
    assert a["count"].tolist() == [int(x) for x in b["count"]]
    assert a["metric_r"].tolist() == [float(x) for x in b["metric_r"]]
    # the overlapping range really overlaps: first_half ⊆ early+mid
    byname = dict(zip(a["value"], a["count"]))
    assert byname["first_half"] <= byname["early"] + byname["mid"]
    assert sum(byname[k] for k in ("early", "mid", "late")) >= byname["first_half"]
