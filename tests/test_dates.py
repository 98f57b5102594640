"""Interval / date-math helpers (reference date-helpers.ts parity)."""

from datetime import datetime

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


def test_process_interval_clamps_to_span():
    # compareInterval (date-helpers.ts:79-106): interval > data span
    # collapses to the span (seconds resolution rounds up)
    lo, hi = datetime(2024, 1, 1), datetime(2024, 1, 1, 0, 0, 30, 500000)
    assert process_interval("1d", dates=(lo, hi)) == (30500, "ms")
    assert process_interval("1d", "s", dates=(lo, hi)) == (31, "s")
    assert process_interval("10s", dates=(lo, hi)) == (10, "s")  # fits


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
    assert parse_date("1704153600").year in (2024, 2023)  # tz-local epoch


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
