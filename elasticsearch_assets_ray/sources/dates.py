"""Interval / date-math config surface — native analogs of the
reference's date helpers (reference elasticsearch-reader-api/algorithms/
date-helpers.ts): `dateOptions` unit normalization (:13-54),
`processInterval` "[number][unit]" parsing + span clamping (:56-106),
`getMilliseconds` (:123-133).  A reference user writes ``interval:
"5m"`` / ``delay: "30s"`` in job config; these helpers accept exactly
that vocabulary.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

#: unit alias table (reference dateOptions, date-helpers.ts:13-54)
_UNIT_ALIASES: dict[str, str] = {
    "year": "y", "years": "y", "y": "y",
    "months": "M", "month": "M", "mo": "M", "mos": "M", "M": "M",
    "weeks": "w", "week": "w", "wks": "w", "wk": "w", "w": "w",
    "days": "d", "day": "d", "d": "d",
    "hours": "h", "hour": "h", "hr": "h", "hrs": "h", "h": "h",
    "minutes": "m", "minute": "m", "min": "m", "mins": "m", "m": "m",
    "seconds": "s", "second": "s", "s": "s",
    "milliseconds": "ms", "millisecond": "ms", "ms": "ms",
}

#: fixed-length unit → milliseconds (reference getMilliseconds
#: date-helpers.ts:123-133, extended with weeks; M/y are calendar units)
_MS_PER_UNIT: dict[str, int] = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 7 * 86_400_000,
}

_INTERVAL_RE = re.compile(r"(\d+)\s*([A-Za-z]+)")


def date_unit(value: str) -> str:
    """Normalize a unit alias ('minutes', 'min', 'm', …) to its canonical
    code.  Raises on unknown descriptors with the reference's wording."""
    u = _UNIT_ALIASES.get(value)
    if u is None:
        raise ValueError(
            f'the time descriptor of "{value}" for the interval is malformed'
        )
    return u


def process_interval(
    interval: str,
    time_resolution: str = "ms",
    dates: tuple[datetime, datetime] | None = None,
) -> tuple[int, str]:
    """Parse "[number][unit]" (e.g. ``"12s"``, ``"5min"``) →
    ``(n, canonical_unit)``.  With ``dates=(start, limit)`` the interval
    is CLAMPED to the span like the reference's ``compareInterval``: an
    interval longer than the data range collapses to the whole range
    (in seconds when ``time_resolution='s'``, else milliseconds)."""
    m = _INTERVAL_RE.fullmatch((interval or "").strip())
    if m is None:
        raise ValueError(
            "interval and/or delay are incorrectly formatted. Needs to "
            'follow [number][letter\'s] format, e.g. "12s"'
        )
    parsed = (int(m.group(1)), date_unit(m.group(2)))
    if dates is not None:
        span_ms = int((dates[1] - dates[0]).total_seconds() * 1000)
        # calendar units (M/y) have no fixed ms length — compare by
        # stepping from the actual start, which is exact for this span
        if parsed[1] in _MS_PER_UNIT:
            longer = interval_ms(parsed) > span_ms
        else:
            longer = calendar_add(dates[0], parsed) > dates[1]
        if longer:
            if time_resolution == "s":
                return (max(1, -(-span_ms // 1000)), "s")  # ceil
            return (max(1, span_ms), "ms")
    return parsed


def interval_ms(interval: tuple[int, str]) -> int:
    """Milliseconds of a fixed-length interval.  Calendar units (M / y)
    have no fixed length — resolve those with :func:`calendar_add`."""
    n, unit = interval
    per = _MS_PER_UNIT.get(unit)
    if per is None:
        raise ValueError(
            f"unit {unit!r} is calendar-dependent; use calendar_add with a "
            "reference date"
        )
    return n * per


def interval_seconds(interval: str | tuple[int, str]) -> float:
    """Convenience: "5m" / (5, 'm') → seconds (fixed-length units)."""
    if isinstance(interval, str):
        interval = process_interval(interval)
    return interval_ms(interval) / 1000.0


def calendar_add(start: datetime, interval: tuple[int, str]) -> datetime:
    """start + interval with real calendar arithmetic for months/years
    (month overflow clamps to the target month's last day)."""
    n, unit = interval
    if unit in _MS_PER_UNIT:
        return start + timedelta(milliseconds=interval_ms(interval))
    if unit == "M":
        month0 = start.month - 1 + n
        year = start.year + month0 // 12
        month = month0 % 12 + 1
        day = min(start.day, _days_in_month(year, month))
        return start.replace(year=year, month=month, day=day)
    if unit == "y":
        year = start.year + n
        day = min(start.day, _days_in_month(year, start.month))
        return start.replace(year=year, day=day)
    raise ValueError(f"unknown unit {unit!r}")


def _days_in_month(year: int, month: int) -> int:
    import calendar

    return calendar.monthrange(year, month)[1]


def parse_date(date: str | datetime) -> datetime:
    """ISO-8601 (the reference's dateFormat / dateFormatSeconds) or epoch
    seconds/milliseconds → NAIVE UTC datetime.  Everything in this engine
    (parquet footer stats, window math, slicer ranges) is naive UTC;
    tz-aware inputs are converted and stripped so results mix freely and
    don't depend on the machine's local timezone."""
    if isinstance(date, datetime):
        if date.tzinfo is not None:
            return date.astimezone(timezone.utc).replace(tzinfo=None)
        return date
    s = str(date).strip()
    if re.fullmatch(r"\d{10}", s):
        return datetime.fromtimestamp(int(s), tz=timezone.utc).replace(tzinfo=None)
    if re.fullmatch(r"\d{13}", s):
        return datetime.fromtimestamp(int(s) / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )
    d = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if d.tzinfo is not None:
        d = d.astimezone(timezone.utc).replace(tzinfo=None)
    return d


def interval_ranges(
    start: datetime, limit: datetime, interval: str | tuple[int, str]
) -> list[tuple[datetime, datetime]]:
    """Fixed-interval date windows covering [start, limit): each range is
    ``[t, min(t+interval, limit))`` — the reference date slicer's
    interval stepping (dateSlicer.ts determineSlice's non-recursive
    walk), calendar-aware for M/y units."""
    if isinstance(interval, str):
        interval = process_interval(interval)
    out: list[tuple[datetime, datetime]] = []
    t = start
    while t < limit:
        nxt = calendar_add(t, interval)
        if nxt <= t:
            raise ValueError("interval must advance time")
        out.append((t, min(nxt, limit)))
        t = nxt
    return out


# ---------------------------------------------------------------------------
# auto_date_histogram (ES): pick the interval from a fixed rounding
# ladder so the bucket count fits the target
# ---------------------------------------------------------------------------

#: the rounding ladder, ascending, in microseconds.  ES's ladder uses
#: calendar months/years; ours approximates them with fixed 30/90/180/365
#: day intervals (documented divergence — fixed intervals keep bucket
#: keys a pure integer function of the epoch, which the SQL twin and the
#: distributed bucketing both rely on).
AUTO_INTERVALS_US: tuple[int, ...] = tuple(
    s * 1_000_000
    for s in (
        1, 5, 10, 30, 60, 300, 600, 1800, 3600,
        3 * 3600, 12 * 3600, 86_400, 7 * 86_400,
        30 * 86_400, 90 * 86_400, 180 * 86_400, 365 * 86_400,
    )
)


def auto_interval_us(mn_us: int, mx_us: int, target_buckets: int) -> int:
    """The smallest ladder interval whose aligned bucket count
    (``mx//i − mn//i + 1``) fits ``target_buckets`` — exactly the
    expression the generated SQL twin evaluates."""
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")
    for i in AUTO_INTERVALS_US:
        if mx_us // i - mn_us // i + 1 <= target_buckets:
            return i
    return AUTO_INTERVALS_US[-1]


def auto_interval_sql(target_buckets: int) -> str:
    """SQL twin of :func:`auto_interval_us` as a CASE over (mn, mx)
    epoch-microsecond columns."""
    arms = " ".join(
        f"WHEN (mx // {i} - mn // {i} + 1) <= {target_buckets} THEN {i}"
        for i in AUTO_INTERVALS_US
    )
    return f"CASE {arms} ELSE {AUTO_INTERVALS_US[-1]} END"
