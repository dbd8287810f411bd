"""jx date/duration literal parsing.

The reference accepts relative date expressions anywhere a date is
expected: ``"today"``, ``"now"``, ``"today-week"``, ``"eod"``,
``"month-3month"``, absolute ISO dates, and epoch numbers
(``vendor/mo_times/dates.py :: parse`` / ``Date``; durations incl.
calendar months in ``durations.py``). The translator resolves these to
timestamp literals at PLAN time — determinism requires an injectable
clock (``now=``): the verify oracle can't re-evaluate "now" at a
different instant.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import Column, functions as F

_UNITS = {
    "second": dt.timedelta(seconds=1),
    "minute": dt.timedelta(minutes=1),
    "hour": dt.timedelta(hours=1),
    "day": dt.timedelta(days=1),
    "week": dt.timedelta(weeks=1),
}
_CALENDAR = {"month": 1, "year": 12}  # variable-length → month arithmetic

_TOKEN = re.compile(r"([+-])(\d*)(second|minute|hour|day|week|month|year)s?")


def _floor_anchor(now: dt.datetime, anchor: str) -> dt.datetime:
    day = now.replace(hour=0, minute=0, second=0, microsecond=0)
    if anchor == "now":
        return now
    if anchor == "today":
        return day
    if anchor == "eod":  # end of day = tomorrow 00:00
        return day + dt.timedelta(days=1)
    if anchor == "week":  # jx weeks start Sunday (mo_times Date.floor)
        return day - dt.timedelta(days=(day.weekday() + 1) % 7)
    if anchor == "month":
        return day.replace(day=1)
    if anchor == "year":
        return day.replace(month=1, day=1)
    raise ValueError(f"unknown date anchor: {anchor!r}")


def _add_months(d: dt.datetime, months: int) -> dt.datetime:
    m = d.month - 1 + months
    y, m = d.year + m // 12, m % 12 + 1
    last = [31, 29 if (y % 4 == 0 and y % 100 != 0) or y % 400 == 0 else 28,
            31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1]
    return d.replace(year=y, month=m, day=min(d.day, last))


def parse_date(expr, now: dt.datetime | None = None) -> dt.datetime:
    """Parse a jx date literal to a concrete UTC datetime."""
    if isinstance(expr, int | float):  # epoch seconds (jx Date is a float)
        return dt.datetime.fromtimestamp(expr, dt.timezone.utc).replace(tzinfo=None)
    if not isinstance(expr, str):
        raise ValueError(f"cannot parse date literal: {expr!r}")
    now = now or dt.datetime.utcnow()

    m = re.match(r"^(now|today|eod|week|month|year)", expr)
    if m:
        out = _floor_anchor(now, m.group(1))
        for sign, count, unit in _TOKEN.findall(expr[m.end():]):
            k = int(count or 1) * (1 if sign == "+" else -1)
            if unit in _CALENDAR:
                out = _add_months(out, k * _CALENDAR[unit])
            else:
                out = out + k * _UNITS[unit]
        return out
    # absolute: ISO date/datetime
    for fmt in ("%Y-%m-%d", "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S"):
        try:
            return dt.datetime.strptime(expr, fmt)
        except ValueError:
            continue
    raise ValueError(f"cannot parse date literal: {expr!r}")


def date_lit(expr, now: dt.datetime | None = None) -> Column:
    """jx date literal → timestamp Column literal (plan-time resolution)."""
    return F.lit(parse_date(expr, now)).cast("timestamp")
