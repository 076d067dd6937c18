"""OgcTime model: ISO-8601 period parsing + period-preserving interval
monoid (reference ogc/.../OgcTime.scala:168-220 — OgcTimeInterval carries
an optional ISO-8601 period, the monoid combine takes the envelope of the
bounds and keeps the period when compatible; toTimePositions expands
start..end by the period).

Parsing implements the ISO-8601 duration grammar
``PnYnMnWnDTnHnMnS`` (fractional seconds allowed). Calendar components
(years/months) stay calendar-valued — expansion delegates to Spark's
``sequence(start, end, interval …)`` which applies true calendar
arithmetic, matching the reference's jsr310-based stepping.
"""

from __future__ import annotations

import calendar
import datetime as dt
import re
from dataclasses import dataclass

_PERIOD_RE = re.compile(
    r"^P(?:(?P<years>\d+)Y)?(?:(?P<months>\d+)M)?(?:(?P<weeks>\d+)W)?"
    r"(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?"
    r"(?:(?P<seconds>\d+(?:\.\d+)?)S)?)?$"
)


def parse_period(s: str) -> tuple[int, int, float]:
    """ISO-8601 duration → (months, days, seconds). Raises on malformed
    or empty (P / PT) durations."""
    m = _PERIOD_RE.match(s.strip())
    if not m or not any(m.groupdict().values()):
        raise ValueError(f"malformed ISO-8601 period: {s!r}")
    g = {k: v for k, v in m.groupdict().items() if v is not None}
    months = int(g.get("years", 0)) * 12 + int(g.get("months", 0))
    days = int(g.get("weeks", 0)) * 7 + int(g.get("days", 0))
    seconds = (
        int(g.get("hours", 0)) * 3600.0
        + int(g.get("minutes", 0)) * 60.0
        + float(g.get("seconds", 0.0))
    )
    if not (months or days or seconds):
        # P0D etc. parse but denote a zero step — stepping by it never
        # advances (to_positions would loop forever)
        raise ValueError(f"zero-length ISO-8601 period: {s!r}")
    return months, days, seconds


def period_to_spark_interval(s: str) -> str:
    """ISO-8601 duration → Spark interval literal body (usable inside
    ``sequence(start, end, interval <this>)``)."""
    months, days, seconds = parse_period(s)
    parts = []
    if months:
        parts.append(f"{months} months")
    if days:
        parts.append(f"{days} days")
    if seconds:
        if seconds == int(seconds):
            parts.append(f"{int(seconds)} seconds")
        else:
            ms = round(seconds * 1000)
            parts.append(f"{ms // 1000} seconds {ms % 1000} milliseconds")
    return " ".join(parts)


@dataclass(frozen=True)
class OgcTimeInterval:
    """start/end bounds + optional ISO-8601 period string."""

    start: dt.datetime
    end: dt.datetime
    period: str | None = None

    def combine(self, other: "OgcTimeInterval") -> "OgcTimeInterval":
        """Period-preserving monoid combine (OgcTime.scala:168-220):
        envelope of the bounds; the period survives when both sides agree
        (or only one side carries one), otherwise it is dropped — a
        combined interval with conflicting step semantics has none."""
        if self.period == other.period:
            period = self.period
        elif self.period is None or other.period is None:
            period = self.period or other.period
        else:
            period = None
        return OgcTimeInterval(
            min(self.start, other.start), max(self.end, other.end), period
        )

    def to_positions(self) -> list[dt.datetime]:
        """Expand start..end by the period (inclusive stepping — the
        driver-side mirror of interval_to_positions' SQL sequence()).
        Calendar months step by true calendar arithmetic."""
        if self.period is None:
            return [self.start] if self.start == self.end else [self.start, self.end]
        months, days, seconds = parse_period(self.period)
        out = []
        cur = self.start
        i = 0
        while cur <= self.end:
            out.append(cur)
            i += 1
            total_m = (self.start.month - 1) + months * i
            y = self.start.year + total_m // 12
            mo = total_m % 12 + 1
            # jsr310 plusMonths semantics: day-of-month clamps to the
            # target month's length (Jan 31 + P1M -> Feb 28/29), instead
            # of datetime.replace raising "day is out of range for month"
            day = min(self.start.day, calendar.monthrange(y, mo)[1])
            cur = self.start.replace(year=y, month=mo, day=day) + dt.timedelta(
                days=days * i, seconds=seconds * i
            )
        return out
