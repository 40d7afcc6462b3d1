"""Date/time Column helpers (reference §2.8 F2)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def combine_date_time(crash_date: Column, crash_time: Column) -> Column:
    """``date_time = '%sT%s' % (crash_date[:10], crash_time)``
    (main.py:205-206): date-part of the ISO date string + 'T' + the
    H:MM time, parsed as a UTC timestamp."""
    return F.to_timestamp(
        F.concat_ws("T", F.substring(crash_date, 1, 10), crash_time),
        "yyyy-MM-dd'T'H:mm",
    )


def derive_year_month(ts: Column) -> tuple[Column, Column]:
    """String ``year``/``month`` columns ('2024', '07') as stored by
    the reference (main.py:287-288)."""
    return F.date_format(ts, "yyyy"), F.date_format(ts, "MM")


def months_back(n: int) -> Column:
    """``current_date - INTERVAL 'n months'`` (main.py:57-76) --
    high-watermark lookback boundary."""
    return F.add_months(F.current_date(), -n)


def updated_after_created(updated_at: Column, created_at: Column) -> Column:
    """Keep rows updated on a later *day* than created: the reference
    compares the first 10 chars of the ISO strings (main.py:846,993),
    i.e. a date-prefix compare, not a timestamp compare."""
    return F.to_date(updated_at) > F.to_date(created_at)
