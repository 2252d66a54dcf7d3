"""Working-day publish calendar (SURVEY F5-F8) as native expressions.

The reference iterates weekdays in Python to find the nth working day of a
month (``LRD/lib_land_registry_data/lib_datetime.py:14-40``) and derives the
publish/threshold datestamps from it (:43-132). Here the same semantics are
``sequence`` + ``filter`` + ``element_at`` — pure Catalyst expressions that
run inside codegen, no UDF, so they vectorize across a 100 TB column.

Note: "working day" = Mon-Fri; the reference has no holiday calendar.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _working_days_of_month(any_date: Column) -> Column:
    """Array of the month's Mon-Fri dates, in order."""
    month_start = F.trunc(any_date, "month")
    month_end = F.last_day(any_date)
    days = F.sequence(month_start, month_end)  # array<date>, 1-day step
    # dayofweek: 1=Sunday … 7=Saturday; working days are 2..6.
    return F.filter(days, lambda d: F.dayofweek(d).between(2, 6))


def nth_working_day_of_month(any_date: Column, n: int = 20) -> Column:
    """F5: the nth (1-based) working day of ``any_date``'s month.

    Null when the month has fewer than n working days (the reference raises;
    callers decide — months always have ≥20 weekdays except February edge
    cases the reference also never hits). ``try_element_at``: ANSI mode
    must return null here, not error.
    """
    return F.try_element_at(_working_days_of_month(any_date), F.lit(n))


def publish_datestamp(d: Column, n: int = 20) -> Column:
    """F6: the publish date governing ``d`` — this month's nth working day
    if ``d`` falls on/after it, else the previous month's."""
    this_month = nth_working_day_of_month(d, n)
    prev_month = nth_working_day_of_month(F.add_months(d, -1), n)
    return F.when(F.to_date(d) >= this_month, this_month).otherwise(prev_month)


def threshold_datestamp(d: Column, n: int = 20) -> Column:
    """F7: last day of the publish month."""
    return F.last_day(publish_datestamp(d, n))


def next_publish_datestamp(d: Column, n: int = 20) -> Column:
    """F8: threshold→publish conversion — next month's nth working day."""
    return nth_working_day_of_month(F.add_months(d, 1), n)
