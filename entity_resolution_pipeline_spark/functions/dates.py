"""Flexible date parsing (P16) — native when()/regex chain.

Reference semantics (/root/reference/src/utils.py:224-276,
run_pipeline.py:229-251): a value may be a bare year ("2021"), a quarter
("Q3 2021"), an Excel serial day count (epoch 1899-12-30), or a parseable
date string; extract a timestamp and a year, null on failure (coerce).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EXCEL_EPOCH = "1899-12-30"


def parse_flexible_date_col(s: Column) -> Column:
    """string → date (null when unparseable), covering the reference's four
    accepted shapes. Order matters: year before serial (a 4-digit number in
    1900-2100 reads as a year, matching the reference's year-first regex)."""
    v = F.trim(F.coalesce(s, F.lit("")))
    year = F.when(
        v.rlike(r"^(19|20)\d{2}$"),
        F.to_date(F.concat(v, F.lit("-01-01"))),
    )
    quarter = F.when(
        v.rlike(r"^[Qq][1-4]\s+(19|20)\d{2}$"),
        F.to_date(F.concat(
            F.regexp_extract(v, r"((19|20)\d{2})", 1),
            F.lit("-"),
            F.lpad(((F.regexp_extract(v, r"^[Qq]([1-4])", 1).cast("int") - 1) * 3 + 1)
                   .cast("string"), 2, "0"),
            F.lit("-01"),
        )),
    )
    serial = F.when(
        v.rlike(r"^\d{1,6}$"),
        F.date_add(F.to_date(F.lit(EXCEL_EPOCH)), v.cast("int")),
    )
    # try_ variant: ANSI mode (Spark 4 default) would otherwise throw on junk
    iso = F.try_to_timestamp(v, F.lit("yyyy-MM-dd")).cast("date")
    return F.coalesce(year, quarter, serial, iso)


def year_of_flexible_col(s: Column) -> Column:
    return F.year(parse_flexible_date_col(s))


def year_diff_col(y1: Column, y2: Column) -> Column:
    """|year1 − year2|, NULL when either side is missing (F8,
    /root/reference/src/features.py:267-276)."""
    return F.abs(y1.cast("int") - y2.cast("int"))


def year_compat_col(y1: Column, y2: Column) -> Column:
    """Year compatibility step function (F8, src/features.py:278-299):
    0→1.0, ≤2→0.8, ≤5→0.5, >5→0.2, missing→0.5 (neutral)."""
    d = year_diff_col(y1, y2)
    return (
        F.when(d.isNull(), F.lit(0.5))
        .when(d == 0, F.lit(1.0))
        .when(d <= 2, F.lit(0.8))
        .when(d <= 5, F.lit(0.5))
        .otherwise(F.lit(0.2))
    )
