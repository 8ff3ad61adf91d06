"""Filter / predicate operators (SURVEY §2.2, F1-F9).

All of these are plain Column predicates — Catalyst pushes them to the scan
(JDBC remote SQL, Parquet row-group skipping, partition pruning). The value
of this module is pinning the *semantics* the reference hard-codes, not the
mechanics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eq(col: str, value) -> Column:
    """F1 — equality predicate (pushed to source by Catalyst)."""
    return F.col(col) == value


def not_null_all(*cols: str) -> Column:
    """F2 — IS NOT NULL conjunction (YhCldETL.java:60-63)."""
    pred = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return pred


def date_eq(col: str, day: str) -> Column:
    """F3 — date-equality (RdlETL.java:86-87). Works for date or timestamp
    columns: compares the day component."""
    return F.to_date(F.col(col)) == F.lit(day).cast("date")


def prefix_eq(col: str, prefix: str) -> Column:
    """F4 — SUBSTR(col,1,n) = prefix (RdlETL.java:88). `startswith` lets
    Parquet/JDBC push a StringStartsWith filter."""
    return F.col(col).startswith(prefix)


def rowkey_range(col: str, start: str, stop: str) -> Column:
    """F5 — [start, stop) rowkey range scan (RdlETL2.java:59-60). On a
    prefix-partitioned table this becomes partition pruning."""
    return (F.col(col) >= start) & (F.col(col) < stop)


def marker_eq(col: str, value: str, filter_if_missing: bool = True) -> Column:
    """F6 — single-column value filter with filterIfMissing semantics
    (RdlETL2.java:44-51). Spark equality is already null-rejecting, which IS
    ``filterIfMissing(true)``; the ``false`` variant passes missing rows."""
    if filter_if_missing:
        return F.col(col) == value
    return F.col(col).isNull() | (F.col(col) == value)


def non_blank(col: str) -> Column:
    """F8 — drop null/blank strings (StringUtils.isBlank, RdlETL3.java:99-102)."""
    return F.col(col).isNotNull() & (F.trim(F.col(col)) != "")


def project(df: DataFrame, *cols: str) -> DataFrame:
    """F7 — column projection (scan.addColumn/addFamily). Catalyst prunes the
    parquet scan to exactly these columns (visible as ReadSchema in explain)."""
    return df.select(*cols)
