"""Scalar functions X1-X10 (SURVEY §2.7) as Column helpers.

Every one is a built-in-function composition — JVM-side, codegen-able; no
UDFs (the reference's per-row Java equivalents are cited per function).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def composite_key(*cols: Column | str, sep: str = "_") -> Column:
    """X1 — rowkey concat: ``gdfj_key + "_" + cldbs`` (YhCldETL.java:84)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def prefix(col: Column | str, n: int = 4) -> Column:
    """X2 — SUBSTR(col, 1, n) (RdlETL.java:88)."""
    return F.substring(F.col(col) if isinstance(col, str) else col, 1, n)


def branch_code(d: Column | int) -> Column:
    """X2 — prefix construction ``String.format("04%02d", d)`` (RdlETL.java:63)."""
    return F.format_string("04%02d", F.lit(d) if isinstance(d, int) else d)


def stop_key(prefix_col: Column | str) -> Column:
    """X3 — numeric successor of a string prefix: ``"0" + (int(p)+1)``
    (RdlETL2.java:60). Only needed when range-scanning without partitions.
    try_cast: a malformed prefix yields null, not an ANSI runtime error."""
    c = F.col(prefix_col) if isinstance(prefix_col, str) else prefix_col
    return F.concat(F.lit("0"), (c.try_cast("int") + 1).cast("string"))


def day_str(col: Column | str) -> Column:
    """X4 — format a date as the reference's ``yyyyMMdd`` qualifier name
    (RdlETL.java:121)."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, "yyyyMMdd")


def to_double_default(col: Column | str, default: float = 0.0) -> Column:
    """X6 — string→double with default (NumberUtils.toDouble, RdlETL2.java:89).
    Nulls, empty strings and non-numeric garbage all coalesce to default —
    try_cast, so garbage maps to the default under ANSI mode instead of
    raising (exactly NumberUtils.toDouble's contract)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(default))


def null_to_empty(col: Column | str) -> Column:
    """X7 — null→"" normalization, applied only at the CSV edge
    (RdlETL.java:121; SURVEY §7.3 warns to keep true nulls internally)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(""))


def is_blank(col: Column | str) -> Column:
    """X8 — StringUtils.isBlank (RdlETL3.java:99-102)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (F.trim(c) == "")


def render_double(col: Column | str) -> Column:
    """X10 — double→string (String.valueOf, RdlETL2.java:103)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double").cast("string")
