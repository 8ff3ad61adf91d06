"""Window / time-series operators (SURVEY §2.5).

The reference's core analytic is a hand-coded loop over pivoted day-columns
(``RdlETL2.java:83-104``). Here the canonical layout is long format, so the
same computation is a window ``lead`` — one shuffle on the partition key,
fully codegen'd, and skew-safe because a meter's history is tiny.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def guarded_lead_diff(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    ratio: Column | None = None,
    out: str = "rdl",
) -> DataFrame:
    """W1 — per-key lead difference with the meter-rollover guard.

    ``out[d] = (value[d+1] - value[d]) * ratio`` when
    ``value[d] > 0 AND value[d+1] > 0 AND value[d+1] >= value[d]``, else null
    (guard: ``RdlETL2.java:96-100``; multiply: ``:99``).
    """
    w = Window.partitionBy(key).orderBy(order)
    cur = F.col(value)
    nxt = F.lead(value, 1).over(w)
    guard = (cur > 0) & (nxt > 0) & (nxt >= cur)
    diff = (nxt - cur) * (ratio if ratio is not None else F.lit(1.0))
    return df.withColumn(out, F.when(guard, diff))


def date_spine(
    df: DataFrame,
    key_cols: list[str],
    start: dt.date | str,
    end: dt.date | str,
    date_col: str = "rd_date",
) -> DataFrame:
    """W2 — dense per-key calendar spine over [start, end] inclusive.

    The reference iterates every day whether or not a reading exists
    (``RdlETL2.java:80-83``); missing days read as default 0.0 and so yield
    null consumption (F9/X6). `sequence` + `explode` reproduces that without
    a join against a generated table: the spine is built inline per key.
    """
    keys = df.select(*key_cols).distinct()
    return keys.withColumn(
        date_col,
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ),
    )


def pivot_days(
    df: DataFrame,
    key: str,
    date_col: str,
    value: str,
    days: list[str],
) -> DataFrame:
    """W3 — long→wide pivot with an explicit day-column list (one pass).

    The reference pivots on write: per-day qualifiers ``yyyyMMdd``
    (``RdlETL.java:120-122``). The explicit value list avoids the extra
    distinct-values job and keeps column order deterministic.
    """
    keyed = df.withColumn("_day", F.date_format(date_col, "yyyyMMdd"))
    return keyed.groupBy(key).pivot("_day", days).agg(F.first(value))


def unpivot_days(
    df: DataFrame, key: str, day_cols: list[str], date_col: str = "rd_date",
    value: str = "value"
) -> DataFrame:
    """W4 — wide→long unpivot (the reference reads day-columns back in a
    loop, ``RdlETL2.java:87-93``). Spark 3.4+ native `unpivot`/`melt`."""
    long_df = df.unpivot(
        ids=[key], values=day_cols, variableColumnName="_day",
        valueColumnName=value,
    )
    return long_df.withColumn(date_col, F.to_date("_day", "yyyyMMdd")).drop("_day")


def scd2(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2 build: compress a change stream
    into validity intervals per key.

    Consecutive rows with an unchanged value collapse into one interval;
    each surviving change opens an interval ``[valid_from, valid_to)``
    closed by the next change (null ``valid_to`` + ``is_current`` marks the
    open interval). Two window passes over the same (key, ts) ordering —
    Catalyst plans ONE shuffle + sort and reuses it for both Window
    operators. ``tiebreak`` (e.g. an event id) makes same-timestamp
    ordering deterministic — mandatory on real streams.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    # null-safe change detection: IS DISTINCT FROM, with row 1 always kept
    # (lag's null on row 1 is indistinguishable from a null VALUE otherwise)
    changes = (
        df.withColumn("_prev", F.lag(value_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            | ~F.col(value_col).eqNullSafe(F.col("_prev"))
        )
        .drop("_prev", "_rn")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        F.col(value_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
