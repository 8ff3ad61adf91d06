"""The reference's 3-stage meter pipeline as one declarative Spark lineage.

Reference flow (SURVEY §3):

- Stage 1a ``YhCldETL.imp`` (YhCldETL.java:45-120): JDBC dim → filter
  not-null → composite rowkey → HBase ``info`` family.
- Stage 1b ``RdlETL.imp`` (RdlETL.java:82-160): Oracle readings → lookup
  join against dim (J1) → first-wins dedup (D1) → per-day ``bmz`` columns
  (W3) + ``DATA`` marker.
- Stage 2 ``RdlETL2.cal`` (RdlETL2.java:34-141): scan ``bmz`` → guarded
  lead-diff × ratio (W1/F9) → per-day ``rdl`` columns.
- Stage 3 ``RdlETL3.exp`` (RdlETL3.java:36-144): filtered scan → wide CSV,
  one dir per prefix, 500k-row rotation.

Here each stage is a DataFrame→DataFrame function; the driver loop over 15
prefixes × 93 days (RdlETL.java:41-47) disappears — partitioning expresses
it. Internal layout stays **long** (rowkey, rd_date, value); the 92-column
pivot happens only at the CSV edge (SURVEY §7.3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import filters
from ..operators.dedup import first_wins
from ..operators.joins import lookup_join, semi_join
from ..operators.window import date_spine, guarded_lead_diff, pivot_days
from ..sources.csv_sink import write_csv

# The reference's hard-coded campaign window (RdlETL.java:38-39): compute
# spans 93 days [2019-05-01, 2019-08-01]; the export emits 92 day-columns
# ending 2019-07-31 — day d needs d+1's reading (SURVEY §2.5 W2).
DEFAULT_START = dt.date(2019, 5, 1)
DEFAULT_END = dt.date(2019, 8, 1)


def load_dim(dim: DataFrame) -> DataFrame:
    """Stage 1a — dimension load (YhCldETL.java:54-92).

    Pushed predicates F1/F2 (not-null on gdfj_key, yhbh, zhbl) and the
    composite rowkey X1. Result: one row per meter.
    """
    return (
        dim.filter(
            F.col("gdfj_key").isNotNull()
            & F.col("yhbh").isNotNull()
            & F.col("zhbl").isNotNull()
        )
        .withColumn("rowkey", F.concat_ws("_", "gdfj_key", "cldbs"))
        .select("rowkey", "cldbs", "yhbh", "zhbl")
    )


def load_readings(
    dim_loaded: DataFrame,
    readings: DataFrame,
    start: dt.date = DEFAULT_START,
    end: dt.date = DEFAULT_END,
) -> DataFrame:
    """Stage 1b — fact load (RdlETL.java:82-160).

    - date-range predicate F3 (the reference loops one ``SJSJ =`` query per
      day; one range predicate covers the same rows in one scan),
    - prefix consistency F4 is data-guaranteed in the fixtures,
    - broadcast lookup join J1 on ``cldbs`` (inner: orphans dropped,
      RdlETL.java:110-114),
    - first-wins dedup D1 per (rowkey, day) with the explicit ``seq``
      arrival order (RdlETL.java:106,112-114; SURVEY §7.3 determinism note).

    Returns long-format ``(rowkey, rd_date, bmz)``.
    """
    in_range = readings.filter(
        (F.col("sjsj") >= F.lit(start)) & (F.col("sjsj") <= F.lit(end))
    )
    joined = lookup_join(
        in_range, dim_loaded.select("cldbs", "rowkey"), on="cldbs"
    )
    deduped = first_wins(
        joined, keys=["rowkey", "sjsj"], order=[F.col("seq").asc()]
    )
    return deduped.select(
        "rowkey",
        F.col("sjsj").alias("rd_date"),
        F.col("zxygz").cast("double").alias("bmz"),
    )


def compute_rdl(
    dim_loaded: DataFrame,
    bmz_long: DataFrame,
    start: dt.date = DEFAULT_START,
    end: dt.date = DEFAULT_END,
) -> DataFrame:
    """Stage 2 — daily consumption (RdlETL2.java:34-141).

    Dense date spine W2 (missing days → bmz 0.0, X6 default,
    RdlETL2.java:89), ratio default 1.0 (RdlETL2.java:76), guarded
    lead-diff W1/F9. Null bmz values read as 0.0 like the reference's
    ``NumberUtils.toDouble("", 0)``.

    The spine join and the window share the same ``rowkey`` hash
    partitioning, so the lead computation adds no extra shuffle beyond the
    spine's own.
    """
    spine = date_spine(
        bmz_long.select("rowkey"), ["rowkey"], start, end, date_col="rd_date"
    )
    dense = spine.join(bmz_long, ["rowkey", "rd_date"], "left").withColumn(
        "bmz", F.coalesce(F.col("bmz"), F.lit(0.0))
    )
    ratio = dim_loaded.select(
        "rowkey", F.coalesce(F.col("zhbl").cast("double"), F.lit(1.0)).alias("_ratio")
    )
    with_ratio = dense.join(F.broadcast(ratio), "rowkey", "left").withColumn(
        "_ratio", F.coalesce(F.col("_ratio"), F.lit(1.0))
    )
    return guarded_lead_diff(
        with_ratio, key="rowkey", order="rd_date", value="bmz",
        ratio=F.col("_ratio"), out="rdl",
    ).select("rowkey", "rd_date", "rdl")


def export_wide(
    dim_loaded: DataFrame,
    bmz_long: DataFrame,
    rdl_long: DataFrame,
    start: dt.date = DEFAULT_START,
    end: dt.date = DEFAULT_END,
) -> DataFrame:
    """Stage 3 — wide export rows (RdlETL3.java:36-144).

    - F6 DATA-marker semantics as a true left-semi join J2: only meters
      with ≥1 loaded reading survive (the marker column was the
      reference's materialization of exactly this).
    - F8 blank-yhbh drop.
    - W3 pivot to the 92 day-columns ``yyyyMMdd`` ending the day BEFORE
      `end` (RdlETL3.java:47-48 uses 2019-07-31; SURVEY §2.5 W2).
    """
    days = []
    d = start
    while d < end:
        days.append(d.strftime("%Y%m%d"))
        d += dt.timedelta(days=1)

    survivors = semi_join(
        dim_loaded.select("rowkey", "yhbh"), bmz_long.select("rowkey"), on="rowkey"
    ).filter(filters.non_blank("yhbh"))

    wide = pivot_days(
        rdl_long.join(survivors.select("rowkey"), "rowkey", "left_semi"),
        key="rowkey", date_col="rd_date", value="rdl", days=days,
    )
    return (
        survivors.join(wide, "rowkey", "left")
        .select("rowkey", F.col("yhbh").alias("YHBH"), *days)
    )


def run_pipeline(
    dim: DataFrame,
    readings: DataFrame,
    out_path: str | None = None,
    start: dt.date = DEFAULT_START,
    end: dt.date = DEFAULT_END,
) -> DataFrame:
    """End-to-end: dim → readings → consumption → wide export (optionally
    written as per-prefix rotated CSV, S7)."""
    dim_loaded = load_dim(dim)
    bmz_long = load_readings(dim_loaded, readings, start, end)
    rdl_long = compute_rdl(dim_loaded, bmz_long, start, end)
    wide = export_wide(dim_loaded, bmz_long, rdl_long, start, end)
    if out_path:
        export = wide.withColumn("prefix", F.substring("rowkey", 1, 4)).drop(
            "rowkey"
        )
        write_csv(export, out_path, partition_by="prefix")
    return wide
