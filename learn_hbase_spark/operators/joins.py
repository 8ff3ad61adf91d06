"""Join operators (SURVEY §2.3).

The reference's only join machinery is a client-heap HashMap built per
prefix (``RdlETL.java:53-79``) — its scalability ceiling. Spark-first:
declare the join, hint broadcast for genuinely small build sides, and let
AQE pick sort-merge + skew splitting when the build side grows at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lookup_join(
    probe: DataFrame, build: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """J1 — broadcast-hash lookup join (RdlETL.java:53-79, 110-114).

    Probe rows with no match are dropped (inner semantics — the reference
    ``continue``s on a miss, RdlETL.java:110-114). ``broadcast`` is a hint:
    if the dim outgrows the threshold on a real cluster, Catalyst falls back
    to shuffle joins rather than OOMing a driver-side HashMap.
    """
    return probe.join(F.broadcast(build), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """J2 — left-semi join. Replaces the reference's materialized DATA="1"
    marker column (written RdlETL.java:122, filtered RdlETL2.java:45-49):
    'keep dim rows that received at least one fact row'."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Complement of J2 (not in the reference; needed by dedup/quality ops)."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the values from the LATEST right row
    with ``right_time <= left_time`` (``direction="backward"``, default —
    the J3 generalization; the reference's adjacent-day self-align,
    RdlETL2.java:83-93, is the trivial per-row case) or the EARLIEST right
    row with ``right_time >= left_time`` (``direction="forward"`` — e.g.
    "next purchase after this click").

    Implemented as union + last/first(ignorenulls) over one ordered
    window, NOT a range join: a theta/range join explodes to |L|x|R|
    candidate pairs per key before filtering, while this shape is one
    shuffle on the key and a single ordered pass — the 100 TB-safe plan.
    The left/right interleaving order at equal timestamps makes the match
    inclusive in both directions (same semantics as DuckDB
    ``ASOF JOIN ... ON l.t >= r.t`` / ``l.t <= r.t``).

    All right values travel in ONE struct column, so (a) every output
    column comes from the same matched right row — a NULL inside the
    matched row stays NULL instead of falling through to an older row,
    and (b) when several right rows share (on..., right_time) the struct
    itself is the deterministic tiebreak (greatest struct wins backward,
    smallest forward), so results don't depend on partition order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rv = F.struct(*[F.col(c) for c in value_cols])
    r_marked = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        rv.alias("_rv"),
    )
    l_marked = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_marked.schema["_rv"].dataType).alias("_rv"),
        F.struct(*left.columns).alias("_lrow"),
    )
    r_marked = r_marked.withColumn(
        "_lrow", F.lit(None).cast(l_marked.schema["_lrow"].dataType)
    )
    u = l_marked.unionByName(r_marked)
    if direction == "backward":
        # rights sort before lefts at equal t -> inclusive match; among
        # tied rights the greatest struct is last, hence picked.
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("_t").asc(),
                F.col("_is_left").asc(),
                F.col("_rv").asc_nulls_first(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last("_rv", ignorenulls=True).over(w)
    else:
        # lefts sort before rights at equal t -> inclusive match; among
        # tied rights the smallest struct is first, hence picked.
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("_t").asc(),
                F.col("_is_left").desc(),
                F.col("_rv").asc_nulls_first(),
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first("_rv", ignorenulls=True).over(w)
    filled = u.select("*", pick.alias("_picked"))
    return filled.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_picked.{c}").alias(c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Time-range (interval) join: pair each left row with right rows whose
    timestamp falls in ``[left_ts + lower_us, left_ts + upper_us]``
    (microseconds), optionally under extra equi keys.

    A naive theta join degenerates to a per-key cross product that Spark
    can only execute as broadcast-nested-loop. Instead, both sides are
    bucketed into fixed windows of ``upper_us - lower_us`` microseconds;
    each left row can only match rights in its own or the adjacent bucket,
    so the left explodes into exactly 2 (bucket) candidates and the join is
    a plain shuffled equi join on (keys..., bucket) with the exact interval
    predicate applied as a post-filter. Candidate blow-up is 2x, not |R|,
    and AQE can still split skewed buckets. Left columns keep their names;
    right columns are suffixed ``_r``.
    """
    width = max(upper_us - lower_us, 1)
    on = on or []
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.select(
        *[F.col(c) for c in left.columns],
        l_us.alias("_l_us"),
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((l_us + F.lit(lower_us)) / width),
                    F.floor((l_us + F.lit(upper_us)) / width),
                )
            )
        ).alias("_bucket"),
    )
    r = right.select(
        *[F.col(c).alias(c if c in on else f"{c}_r") for c in right.columns],
        r_us.alias("_r_us"),
        F.floor(r_us / width).alias("_bucket"),
    )
    gap = F.col("_r_us") - F.col("_l_us")
    return (
        l.join(r, on=[*on, "_bucket"], how="inner")
        .filter((gap >= lower_us) & (gap <= upper_us))
        .drop("_bucket", "_l_us", "_r_us")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-mitigated equi join: split each hot left key across
    `salt_buckets` sub-keys and replicate the (small) right side once per
    bucket, so one dominant key spreads over `salt_buckets` tasks instead of
    pinning a single straggler.

    This is the manual form of what AQE skew-join does adaptively; keep it
    for deterministic plans (e.g. when the skew is known a priori, like the
    reference's 15 coarse rowkey prefixes — SURVEY §7.3 hot-prefix note).
    Left salt is hash-derived from the WHOLE row (deterministic, and — the
    point — independent of the join key, so a hot key's rows spread across
    buckets); right is exploded — correct for inner/left joins on keys, at
    the cost of a `salt_buckets`x right duplication, so only salt when right
    is the small side.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    l_salted = left.withColumn("_salt", salt.cast("int"))
    r_salted = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = l_salted.join(r_salted, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style snapshot diff: classify every key across two snapshots of
    a table as ``added`` / ``deleted`` / ``modified`` / ``unchanged``.

    The reference's pipeline re-runs whole date ranges and relies on
    latest-wins puts to converge (SURVEY §2.8); a diff of two snapshots is
    the audit primitive that tells you WHAT a re-run changed — and the
    input you'd feed a MERGE INTO instead of rewriting the partition.

    One full outer join on the key columns; change detection compares a
    single xxhash64 over the tracked columns (null-tagged per column, so
    NULL vs 'null' can't alias) instead of N per-column null-safe
    comparisons — the comparison payload per row is 8 bytes regardless of
    how wide the tracked column set is. At 100 TB both sides shuffle on
    the same key, and if snapshots are stored bucketed by key the join is
    shuffle-free.
    """
    def _sig(df: DataFrame) -> Column:
        parts = []
        for c in compare_cols:
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
            parts.append(F.col(c).isNull().cast("string"))
        return F.xxhash64(*parts)

    o = old.select(*keys, _sig(old).alias("_sig_old"), F.lit(1).alias("_o"))
    n = new.select(*keys, _sig(new).alias("_sig_new"), F.lit(1).alias("_n"))
    joined = o.join(n, on=keys, how="full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_o").isNull(), F.lit("added"))
        .when(F.col("_n").isNull(), F.lit("deleted"))
        .when(F.col("_sig_old") != F.col("_sig_new"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
