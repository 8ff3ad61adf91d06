"""Join operators (SURVEY §2.3).

The reference's only join machinery is a client-heap HashMap built per
prefix (``RdlETL.java:53-79``) — its scalability ceiling. Spark-first:
declare the join, hint broadcast for genuinely small build sides, and let
AQE pick sort-merge + skew splitting when the build side grows at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
