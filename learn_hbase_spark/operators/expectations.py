"""Declarative data-quality expectations (Deequ-style, single-pass).

The reference hand-rolls its validity checks inline (null guards in
``RdlETL2.java``, family checks in ``HBaseClient.java:95-111``); a real
deployment wants them DECLARED once and evaluated in ONE aggregation pass
over the table — at 100 TB you cannot afford a scan per rule.

Every rule compiles to a conditional aggregate over the same scan, so N
rules cost exactly one job, one exchange, and the output is a bounded
(one row per rule) report frame that can gate a pipeline (fail when any
``passed`` is false) or land in a quality history table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative rule.

    ``kind='fraction'`` (default): a row-level boolean ``condition`` and
    the minimum fraction of rows that must satisfy it (1.0 = all).
    ``kind='unique'``: column-level uniqueness over ``col`` — not
    row-local, so it carries the column explicitly instead of a condition
    (no sentinel values, no name parsing)."""

    name: str
    condition: Column | None = None
    min_fraction: float = 1.0
    kind: str = "fraction"
    col: str | None = None

    def __post_init__(self):
        if self.kind == "fraction" and self.condition is None:
            raise ValueError(f"rule {self.name!r}: fraction rule needs a condition")
        if self.kind == "unique" and self.col is None:
            raise ValueError(f"rule {self.name!r}: unique rule needs col")
        if self.kind not in ("fraction", "unique"):
            raise ValueError(f"rule {self.name!r}: unknown kind {self.kind!r}")


def not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNotNull())


def unique(col: str) -> Expectation:
    """Uniqueness is NOT row-local; it is expressed as a separate
    count-distinct aggregate in the same pass (distinct == total),
    reported like a rule with observed fraction = distinct/total."""
    return Expectation(f"{col}_unique", kind="unique", col=col)


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"{col}_between_{lo}_{hi}",
        F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def matches(col: str, pattern: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"{col}_matches", F.col(col).rlike(pattern)
    )


def check(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass over ``df``.

    Returns one row per rule: ``(rule, n_rows, n_satisfied,
    observed_fraction, min_fraction, passed)``. Rows are unpivoted from a
    single wide aggregate, so the plan has exactly one exchange no matter
    how many rules are declared.
    """
    def _slot(name: str) -> str:
        # rule names may contain dots etc.; internal aliases must be plain
        # identifiers so F.col doesn't parse them as nested fields
        return "_s_" + re.sub(r"\W", "_", name)

    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate rule names: {dupes}")
    slots = {_slot(r.name) for r in rules}
    if len(slots) != len(rules):
        raise ValueError(
            "rule names collide after identifier-sanitization; rename rules"
        )

    aggs = [F.count(F.lit(1)).alias("_total")]
    for r in rules:
        if r.kind == "unique":
            aggs.append(F.count_distinct(F.col(r.col)).alias(_slot(r.name)))
        else:
            aggs.append(
                F.count(F.when(r.condition, 1)).alias(_slot(r.name))
            )
    wide = df.agg(*aggs)
    reports = []
    for r in rules:
        want = 1.0 if r.kind == "unique" else r.min_fraction
        sat = F.col(_slot(r.name))
        reports.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("_total").alias("n_rows"),
                sat.alias("n_satisfied"),
                # raw IEEE division (NOT round()): both engines compute the
                # identical double, while round() implementations differ at
                # representation boundaries
                (sat / F.greatest(F.col("_total"), F.lit(1))).alias(
                    "observed_fraction"
                ),
                F.lit(want).alias("min_fraction"),
                (
                    sat >= F.ceil(F.lit(want) * F.col("_total")).cast("long")
                ).alias("passed"),
            )
        )
    return wide.select(
        F.explode(F.array(*reports)).alias("r")
    ).select("r.*")
