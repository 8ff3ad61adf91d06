"""Sequence packing — grouping documents into token-budgeted training rows.

LLM pretraining consumes fixed-length sequences; short documents are packed
together to avoid padding waste. Exact bin packing (first-fit-decreasing)
is inherently sequential, so the distributed formulation is *streamed
contiguous packing*: shard the corpus into independent packing streams by
identity hash, order each stream deterministically, and cut it into bins
wherever the running token count crosses the budget.

Scale posture: one window (cumulative sum) per stream, and streams are
hash-sharded — parallelism = 16^group_chars, tunable; each stream's window
state is a single running counter, so no stream ever needs to fit in
memory. Everything is engine-portable (md5 sharding + standard SQL window),
so the DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: Column,
    budget: int,
    group_chars: int = 2,
) -> DataFrame:
    """Assign each row a ``(pack_group, seq_id)`` packing address.

    ``seq_id = floor(tokens_before_this_row_in_group / budget)`` — a row
    starts a new sequence when the tokens already packed ahead of it fill
    the budget. Rows longer than the budget occupy their bin alone plus
    overflow (truncation policy is the caller's concern).
    """
    grp = F.substring(F.md5(F.col(id_col).cast("string")), 1, group_chars)
    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            grp.alias("pack_group"),
            token_count_col.alias("_n"),
        )
        .withColumn(
            "seq_id",
            F.floor(
                F.coalesce(F.sum("_n").over(w), F.lit(0)) / F.lit(float(budget))
            ),
        )
        .drop("_n")
    )
