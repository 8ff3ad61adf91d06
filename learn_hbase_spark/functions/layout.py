"""Data-layout functions: multi-dimensional clustering keys.

At 100 TB the dominant cost is scan I/O, and min/max file statistics only
prune what the sort order clusters. A linear sort clusters ONE dimension;
a Z-order (Morton) key interleaves the bits of two dimensions so files
written in z-key order are simultaneously range-prunable on either — the
same layout trick Delta's OPTIMIZE ZORDER applies, expressed here as a
plain deterministic column so any writer (`write.sortBy`, `repartitionByRange`)
can use it. Pure JVM bit arithmetic: no UDF, fully codegen-able.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic-number bit spreads: 16 bits -> even bit positions of 32
_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of `c` to the even bit positions (0,2,..,30)."""
    out = c.bitwiseAND(F.lit(0xFFFF).cast("long"))
    for shift, mask in _SPREAD_MASKS:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(
            F.lit(mask).cast("long")
        )
    return out


def morton2(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two non-negative int columns into one
    32-bit Z-order key: bit i of `a` lands at position 2i, bit i of `b` at
    2i+1. Sorting by the result clusters both dimensions at once (quadrant
    by quadrant), which is what makes per-file min/max stats selective on
    either column. Inputs beyond 16 bits should be bucketed/truncated by
    the caller — the key is a LAYOUT device, not an identifier."""
    return _spread16(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread16(b.cast("long")), 1)
    )
