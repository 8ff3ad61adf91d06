"""Print the physical plan of any registered query — the .explain feedback
loop as a one-liner.

Usage: python tools/explain.py <query> [mode] [sf_dir]
  mode: formatted (default) | simple | extended | cost | codegen
"""

from __future__ import annotations

import sys


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else None
    mode = sys.argv[2] if len(sys.argv) > 2 else "formatted"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    qs = entrymod.queries()
    if name is None or name not in qs:
        print("usage: python tools/explain.py <query> [mode] [sf_dir]")
        print("queries:", " ".join(qs))
        return 1

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs[name](spark, sf_dir).explain(mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
