"""Measure the pretraining_run capstone's analyzed-plan growth WITH and
WITHOUT the curate→dedup localCheckpoint seam (VERDICT r14 task 6).

The capstone's scale claim is structural, not volumetric: the survivor
frame has three consumers (LSH pairs, CC nodes, canonical join) and the
downstream chunk/tokenize/pack stages self-join, so WITHOUT the seam the
analyzed logical plan replicates the entire curation lineage once per
reference — multiplicatively per downstream join — until the driver dies
building plan strings. Plan size is data-independent, so the evidence is
measured at sf0.001 and holds at any corpus size.

Metrics per arm:
- ``analyzed_nodes``: logical-plan tree size counted by py4j traversal
  (children + CTE/subquery innerChildren), CAPPED — counting avoids
  materializing the multi-GB plan STRING that is the failure mode being
  demonstrated;
- ``analyzed_str_len``: length of the analyzed plan's string rendering,
  attempted only when the node count stayed under the cap (the no-seam
  arm is expected to blow past it; rendering it would OOM the driver,
  which is the point).

Usage: python tools/capstone_plan_size.py [cap]
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
DEFAULT_CAP = 1_000_000


def count_nodes(jplan, cap: int) -> tuple[int, bool]:
    """Tree size of a Catalyst plan via py4j child traversal; returns
    (count, capped). innerChildren picks up WithCTE / subquery bodies."""
    stack = [jplan]
    n = 0
    while stack:
        node = stack.pop()
        n += 1
        if n >= cap:
            return n, True
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        inner = node.innerChildren()
        for i in range(inner.size()):
            stack.append(inner.apply(i))
    return n, False


def measure(df, cap: int) -> dict:
    jplan = df._jdf.queryExecution().analyzed()
    nodes, capped = count_nodes(jplan, cap)
    out = {"analyzed_nodes": nodes, "node_count_capped": capped}
    if not capped:
        out["analyzed_str_len"] = len(jplan.toString())
    else:
        out["analyzed_str_len"] = None  # rendering would OOM the driver
    return out


def main() -> int:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_CAP

    from learn_hbase_spark import queries as Q
    from learn_hbase_spark import session

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    from plan_audit import no_localcheckpoint

    spark = session.get_session()
    with_seam = measure(Q.pretraining_run(spark, SF_DIR), cap)
    with no_localcheckpoint():
        without_seam = measure(Q.pretraining_run(spark, SF_DIR), cap)
    print(
        json.dumps(
            {
                "query": "pretraining_run",
                "sf_dir": SF_DIR,
                "cap": cap,
                "with_seam": with_seam,
                "without_seam": without_seam,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
