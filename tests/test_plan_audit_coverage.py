"""The committed plan-audit snapshot must cover every registered query —
a stale snapshot means new queries ship un-audited (ADVICE r1)."""

from __future__ import annotations

import json


def test_plan_audit_snapshot_covers_registry():
    import __spark_entry__ as entry

    with open("plan_audit.jsonl") as f:
        lines = [json.loads(line) for line in f if line.strip()]
    audited = {row["query"] for row in lines if "query" in row}
    registered = set(entry.queries())
    missing = sorted(registered - audited)
    assert not missing, f"queries registered but not plan-audited: {missing}"
    stale = sorted(audited - registered)
    assert not stale, f"plan-audit rows for unregistered queries: {stale}"


def test_bench_covers_registry():
    """bench.py derives its list from the registry; pin that invariant."""
    import bench
    import __spark_entry__ as entry

    assert set(bench.BENCH_QUERIES) == set(entry.queries())
