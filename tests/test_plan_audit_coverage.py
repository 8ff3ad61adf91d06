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


def test_plan_audit_has_no_blind_rows():
    """No audit row may be all-zero across every operator family (VERDICT
    r11: checkpoint-truncated iterative queries read as 0 scans / 0
    exchanges / 0 joins, so the registry-wide no-NLJ and pushed-scan
    invariants silently skipped exactly the iterative operators).
    Iterative queries are now audited un-checkpointed
    (tools/plan_audit.UNCHECKPOINTED_AUDIT) or through a registered
    loop-body frame (queries._AUDIT_BODIES); a fresh all-zero row means a
    new iterative query shipped without either."""
    import json

    keys = (
        "exchanges", "broadcast_hash_joins", "sort_merge_joins",
        "shuffled_hash_joins", "nested_loop_joins", "scans",
        "window_ops", "python_ops",
    )
    with open("plan_audit.jsonl") as f:
        rows = [json.loads(line) for line in f if line.strip()]
    blind = sorted(
        row["query"]
        for row in rows
        if "query" in row and all(row.get(k, 0) == 0 for k in keys)
    )
    assert not blind, f"plan-audit rows blind to their executed plan: {blind}"


def test_plan_audit_summary_matches_rows():
    """The trailing summary line must be recomputable from the query rows
    (VERDICT r14: two registrations bumped rows without bumping the
    summary — the visible record of the registry-wide no-NLJ invariant
    must not be able to drift from the rows it summarizes)."""
    import sys

    sys.path.insert(0, "tools")
    import plan_audit

    with open("plan_audit.jsonl") as f:
        lines = [json.loads(line) for line in f if line.strip()]
    qrows = [r for r in lines if "query" in r]
    summary_rows = [r for r in lines if "summary" in r]
    assert len(summary_rows) == 1 and "summary" in lines[-1], (
        "exactly one summary line, and it must be LAST"
    )
    allowed = set(plan_audit.NESTED_LOOP_ALLOWED)
    want = {
        "queries": len(qrows),
        "exchanges": sum(r.get("exchanges", 0) for r in qrows),
        "nested_loop_joins": sum(
            r.get("nested_loop_joins", 0)
            for r in qrows
            if r["query"] not in allowed
        ),
    }
    assert summary_rows[0]["summary"] == want
    assert summary_rows[0]["nested_loop_failures"] == []


def test_plan_audit_iterative_queries_are_covered():
    """Every UNCHECKPOINTED_AUDIT / _AUDIT_BODIES name must be a registered
    query (a rename would silently drop the un-truncated audit), and the
    two mechanisms must not overlap (the body would shadow the
    un-checkpointed audit)."""
    import sys

    import __spark_entry__ as entry
    from learn_hbase_spark import queries as qmod

    sys.path.insert(0, "tools")
    import plan_audit

    registered = set(entry.queries())
    unchk = set(plan_audit.UNCHECKPOINTED_AUDIT)
    bodies = set(qmod._AUDIT_BODIES)
    assert unchk <= registered, unchk - registered
    assert bodies <= registered, bodies - registered
    assert not (unchk & bodies), unchk & bodies
