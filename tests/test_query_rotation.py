"""The edit-reverification guard: a verified query whose code (or oracle, or
a referenced operator module) changes must drop out of the verified tail and
re-enter the FRONT of the driver's rotation — no Spark needed, pure registry
mechanics."""

from __future__ import annotations

from learn_hbase_spark import queries as Q


def test_keep_latest_dedup():
    assert Q._keep_latest(["a", "b", "a", "c", "b"]) == ["a", "c", "b"]
    assert Q._keep_latest([]) == []
    assert Q._keep_latest(["x"]) == ["x"]


def test_fingerprints_are_stable_and_per_query():
    a = Q.query_fingerprint("agg_pricing_summary")
    assert a == Q.query_fingerprint("agg_pricing_summary")
    assert a != Q.query_fingerprint("group_topk")


def test_fingerprint_covers_referenced_operator_module():
    """An edit to operators/dedup.py must invalidate queries built on it:
    the dedup module's source is part of their fingerprint parts."""
    parts = Q._fingerprint_parts(Q._QUERIES["winnow_match_pairs"])
    assert "mod:learn_hbase_spark.operators.dedup" in parts
    # and queries-local helpers are followed (the _t loader)
    assert "fn:_t" in parts


def test_fingerprint_covers_transitive_package_imports():
    """tokenizer.py does ``from .dedup import normalize_text`` — an edit to
    dedup.normalize_text changes bpe_pair_counts' ANSWER, so dedup.py must be
    in its fingerprint even though the query never references dedup directly
    (the round-6 ADVICE hole)."""
    parts = Q._fingerprint_parts(Q._QUERIES["bpe_pair_counts"])
    assert "mod:learn_hbase_spark.operators.tokenizer" in parts
    assert "mod:learn_hbase_spark.operators.dedup" in parts
    # corpus.py imports normalize_text the same way
    parts = Q._fingerprint_parts(Q._QUERIES["lm_score"])
    assert "mod:learn_hbase_spark.operators.dedup" in parts


def test_changed_fingerprint_moves_query_to_rotation_front():
    recorded = {n: Q.query_fingerprint(n) for n in Q._DRIVER_VERIFIED}
    verified = Q._verified_against(recorded)
    assert verified == [n for n in Q._DRIVER_VERIFIED if n in Q._QUERIES]

    # tamper one recorded hash = "this query's code changed since its
    # verification": it must leave the verified tail
    victim = Q._DRIVER_VERIFIED[-1]
    recorded[victim] = "0" * 64
    verified = Q._verified_against(recorded)
    assert victim not in verified

    # and in the resulting rotation it sits in the unverified FRONT section
    order = list(Q._QUERIES)
    front = [n for n in order if n not in set(verified)]
    rotation = front + [n for n in verified]
    assert rotation.index(victim) < len(front)
    assert set(rotation) == set(order)


def test_recorded_file_only_contains_registered_names():
    recorded = Q.recorded_fingerprints()
    assert recorded, "bootstrap _verified_hashes.json missing"
    assert set(recorded) <= set(Q._QUERIES)


def test_rows_only_checks_cover_exactly_the_no_oracle_tail():
    """tools/record_verified_hashes.py re-stamps a changed rows-only query
    only after its declared pytest check passes — that tier map must track
    the registry exactly: every no-oracle query has a declared check, and
    no stale entries linger for queries that gained an oracle."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "record_verified_hashes",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "record_verified_hashes.py",
        ),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    rows_only = set(Q._QUERIES) - set(Q._ORACLES)
    assert set(tool._ROWS_ONLY_CHECKS) == rows_only
    for name, nodes in tool._ROWS_ONLY_CHECKS.items():
        assert nodes, f"{name} has an empty check list"


def test_package_module_closure_terminates_on_import_cycles():
    """Two package modules importing each other must not loop the closure
    walk — the visited-set guard, pinned with synthetic cyclic modules."""
    import os
    import types

    import learn_hbase_spark

    pkgdir = os.path.dirname(learn_hbase_spark.__file__)
    a = types.ModuleType("learn_hbase_spark._fake_a")
    b = types.ModuleType("learn_hbase_spark._fake_b")
    a.__file__ = os.path.join(pkgdir, "queries.py")
    b.__file__ = os.path.join(pkgdir, "tables.py")
    a.dep, b.dep = b, a  # cycle

    parts = Q._package_module_closure(a)
    assert "mod:learn_hbase_spark._fake_a" in parts
    assert "mod:learn_hbase_spark._fake_b" in parts
    assert len(parts) == 2


def test_sweep_priority_names_lead_the_rotation_front(monkeypatch):
    """_SWEEP_PRIORITY names (new or answer-changed this round) take the
    first rotation slots while unverified; verified names stay in the
    tail regardless of priority; unknown priority names are inert."""
    names = list(Q._QUERIES)
    pri = [n for n in Q._SWEEP_PRIORITY if n in Q._QUERIES]
    assert pri, "priority list should name registered queries"
    # pretend everything EXCEPT the priority names is verified
    monkeypatch.setattr(
        Q, "_still_verified", lambda: tuple(n for n in names if n not in pri)
    )
    rotated = list(Q.queries())
    assert rotated[: len(pri)] == pri
    # now pretend a priority name is ALSO verified: it must move to the
    # tail (priority only orders the unverified front)
    monkeypatch.setattr(Q, "_still_verified", lambda: (pri[0],))
    rotated2 = list(Q.queries())
    assert rotated2[-1] == pri[0]
    assert rotated2[: len(pri) - 1] == pri[1:]
