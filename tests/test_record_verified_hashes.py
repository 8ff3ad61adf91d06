"""Unit tests for tools/record_verified_hashes.py — the write side of the
edit-reverification guard. Pure-registry: fingerprints are monkeypatched,
no Spark. The three paths under test:

  (1) oracle-green this round        -> re-stamped to the current hash
  (2) rows-only + changed + check OK -> re-stamped (weaker tier, gated)
  (3) changed but not re-checked     -> kept stale (stays at rotation front)
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

from learn_hbase_spark import queries as Q

_TOOL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "record_verified_hashes.py",
)


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "record_verified_hashes_under_test", _TOOL_PATH
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    return tool


@pytest.fixture()
def tool(monkeypatch, tmp_path):
    t = _load_tool()
    # three real registry names standing in for the three paths
    names = ["rdl_flagship", "filter_scan", "prefix_scan"]
    fingerprints = {n: f"cur_{n}" for n in names}
    monkeypatch.setattr(t.Q, "_DRIVER_VERIFIED", names)
    monkeypatch.setattr(t.Q, "query_fingerprint", lambda n: fingerprints[n])
    monkeypatch.setattr(
        t.Q, "_VERIFIED_HASHES_PATH", str(tmp_path / "hashes.json")
    )
    # recorded state: rdl_flagship changed, filter_scan changed,
    # prefix_scan unchanged
    recorded = {
        "rdl_flagship": "old",
        "filter_scan": "old",
        "prefix_scan": "cur_prefix_scan",
    }
    monkeypatch.setattr(t.Q, "recorded_fingerprints", lambda: dict(recorded))
    return t


def _run(tool, tmp_path, rows):
    cfile = tmp_path / "CORRECTNESS_test.json"
    cfile.write_text(json.dumps(rows))
    tool.main([str(cfile)])
    with open(tool.Q._VERIFIED_HASHES_PATH) as fh:
        return json.load(fh)


def test_green_row_restamps_changed_fingerprint(tool, tmp_path):
    rows = {
        "rdl_flagship": {
            "err": None,
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
        }
    }
    rec = _run(tool, tmp_path, rows)
    assert rec["rdl_flagship"] == "cur_rdl_flagship"  # fresh verification
    assert rec["filter_scan"] == "old"  # changed, unchecked -> stale
    assert rec["prefix_scan"] == "cur_prefix_scan"  # unchanged no-op


def test_partial_green_row_does_not_restamp(tool, tmp_path):
    # hash mismatch (or schema/rows) must NOT count as verification
    rows = {
        "rdl_flagship": {
            "err": None,
            "rows_match": True,
            "schema_match": True,
            "hash_match": False,
        }
    }
    rec = _run(tool, tmp_path, rows)
    assert rec["rdl_flagship"] == "old"


def test_rows_only_restamp_requires_passing_declared_check(
    tool, tmp_path, monkeypatch
):
    rows = {"rdl_flagship": {"err": "no_oracle", "spark_rows": 10}}
    calls = []

    monkeypatch.setitem(
        tool._ROWS_ONLY_CHECKS, "rdl_flagship", ["tests/fake::node"]
    )

    # declared check fails -> kept stale
    monkeypatch.setattr(
        tool, "_rows_only_check_passes",
        lambda n: calls.append(n) or False,
    )
    rec = _run(tool, tmp_path, rows)
    assert rec["rdl_flagship"] == "old" and calls == ["rdl_flagship"]

    # declared check passes -> re-stamped
    monkeypatch.setattr(tool, "_rows_only_check_passes", lambda n: True)
    rec = _run(tool, tmp_path, rows)
    assert rec["rdl_flagship"] == "cur_rdl_flagship"


def test_rows_only_without_declared_check_stays_stale(
    tool, tmp_path, monkeypatch
):
    rows = {"rdl_flagship": {"err": "no_oracle", "spark_rows": 10}}
    monkeypatch.setattr(tool, "_ROWS_ONLY_CHECKS", {})
    rec = _run(tool, tmp_path, rows)
    assert rec["rdl_flagship"] == "old"
