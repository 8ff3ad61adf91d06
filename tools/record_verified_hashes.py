"""Record query fingerprints at VERIFICATION time — the write side of the
edit-reverification guard in ``learn_hbase_spark/queries.py``.

A name in ``_DRIVER_VERIFIED`` only counts as verified while its current
fingerprint (function source + oracle SQL + referenced package-module
sources) matches the one recorded here. This tool is the ONLY writer of
``learn_hbase_spark/_verified_hashes.json``, and it updates a name's hash
only when one of these holds:

  (a) the current fingerprint already equals the recorded one — the code is
      unchanged since its last verification, refreshing is a no-op;
  (b) a CORRECTNESS_r{N}.json passed on the command line shows the name green
      this round (rows+schema+hash match) — a fresh verification of the
      current code;
  (c) the name is a declared rows-only (``no_oracle``) query that the round
      ran AND its declared pytest reference check (``_ROWS_ONLY_CHECKS``)
      passes against the current code — the driver's rows-only row alone is
      too weak a bar to re-stamp changed code.

A name whose code changed since its last verification and which the given
round did NOT re-check keeps its OLD hash, i.e. stays unverified and at the
front of the next sweep's rotation. That closes the round-5 process hole
(edited queries silently keeping a stale verified slot).

Usage:
  python tools/record_verified_hashes.py CORRECTNESS_r06.json   # per round
  python tools/record_verified_hashes.py --init                 # bootstrap
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from learn_hbase_spark import queries as Q  # noqa: E402

# Declared secondary checks for the rows-only (``no_oracle``) queries. The
# driver's rows-only row only proves "ran and returned rows" — far weaker
# than the rows+schema+hash oracle path — so a rows-only query whose
# fingerprint CHANGED since its last verification is re-stamped only after
# its declared pytest reference check passes against the current code. An
# unchanged fingerprint needs no re-proof (refreshing is a no-op), so the
# pytest cost is paid only when the query's answer-defining code moved.
_ROWS_ONLY_CHECKS = {
    "simhash_fingerprints": [
        "tests/test_llm_ops.py::test_simhash_close_for_near_dups",
        "tests/test_llm_ops.py::test_simhash_md5_deterministic_and_near",
    ],
    # approx_profile additionally has a FULL-oracle tolerance twin since
    # r15 (approx_profile_bounds: per-source boolean error-bound verdicts
    # the DuckDB oracle asserts TRUE), so every sweep value-checks the
    # estimates; the sketch-valued query itself stays rows-only.
    "approx_profile": [
        "tests/test_sketches.py::test_approx_distinct_within_rsd",
        "tests/test_sketches.py::test_approx_quantiles_near_exact",
    ],
    # ann_ivf_topk and embedding_kmeans left this table in round 13: the
    # exact_replay Lloyd refinement (modulus sample / decimal-exact
    # rounded means) gave both full chained-CTE DuckDB oracles.
    # pagerank_neardup left this table in round 11: exact_replay gave it
    # a FULL DuckDB oracle (five integer-fixed-point power iterations
    # replayed as chained CTEs), so the driver's value-hash check is the
    # bar again.
    # semantic_dedup left this table in round 13: exact_replay clustering
    # + rounded-cosine pair join + recursive-CTE closure gave it a full
    # DuckDB oracle (the closure needs no round replay — min-reachable-id
    # is algorithm-independent).
    "hll_sketch_rollup": [
        "tests/test_sketches.py::test_hll_rollup_tolerance_and_merge_consistency",
        "tests/test_sketches.py::test_hll_merge_law_partitioning_invariant",
    ],
    # bpe_train_merges and bpe_tokenize left this table in round 12: the
    # chained-CTE training replay gave both FULL DuckDB oracles (all 8
    # integer count->argmax->rewrite cycles), so the driver's value-hash
    # check is the bar again.
}


def _rows_only_check_passes(name: str) -> bool:
    nodes = _ROWS_ONLY_CHECKS.get(name)
    if not nodes:
        print(f"note: rows-only {name} has no declared pytest check; kept stale")
        return False
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", *nodes], cwd=repo
    )
    return res.returncode == 0


def _green(row: dict) -> bool:
    return bool(
        row.get("err") is None
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def _rows_only_ran(row: dict) -> bool:
    return row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0


def main(argv: list[str]) -> None:
    recorded = Q.recorded_fingerprints()
    rows_only_ran: set[str] = set()
    if argv and argv[0] == "--init":
        # Bootstrap: trust _DRIVER_VERIFIED as-is (only valid when HEAD is a
        # state every listed query was verified at — round-5 judge re-check).
        fresh = set(Q._DRIVER_VERIFIED)
    else:
        if not argv:
            raise SystemExit(__doc__)
        with open(argv[0]) as fh:
            rows = json.load(fh)
        fresh = {n for n, row in rows.items() if _green(row)}
        rows_only_ran = {n for n, row in rows.items() if _rows_only_ran(row)}
        stale_green = sorted(
            n
            for n, row in rows.items()
            if _green(row) and n not in Q._DRIVER_VERIFIED
        )
        if stale_green:
            print(
                "note: green names not yet in _DRIVER_VERIFIED "
                f"(add them to the list too): {stale_green}"
            )

    updated, kept_stale = [], []
    for name in Q._DRIVER_VERIFIED:
        if name not in Q._QUERIES:
            continue
        cur = Q.query_fingerprint(name)
        if name in rows_only_ran and recorded.get(name) != cur:
            # Weaker tier: the driver only proved the query ran. Re-stamp a
            # CHANGED rows-only fingerprint only after its declared pytest
            # reference check passes against the current code.
            if _rows_only_check_passes(name):
                updated.append(name)
                recorded[name] = cur
            else:
                kept_stale.append(name)
        elif name in fresh or recorded.get(name) == cur:
            if recorded.get(name) != cur:
                updated.append(name)
            recorded[name] = cur
        else:
            kept_stale.append(name)

    with open(Q._VERIFIED_HASHES_PATH, "w") as fh:
        json.dump(dict(sorted(recorded.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"recorded {len(recorded)} fingerprints "
        f"({len(updated)} updated: {updated or '-'}; "
        f"{len(kept_stale)} changed-but-unverified kept stale: "
        f"{kept_stale or '-'})"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
