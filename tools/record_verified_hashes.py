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
      this round (rows+schema+hash match, or the driver's declared rows-only
      ``no_oracle`` check) — a fresh verification of the current code.

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


def _green(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        return True  # declared rows-only check: ran and returned rows
    return bool(
        row.get("err") is None
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def main(argv: list[str]) -> None:
    recorded = Q.recorded_fingerprints()
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
        if name in fresh or recorded.get(name) == cur:
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
