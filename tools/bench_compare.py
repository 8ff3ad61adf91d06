"""Compare two bench JSON lines (e.g. BENCH_r1.json vs a fresh run):
per-query deltas sorted by regression, plus totals.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold_ratio]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    def load(p):
        d = json.load(open(p))
        return d.get("parsed", d)  # driver BENCH_r{N}.json wraps under "parsed"

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq), key=lambda q: -(nq[q] / max(oq[q], 1e-9)))
    print(f"total: {old['value']}s -> {new['value']}s "
          f"({len(oq)} -> {len(nq)} queries)")
    regressions = 0
    for q in shared:
        ratio = nq[q] / max(oq[q], 1e-9)
        if ratio >= thresh or ratio <= 1 / thresh:
            tag = "REGRESSED" if ratio >= thresh else "improved"
            if ratio >= thresh:
                regressions += 1
            print(f"  {tag:9s} {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s ({ratio:.2f}x)")
    for q in sorted(set(nq) - set(oq)):
        print(f"  new       {q}: {nq[q]:.2f}s")
    print(f"{regressions} regressions over {thresh}x among {len(shared)} shared")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
