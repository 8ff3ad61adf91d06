"""Deterministic reference-shaped fixtures (FIXTURES.md §B), seed=42.

Generates the B1 dim / B2 readings tables with every edge case from the
FIXTURES.md checklist embedded, plus a pure-Python golden computation of the
expected stage-3 export (independent of Spark — loop-style, mirroring the
reference's own RdlETL2.java:83-104 semantics) for the §5.2 golden test.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass
from decimal import Decimal


def _dec(x: float | int | None) -> Decimal | None:
    return None if x is None else Decimal(str(x))

START = dt.date(2019, 5, 1)
END = dt.date(2019, 8, 1)  # compute end (93 days); export ends END-1


@dataclass
class Fixture:
    dim_rows: list[dict]  # B1: gdfj_key, cldbs, yhbh, zhbl, dqbh
    reading_rows: list[dict]  # B2: cldbs, sjsj, zxygz, gddwbm, seq


def generate(n_meters_per_prefix: int = 40, n_prefixes: int = 3) -> Fixture:
    rng = random.Random(42)
    dim_rows: list[dict] = []
    reading_rows: list[dict] = []
    seq = 0
    days = [(START + dt.timedelta(days=i)) for i in range((END - START).days + 1)]

    meter_no = 0
    for p in range(1, n_prefixes + 1):
        prefix = f"04{p:02d}"
        dqbh = 40000 + p * 100
        for m in range(n_meters_per_prefix):
            meter_no += 1
            cldbs = f"M{meter_no:06d}"
            gdfj_key = f"{prefix}X{rng.randint(100, 999)}"
            yhbh = f"U{meter_no:06d}"
            zhbl = rng.choice([1, 40, 80])
            kind = meter_no % 10
            # checklist 1: NULL gdfj_key / yhbh / zhbl rows (dropped, F2)
            if kind == 1:
                gdfj_key = None
            elif kind == 2:
                yhbh = None
            elif kind == 3:
                zhbl = None
            # checklist 2: blank-but-non-null yhbh (survives load, dropped F8)
            elif kind == 4:
                yhbh = "  "
            dim_rows.append(
                dict(gdfj_key=gdfj_key, cldbs=cldbs, yhbh=yhbh,
                     zhbl=_dec(zhbl), dqbh=dqbh)
            )
            # checklist 8: meter with no readings at all (excluded by F6)
            if kind == 5:
                continue
            base = rng.uniform(100, 10000)
            val = base
            rollover_day = rng.randrange(10, 80) if kind == 6 else None
            for i, day in enumerate(days):
                # checklist 7: ~3% missing days
                if rng.random() < 0.03:
                    continue
                val += rng.uniform(0, 50)
                zxygz = round(val, 4)
                if kind == 7 and i % 3 == 0:
                    zxygz = 0.0  # checklist 6: zero-reading days
                if rollover_day is not None and i == rollover_day:
                    val = base / 2  # checklist 5: rollover (decrease)
                    zxygz = round(val, 4)
                if kind == 8 and i % 7 == 0:
                    zxygz = None  # NULL register values (X7 edge)
                reading_rows.append(
                    dict(cldbs=cldbs, sjsj=day, zxygz=_dec(zxygz),
                         gddwbm=f"{prefix}D{rng.randint(10, 99)}", seq=seq)
                )
                seq += 1
                # checklist 4: ~2% duplicate (cldbs, sjsj), later arrival
                if rng.random() < 0.02:
                    reading_rows.append(
                        dict(cldbs=cldbs, sjsj=day,
                             zxygz=_dec(round((zxygz or 0) + 999, 4)),
                             gddwbm=f"{prefix}D{rng.randint(10, 99)}", seq=seq)
                    )
                    seq += 1
    # checklist 3: orphan cldbs readings (dropped by J1)
    for i in range(30):
        day = rng.choice(days)
        reading_rows.append(
            dict(cldbs=f"ORPHAN{i:03d}", sjsj=day,
                 zxygz=_dec(round(rng.uniform(1, 100), 4)),
                 gddwbm=f"0401D{rng.randint(10, 99)}", seq=seq)
        )
        seq += 1
    return Fixture(dim_rows, reading_rows)


def golden_export(fx: Fixture) -> dict[str, dict[str, float | None]]:
    """Reference-semantics golden: {rowkey: {'YHBH':..., 'yyyyMMdd': rdl}}.

    Independent row-at-a-time re-implementation of RdlETL2.java:83-104 /
    RdlETL3.java:99-109 (loop over days, defaults 0.0/1.0, guard, first-wins
    dedup by seq, semi-join marker, blank-yhbh drop).
    """
    # stage 1a: load dim (F2 not-null filter, X1 rowkey)
    dim = {}
    for r in fx.dim_rows:
        if r["gdfj_key"] is None or r["yhbh"] is None or r["zhbl"] is None:
            continue
        rowkey = f"{r['gdfj_key']}_{r['cldbs']}"
        dim[r["cldbs"]] = dict(rowkey=rowkey, yhbh=r["yhbh"], zhbl=float(r["zhbl"]))

    # stage 1b: join J1 + first-wins dedup D1 (by arrival seq)
    bmz: dict[str, dict[dt.date, float | None]] = {}
    for r in sorted(fx.reading_rows, key=lambda r: r["seq"]):
        d = dim.get(r["cldbs"])
        if d is None:
            continue
        per = bmz.setdefault(d["rowkey"], {})
        if r["sjsj"] in per:
            continue  # first wins
        per[r["sjsj"]] = None if r["zxygz"] is None else float(r["zxygz"])

    # stage 2+3: spine, defaults, guarded lead-diff, export filter
    n_days = (END - START).days + 1
    out: dict[str, dict[str, float | None]] = {}
    by_rowkey = {d["rowkey"]: d for d in dim.values()}
    for rowkey, per in bmz.items():
        info = by_rowkey[rowkey]
        if not info["yhbh"].strip():
            continue  # F8
        row: dict[str, float | None] = {"YHBH": info["yhbh"]}
        for i in range(n_days - 1):  # export ends END-1 (92 columns)
            day = START + dt.timedelta(days=i)
            nxt = day + dt.timedelta(days=1)
            cur = per.get(day)
            tom = per.get(nxt)
            cur = 0.0 if cur is None else cur
            tom = 0.0 if tom is None else tom
            if cur > 0 and tom > 0 and tom >= cur:
                row[day.strftime("%Y%m%d")] = (tom - cur) * info["zhbl"]
            else:
                row[day.strftime("%Y%m%d")] = None
        out[rowkey] = row
    return out
