"""§5.2 pipeline-replica golden test: the full 3-stage reference pipeline on
reference-shaped fixtures, asserted cell-by-cell against an independent
row-at-a-time golden implementation (learn_hbase_spark.pipeline.fixtures).

Covers the tricky semantics in one run (SURVEY §7.3): first-wins dedup (D1),
DATA-marker semi-join (F6), rollover/zero/missing-day nulls (F9/X6/W2),
blank-yhbh drop (F8), the 93-vs-92-day boundary (W2), not-null load filter
(F2), orphan drop (J1).
"""

from __future__ import annotations

import glob
import math
import os

import pytest

from learn_hbase_spark.pipeline import fixtures, rdl
from learn_hbase_spark.schemas import DIM_YHCLD, METER_READINGS


@pytest.fixture(scope="module")
def fx():
    return fixtures.generate()


@pytest.fixture(scope="module")
def frames(spark, fx):
    dim = spark.createDataFrame(
        [tuple(r[f.name] for f in DIM_YHCLD.fields) for r in fx.dim_rows],
        DIM_YHCLD,
    )
    readings = spark.createDataFrame(
        [tuple(r[f.name] for f in METER_READINGS.fields) for r in fx.reading_rows],
        METER_READINGS,
    )
    return dim, readings


def test_pipeline_matches_golden(spark, fx, frames):
    dim, readings = frames
    golden = fixtures.golden_export(fx)
    result = rdl.run_pipeline(dim, readings)
    rows = {r["rowkey"]: r.asDict() for r in result.collect()}

    assert set(rows) == set(golden), (
        f"meter set mismatch: extra={set(rows) - set(golden)}, "
        f"missing={set(golden) - set(rows)}"
    )
    for rowkey, gold in golden.items():
        got = rows[rowkey]
        assert got["YHBH"] == gold["YHBH"], rowkey
        for day, want in gold.items():
            if day == "YHBH":
                continue
            have = got[day]
            if want is None:
                assert have is None, f"{rowkey}/{day}: want null, got {have}"
            else:
                assert have is not None, f"{rowkey}/{day}: want {want}, got null"
                assert math.isclose(float(have), want, rel_tol=1e-9), (
                    f"{rowkey}/{day}: {have} != {want}"
                )


def test_pipeline_edge_cases_present(fx):
    """The generator must actually embed the FIXTURES.md checklist."""
    dims = fx.dim_rows
    assert any(r["gdfj_key"] is None for r in dims)
    assert any(r["yhbh"] is None for r in dims)
    assert any(r["zhbl"] is None for r in dims)
    assert any(r["yhbh"] is not None and r["yhbh"].strip() == "" for r in dims)
    reads = fx.reading_rows
    assert any(r["cldbs"].startswith("ORPHAN") for r in reads)
    assert any(r["zxygz"] is None for r in reads)
    seen = {}
    dup = 0
    for r in reads:
        k = (r["cldbs"], r["sjsj"])
        dup += k in seen
        seen[k] = True
    assert dup > 0, "duplicate (cldbs, sjsj) pairs must exist for D1"


def test_csv_export(spark, frames, tmp_path):
    """S7 — per-prefix dirs, header, null→empty-string at the edge."""
    dim, readings = frames
    out = str(tmp_path / "export")
    rdl.run_pipeline(dim, readings, out_path=out)
    part_dirs = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "prefix=*"))
    )
    assert part_dirs == ["prefix=0401", "prefix=0402", "prefix=0403"]
    files = glob.glob(os.path.join(out, "prefix=0401", "*.csv"))
    assert files
    with open(files[0]) as fh:
        header = fh.readline().strip().split(",")
    assert header[0] == "YHBH" and header[1] == "20190501" and header[-1] == "20190731"
    assert len(header) == 1 + 92  # the 92-day export window (W2 boundary)


def test_permissive_csv_quarantines_bad_rows(spark, tmp_path):
    """Malformed rows are captured, not silently dropped (the reference's
    per-row try/catch drops them — SURVEY §2.10)."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.sources.jdbc import read_csv_permissive

    p = tmp_path / "in.csv"
    p.write_text("k,v\na,1\nb,not_an_int\nc,3\n")
    # Spark requires caching before predicates that touch only the
    # corrupt-record column (internal-column restriction)
    df = read_csv_permissive(spark, str(p), "k STRING, v INT").cache()
    rows = {r["k"]: (r["v"], r["_corrupt_record"]) for r in df.collect()}
    assert rows["a"] == (1, None) and rows["c"] == (3, None)
    assert rows["b"][0] is None and "not_an_int" in rows["b"][1]
    good = df.filter(F.col("_corrupt_record").isNull())
    assert good.count() == 2
