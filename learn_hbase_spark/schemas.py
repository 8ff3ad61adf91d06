"""Typed schemas.

The reference stores everything as stringified bytes and re-types at read
time (``HBaseClient.java:104``, ``RdlETL2.java:76-99`` — SURVEY §1.4). Here
types are declared once; nulls stay nulls until an edge requires a default.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; FIXTURES.md §A)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Reference-shaped fixtures (FIXTURES.md §B) — inputs to the pipeline replica
# ---------------------------------------------------------------------------

# dim_yhcld: meter dimension (YhCldETL.java:58-63). gdfj_key's first 4 chars
# are the partition prefix "04%02d" (YhCldETL.java:30, SURVEY §1.2).
DIM_YHCLD = StructType(
    [
        StructField("gdfj_key", StringType()),
        StructField("cldbs", StringType()),
        StructField("yhbh", StringType()),
        StructField("zhbl", DecimalType(18, 6)),
        StructField("dqbh", IntegerType()),
    ]
)

# meter_readings: daily register readings (RdlETL.java:86-88). `seq` fixes
# arrival order so first-wins dedup (D1, RdlETL.java:112-114) is deterministic.
METER_READINGS = StructType(
    [
        StructField("cldbs", StringType()),
        StructField("sjsj", DateType()),
        StructField("zxygz", DecimalType(18, 4)),
        StructField("gddwbm", StringType()),
        StructField("seq", LongType()),
    ]
)
