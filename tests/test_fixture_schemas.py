"""Fixture-drift tripwire: pin the LOADED dtypes of all ten driver tables.

Round 3 lost its entire bench run because the driver silently regenerated
``/root/testdata`` with ``events.ts`` as parquet ``timestamp[us]`` where the
loader assumed BIGINT nanos — 12 tests and 4 gated queries failed with the
same root cause, none of them pointing at the loader. This file makes the
next regeneration fail in exactly one obvious place.

Two layers:
- parquet-footer (pyarrow) checks: what the fixture PHYSICALLY stores. For
  ``events.ts`` any of nanos / micros / millis is acceptable — the loader
  branches on dtype (``sources/testdata.py``).
- loaded-DataFrame checks: what every consumer actually SEES after
  ``load_table`` — the normalized contract (``ts`` is always TIMESTAMP).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from cargo_chat_spark.sources.testdata import TABLES, load_table

from tests.conftest import SF_DIR_SMALL

# dtype every consumer sees after load_table (the normalized contract)
EXPECTED_LOADED = {
    "region": {"r_regionkey": T.IntegerType(), "r_name": T.StringType()},
    "nation": {
        "n_nationkey": T.IntegerType(),
        "n_name": T.StringType(),
        "n_regionkey": T.IntegerType(),
    },
    "customer": {
        "c_custkey": T.LongType(),
        "c_name": T.StringType(),
        "c_nationkey": T.IntegerType(),
        "c_acctbal": T.DoubleType(),
        "c_mktsegment": T.StringType(),
    },
    "supplier": {
        "s_suppkey": T.LongType(),
        "s_name": T.StringType(),
        "s_nationkey": T.IntegerType(),
        "s_acctbal": T.DoubleType(),
    },
    "part": {
        "p_partkey": T.LongType(),
        "p_name": T.StringType(),
        "p_brand": T.StringType(),
        "p_type": T.StringType(),
        "p_size": T.IntegerType(),
        "p_retailprice": T.DoubleType(),
    },
    "orders": {
        "o_orderkey": T.LongType(),
        "o_custkey": T.LongType(),
        "o_orderstatus": T.StringType(),
        "o_totalprice": T.DoubleType(),
        # timestamp[us] no-tz parquet loads as NTZ (Spark infers NTZ for
        # isAdjustedToUTC=false); consumers treat it as a date-like column
        "o_orderdate": (T.TimestampType(), T.TimestampNTZType()),
        "o_orderpriority": T.StringType(),
    },
    "lineitem": {
        "l_orderkey": T.LongType(),
        "l_partkey": T.LongType(),
        "l_suppkey": T.LongType(),
        "l_linenumber": T.IntegerType(),
        "l_quantity": T.DoubleType(),
        "l_extendedprice": T.DoubleType(),
        "l_discount": T.DoubleType(),
        "l_tax": T.DoubleType(),
        "l_returnflag": T.StringType(),
        "l_linestatus": T.StringType(),
        "l_shipdate": (T.TimestampType(), T.TimestampNTZType()),
    },
    "events": {
        "event_id": T.LongType(),
        # the one column with fixture-generation drift: load_table MUST
        # normalize it to plain TIMESTAMP whatever the parquet stores
        "ts": T.TimestampType(),
        "user_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
        "props": T.StringType(),
    },
    "documents": {
        "doc_id": T.LongType(),
        "text": T.StringType(),
        "lang": T.StringType(),
        "source": T.StringType(),
        "n_chars": T.LongType(),
    },
    "embeddings": {
        "vec_id": T.LongType(),
        "embedding": T.ArrayType(T.FloatType()),
        "label": T.IntegerType(),
    },
}

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("table", TABLES)
def test_loaded_schema_matches_contract(spark, table):
    df = load_table(spark, SF_DIR_SMALL, table)
    expected = EXPECTED_LOADED[table]
    actual = {f.name: f.dataType for f in df.schema.fields}
    assert list(actual) == list(expected), (
        f"{table}: column set/order drifted: {list(actual)} != {list(expected)}"
    )
    for col, want in expected.items():
        allowed = want if isinstance(want, tuple) else (want,)
        assert actual[col] in allowed, (
            f"{table}.{col}: loaded dtype {actual[col]} not in {allowed} — "
            "fixture regeneration changed the physical type; fix "
            "cargo_chat_spark/sources/testdata.py (load_table), not the "
            "12 downstream consumers"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_physical_type_is_known(sf_dir):
    """The loader only understands these physical encodings of events.ts;
    a new one must be added to the dtype branch in load_table first."""
    t = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).schema_arrow.field(
        "ts"
    ).type
    assert str(t) in ("timestamp[ns]", "timestamp[us]", "timestamp[ms]", "int64"), (
        f"{sf_dir}/events.parquet stores ts as {t}; teach load_table this "
        "encoding before anything else"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_present(sf_dir):
    missing = [
        t for t in TABLES if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    ]
    assert not missing, f"{sf_dir} missing fixture tables: {missing}"
