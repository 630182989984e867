"""Driver-local DataFrames without the parallelize() Python-RDD path.

``spark.createDataFrame(list_of_tuples, ...)`` backs the frame with a
Python RDD split into ``defaultParallelism`` slices — every downstream
use schedules a 32-task stage in which each task round-trips through a
Python worker to deserialize a one-row slice. Profiling (r14) showed
these stages as the "run time high, JVM CPU ~0" pattern dominating the
ANN/index/lifecycle queries: ~0.3-0.5 s per use warm, 1-2 s cold, per
tiny centroid/query-literal frame.

``local_frame`` routes the same rows through a pandas DataFrame instead:
with Arrow enabled the driver serializes the batch once and the JVM
consumes it without any Python worker involvement (measured 6x faster in
a broadcast-probe loop at 32 cells x 64 dims). Anything the pandas path
cannot faithfully represent (empty input, non-DDL schemas, timestamp /
struct / map fields) falls back to the original ``createDataFrame``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_UNSAFE_DDL_TOKENS = ("timestamp", "struct<", "map<", "date", "decimal")


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small driver-local frame; drop-in for
    ``spark.createDataFrame(rows, schema)`` with a string DDL schema."""
    if not isinstance(schema, str) or not isinstance(rows, (list, tuple)):
        return spark.createDataFrame(rows, schema)
    low = schema.lower()
    if not rows or any(t in low for t in _UNSAFE_DDL_TOKENS):
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd
        from pyspark.sql.types import _parse_datatype_string

        st = _parse_datatype_string(schema)
        names = [f.name for f in st.fields]
        first = rows[0]
        if not isinstance(first, (tuple, list)) or len(first) != len(names):
            return spark.createDataFrame(rows, schema)
        pdf = pd.DataFrame.from_records(list(rows), columns=names)
        return spark.createDataFrame(pdf, schema=st)
    except Exception:
        return spark.createDataFrame(rows, schema)
