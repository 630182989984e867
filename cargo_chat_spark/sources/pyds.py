"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-events connector with partitioned parallel reads AND Python-side
filter pushdown.

Why it exists: the engine's other sources are files (parquet fixtures,
repo walks, the index importer). A 100 TB pipeline also pulls from
service-shaped sources — internal APIs, synthetic load generators, legacy
stores — and Spark 4's Python DataSource API is the idiomatic way to wrap
those without a JVM connector. This module demonstrates the full surface
the engine would use for any such connector:

- ``partitions()`` → N independent row-range splits (reads scale out
  exactly like a parquet scan; no driver bottleneck),
- ``pushFilters()`` → ``event_type = X`` / ``user_id`` range predicates
  are applied INSIDE the generator (Spark re-applies what we return, so
  handled filters cut rows at the source — the Python analog of parquet
  PushedFilters),
- deterministic generation (md5-counter; same rows every run, any
  partitioning) so tests can value-check results, mirroring the md5-draw
  discipline used by the sampling family.

`tests/test_python_datasource.py` pins determinism, partition-count
scaling, pushdown row reduction, and parity between the pushed and
post-filtered plans.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_TYPES = ("click", "view", "purchase", "signup", "error")
_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)
_EPOCH_START = 1704067200  # 2024-01-01T00:00:00Z


def _row(i: int, n_users: int):
    """Deterministic event i: all fields derive from md5(i) so any
    partitioning of the id space yields identical rows."""
    from datetime import datetime, timezone

    h = hashlib.md5(str(i).encode()).hexdigest()
    user_id = int(h[:8], 16) % n_users
    etype = _TYPES[int(h[8:10], 16) % len(_TYPES)]
    value = round((int(h[10:16], 16) % 10_000) / 100.0, 2)
    ts = datetime.fromtimestamp(_EPOCH_START + i * 7, tz=timezone.utc).replace(
        tzinfo=None
    )
    return (i, ts, user_id, etype, value)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))
        self.n_users = int(options.get("n_users", 100))
        self.type_eq: str | None = None
        self.user_lo: int | None = None  # inclusive
        self.user_hi: int | None = None  # exclusive

    def pushFilters(self, filters):
        for f in filters:
            # ColumnPath is a tuple of name parts; top-level columns only
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if isinstance(f, EqualTo) and col == "event_type":
                self.type_eq = f.value
            elif isinstance(f, GreaterThan) and col == "user_id":
                self.user_lo = f.value + 1
            elif isinstance(f, GreaterThanOrEqual) and col == "user_id":
                self.user_lo = f.value
            elif isinstance(f, LessThan) and col == "user_id":
                self.user_hi = f.value
            elif isinstance(f, LessThanOrEqual) and col == "user_id":
                self.user_hi = f.value + 1
            else:
                yield f  # not handled — Spark keeps this filter

    def partitions(self):
        per = max(1, self.n_rows // self.n_parts)
        parts = []
        start = 0
        while start < self.n_rows:
            parts.append(_RangePartition(start, min(start + per, self.n_rows)))
            start += per
        return parts

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            row = _row(i, self.n_users)
            if self.type_eq is not None and row[3] != self.type_eq:
                continue
            if self.user_lo is not None and row[2] < self.user_lo:
                continue
            if self.user_hi is not None and row[2] >= self.user_hi:
                continue
            yield row


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Register the source and enable Python filter pushdown (off by
    default in Spark 4 — a reader implementing pushFilters() hard-errors
    without `spark.sql.python.filterPushdown.enabled=true`)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
