"""Range-sorted parquet layout + min/max manifest file skipping.

Partition pruning (storage.py gates) works when the predicate column IS
the partition key; at 100 TB you cannot partition by every query column
(a user_id partition per user is millions of directories). The standard
lakehouse answer is DATA SKIPPING on file-level column statistics: lay
the table out so each file covers a narrow range of the column
(``repartitionByRange`` + ``sortWithinPartitions`` — the 1-D case of
z-ordering), record per-file min/max in a manifest at write time, and
have the reader open only the files whose range overlaps the predicate.
Delta/Iceberg keep this manifest in the table log; plain parquet gets the
same effect with an explicit sidecar here (underscore-named so vanilla
readers ignore it). Within each opened file, parquet row-group min/max
stats prune further for free because the rows are sorted.

Guarantee: ``read_range_pruned`` re-applies the predicate row-level, so
pruning is a pure I/O optimization — the result is identical to a full
scan + filter by construction, which is exactly what the catalog gate
(`events_range_pruned_scan`) value-checks against the raw table, while
``tests/test_sorted_layout.py`` pins the PHYSICAL claim: the pruned plan
lists only the overlapping files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_minmax_manifest.json"


def _local(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_files: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files, each covering a disjoint
    range of ``col`` (range partition + in-file sort), plus a per-file
    min/max manifest. Manifest stats are computed from the files as
    written (one column-pruned aggregate scan), not from the input frame —
    what is recorded is what is on disk."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()  # bounded: one row per file
    )
    manifest = {
        "column": col,
        "files": sorted(
            (os.path.basename(_local(r["file"])), r["lo"], r["hi"])
            for r in stats
        ),
    }
    with open(os.path.join(_local(path), _MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)


def pruned_files(path: str, col: str, lo, hi) -> list[str]:
    """File names whose [min, max] overlaps [lo, hi) per the manifest."""
    with open(os.path.join(_local(path), _MANIFEST)) as fh:
        manifest = json.load(fh)
    if manifest["column"] != col:
        raise ValueError(
            f"manifest indexes {manifest['column']!r}, not {col!r}"
        )
    return [
        name
        for name, fmin, fmax in manifest["files"]
        if not (fmax < lo or fmin >= hi)
    ]


def read_range_pruned(
    spark: SparkSession, path: str, col: str, lo, hi
) -> DataFrame:
    """Scan only the manifest-selected files for ``lo <= col < hi``, with
    the predicate re-applied row-level (pruning is I/O-only; empty
    selection yields an empty frame with the table's schema)."""
    files = [os.path.join(path, f) for f in pruned_files(path, col, lo, hi)]
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi))
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    return spark.read.parquet(*files).where(pred)
