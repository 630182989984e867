"""IVF-cell partitioned index: layout, partition pruning in the plan, and
result equivalence with the in-memory cell assignment."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cargo_chat_spark.sources.index_io import (
    read_index_cells,
    write_index_partitioned,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL


def test_partitioned_index_prunes(spark, tmp_path):
    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    index = emb.select(
        F.col("vec_id").alias("chunk_id"), F.col("embedding")
    )
    centroids = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cvec")
    )
    out = str(tmp_path / "pidx")
    write_index_partitioned(index, out, 64, centroids)

    # physical layout: one directory per cell
    dirs = {d for d in os.listdir(os.path.join(out, "index")) if d.startswith("cell_id=")}
    assert len(dirs) == 4

    pruned = read_index_cells(spark, out, [1, 3])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan.split("PartitionFilters")[1][:200], (
        "cell filter did not reach partition pruning"
    )

    # completeness: cells partition the corpus
    total = spark.read.parquet(os.path.join(out, "index")).count()
    assert total == emb.count()
    assert pruned.count() + read_index_cells(spark, out, [0, 2]).count() == total
