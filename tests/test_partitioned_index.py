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


def test_import_reference_index(spark, tmp_path):
    """One-way index.bin migration (main.rs:365-368 format): positional
    chunk ids, dim sniffed from the first vector, loader-contract errors
    on ragged vectors / length mismatch (ann.rs:128-161)."""
    import json

    import pytest

    from cargo_chat_spark.sources.index_io import import_reference_index

    blob = {
        "index": {"opaque": "rp-tree state, ignored on import"},
        "vectors": [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]],
        "metadata": [
            {"file": "src/a.rs", "code": "fn a() {}", "language": "Rust", "extension": "rs"},
            {"file": "src/b.py", "code": "def b(): pass", "language": "Python", "extension": None},
        ],
    }
    src = tmp_path / "index.bin"
    src.write_text(json.dumps(blob))
    df, meta = import_reference_index(spark, str(src), str(tmp_path / "out"))
    assert meta["dim"] == 3 and meta["format"] == "parquet"
    rows = {r["chunk_id"]: r for r in df.collect()}
    assert sorted(rows) == [0, 1]  # positional ids, Vec order
    assert rows[0]["file"] == "src/a.rs" and rows[1]["language"] == "Python"
    assert rows[1]["extension"] is None
    assert [round(x, 6) for x in rows[0]["embedding"]] == [0.1, 0.2, 0.3]

    # loader-contract failures mirror ann.rs error cases
    ragged = dict(blob, vectors=[[0.1, 0.2, 0.3], [0.4, 0.5]])
    (tmp_path / "ragged.bin").write_text(json.dumps(ragged))
    with pytest.raises(ValueError, match="length 3 but got 2"):
        import_reference_index(spark, str(tmp_path / "ragged.bin"), str(tmp_path / "o2"))

    short = dict(blob, metadata=blob["metadata"][:1])
    (tmp_path / "short.bin").write_text(json.dumps(short))
    with pytest.raises(ValueError, match="length mismatch"):
        import_reference_index(spark, str(tmp_path / "short.bin"), str(tmp_path / "o3"))

    empty = dict(blob, vectors=[])
    (tmp_path / "empty.bin").write_text(json.dumps(empty))
    with pytest.raises(ValueError, match="vectors"):
        import_reference_index(spark, str(tmp_path / "empty.bin"), str(tmp_path / "o4"))
