"""Persisted RP-LSH forest store (sources/forest_store.py): the probe
must equal the recompute-everything batch forest bit for bit, appends
must compose, and the store side must reach the probe join UNSHUFFLED
(the band_store plan discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.queries.ann_lsh import rp_forest_persisted, rp_lsh_forest_topk
from cargo_chat_spark.sources.forest_store import (
    append_forest_store,
    probe_forest_store,
    read_forest_store,
    write_forest_store,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], round(r["distance"], 9), r["rank"])
        for r in df.collect()
    )


def test_persisted_probe_equals_batch_forest(spark):
    got = _rows(rp_forest_persisted(spark, SF_DIR_SMALL))
    want = _rows(rp_lsh_forest_topk(spark, SF_DIR_SMALL))
    assert got and got == want


def test_append_waves_equal_single_build(spark, tmp_path):
    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    single = str(tmp_path / "single")
    waved = str(tmp_path / "waved")
    write_forest_store(emb, single)
    write_forest_store(emb.where(F.col("vec_id") % 3 == 0), waved)
    append_forest_store(emb.where(F.col("vec_id") % 3 == 1), waved)
    append_forest_store(emb.where(F.col("vec_id") % 3 == 2), waved)
    a = sorted(map(tuple, read_forest_store(spark, single).collect()))
    b = sorted(map(tuple, read_forest_store(spark, waved).collect()))
    assert a == b
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pa = _rows(probe_forest_store(spark, single, q, emb))
    pb = _rows(probe_forest_store(spark, waved, q, emb))
    assert pa == pb


def test_probe_plan_store_side_unshuffled(spark, tmp_path):
    """No Exchange may sit between the store scan and the (t, bkey)
    join: the query keys broadcast, the postings stream map-side."""
    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "store")
    write_forest_store(emb, path)
    q = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cand_plan = (
        probe_forest_store(spark, path, q, emb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in cand_plan
    # the ONLY hash exchanges allowed are the re-rank window's and the
    # candidate dedup/fetch — never one feeding the store scan directly
    import re

    scan_to_exchange = re.search(
        r"Exchange hashpartitioning\((t|bkey)", cand_plan
    )
    assert scan_to_exchange is None, "store postings must not shuffle on key"
