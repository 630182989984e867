"""Fixed-point KMeans (operators/clustering.py): the distributed trainer
must reproduce the textbook in-memory Lloyd's (smallest-id init,
floor-mean update, lowest-cluster tie-break), empty clusters must carry
their centroid, and the assignment stage must stay JVM-side."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    quantize_embeddings,
    reference_kmeans,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401


def _quantized(spark):
    return quantize_embeddings(
        load_table(spark, SF_DIR_SMALL, "embeddings")
    ).select("vec_id", "label", "q")


def test_trainer_matches_reference_on_corpus(spark):
    e = _quantized(spark)
    vecs = {r["vec_id"]: list(r["q"]) for r in e.collect()}
    want_cents, want_assign = reference_kmeans(vecs, k=8, iters=3)
    got_cents, assigned = kmeans_fit(e, k=8, iters=3)
    assert got_cents == want_cents
    got_assign = {
        r["vec_id"]: r["cluster"] for r in assigned.select("vec_id", "cluster").collect()
    }
    assert got_assign == want_assign
    # sanity: the fit actually moved off the init and uses every cluster
    assert set(got_assign.values()) == set(range(8))


def test_empty_cluster_carries_centroid(spark):
    # k=3 but only two distinct points: cluster seeded at the duplicate
    # point loses everything to the lower-id twin and must keep its
    # centroid verbatim through every iteration
    rows = [(0, [0, 0]), (1, [0, 0]), (2, [100, 100]), (3, [100, 100])]
    e = spark.createDataFrame(rows, "vec_id bigint, q array<bigint>")
    cents, assigned = kmeans_fit(e, k=3, iters=2)
    assert cents[1] == [0, 0], "empty cluster must keep its init centroid"
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 2}


def test_tie_breaks_to_lowest_cluster(spark):
    e = spark.createDataFrame(
        [(0, [0]), (1, [10]), (2, [5])], "vec_id bigint, q array<bigint>"
    )
    out = assign_clusters(e, [[0], [10]])
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in out.collect()}
    assert got[2] == (0, 25), "equidistant point goes to the lower id"
    assert got[0] == (0, 0) and got[1] == (1, 0)


def test_too_few_vectors_raise(spark):
    e = spark.createDataFrame([(0, [1])], "vec_id bigint, q array<bigint>")
    try:
        kmeans_fit(e, k=2, iters=1)
    except ValueError as exc:
        assert "k=2" in str(exc)
    else:
        raise AssertionError("expected ValueError")


def test_assignment_stage_is_jvm_side(spark):
    e = _quantized(spark)
    plan = (
        assign_clusters(e, [[0] * 64, [1] * 64])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan, "assignment must not cross into Python"
    assert "Exchange" not in plan, "assignment must be map-only (no shuffle)"
