"""Equivalence of the minhash-signature builder forms and the k-means
convergence stop (operators/dedup.py, operators/kmeans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D
from cargo_chat_spark.operators import kmeans

import pytest


def _hashes(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, ""),  # empty doc: single degenerate shingle
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    toks = df.select("doc_id", D.tokens(F.col("text")).alias("toks"))
    return toks.select(
        "doc_id", D.shingle_hashes_from_tokens(F.col("toks")).alias("h")
    )


def test_sql_string_signature_matches_column_form(spark):
    h = _hashes(spark)
    col_form = h.select(
        "doc_id", D.minhash_signature(F.col("h")).alias("mh")
    ).collect()
    sql_form = h.select(
        "doc_id", F.expr(D.minhash_signature_spark_sql("h")).alias("mh")
    ).collect()
    assert {r["doc_id"]: r["mh"] for r in col_form} == {
        r["doc_id"]: r["mh"] for r in sql_form
    }


def test_hot_bucket_cap_bounds_candidates(spark):
    """Degenerate corpus (1k identical docs → every band key is one giant
    bucket): the capped band frame must keep the candidate join
    sub-quadratic — at most C(cap, 2) distinct pairs instead of C(n, 2) =
    499,500 — while still chaining the duplicates into one cluster."""
    n = 1000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every single doc").alias(
            "text"
        ),
    )
    toks = docs.select("doc_id", D.tokens(F.col("text")).alias("toks"))
    sigs = toks.select(
        "doc_id", D.shingle_hashes_from_tokens(F.col("toks")).alias("h")
    ).select("doc_id", F.expr(D.minhash_signature_spark_sql("h")).alias("mh"))
    bands = sigs.select(
        "doc_id", F.explode(D.band_keys(F.col("mh"))).alias("bk")
    ).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    capped = D.cap_hot_buckets(bands)
    # the cap itself: no bucket exceeds BUCKET_CAP members
    max_bucket = (
        capped.groupBy("band", "key").count().agg(F.max("count")).first()[0]
    )
    assert max_bucket <= D.BUCKET_CAP
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    n_pairs = pairs.count()
    cap_bound = D.BUCKET_CAP * (D.BUCKET_CAP - 1) // 2
    assert n_pairs <= cap_bound, f"{n_pairs} pairs > C(cap,2) = {cap_bound}"
    assert n_pairs <= n * D.BUCKET_CAP  # the verdict's n·B bound, with margin
    # survivors still form one chained cluster over the kept members
    assert n_pairs == cap_bound


def _toy_embeddings(spark):
    # two tight clusters around (0,0) and (10,10): converges in 2 passes
    pts = [(i, [float(i % 3) * 0.01, float(i % 5) * 0.01]) for i in range(20)]
    pts += [
        (100 + i, [10.0 + (i % 3) * 0.01, 10.0 + (i % 5) * 0.01])
        for i in range(20)
    ]
    return spark.createDataFrame(pts, "vec_id int, embedding array<double>")


@pytest.mark.slow
def test_kmeans_tol_stop_matches_full_run(spark):
    emb = _toy_embeddings(spark)
    # once converged, extra Lloyd's iterations are no-ops: the tol-stopped
    # run must land on the same centroids as a longer fixed run
    short = kmeans.train_kmeans(spark, emb, 2, dim=2, n_iter=8, tol=1e-12)
    long = kmeans.train_kmeans(spark, emb, 2, dim=2, n_iter=20, tol=0.0)
    assert short == long


def test_kmeans_k_collapses_to_row_count(spark):
    emb = _toy_embeddings(spark).limit(3)
    cents = kmeans.train_kmeans(spark, emb, 8, dim=2, n_iter=2)
    assert len(cents) == 3


@pytest.mark.slow
def test_kmeans_parallel_init_deterministic_and_converges(spark):
    emb = _toy_embeddings(spark)
    a = kmeans.train_kmeans(spark, emb, 2, dim=2, n_iter=5, init="parallel")
    b = kmeans.train_kmeans(spark, emb, 2, dim=2, n_iter=5, init="parallel")
    assert a == b and len(a) == 2  # md5 draws, no RNG: bit-reproducible
    # both inits must land on the same two tight clusters (order-free)
    c = kmeans.train_kmeans(spark, emb, 2, dim=2, n_iter=10)
    assert sorted(round(x) for cent in a for x in cent) == sorted(
        round(x) for cent in c for x in cent
    )
