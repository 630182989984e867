"""Equivalence of the minhash-signature builder forms and the k-means
convergence stop (operators/dedup.py, operators/kmeans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D
from cargo_chat_spark.operators import kmeans


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


def _toy_embeddings(spark):
    # two tight clusters around (0,0) and (10,10): converges in 2 passes
    pts = [(i, [float(i % 3) * 0.01, float(i % 5) * 0.01]) for i in range(20)]
    pts += [
        (100 + i, [10.0 + (i % 3) * 0.01, 10.0 + (i % 5) * 0.01])
        for i in range(20)
    ]
    return spark.createDataFrame(pts, "vec_id int, embedding array<double>")


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
