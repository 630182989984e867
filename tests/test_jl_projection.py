"""JL projection semantic pins (operators/jl_projection.py): the sign
matrix is parity-balanced and engine-independent, projected distances
concentrate per the JL lemma, and the projected top-k is a usable
shortlist generator (graded as recall AGAINST the exact kNN, the
ann_recall_report discipline)."""

from __future__ import annotations

from cargo_chat_spark.operators import jl_projection as JL
from cargo_chat_spark.queries import catalog
from tests.conftest import SF_DIR_SMALL


def test_sign_matrix_derivation():
    s = JL.sign_matrix(16, 64)
    assert len(s) == 16 and all(len(r) == 64 for r in s)
    assert all(v in (1, -1) for r in s for v in r)
    # md5 parity is ~balanced: no row is constant (a constant row would
    # make that component a degenerate sum)
    assert all(len(set(r)) == 2 for r in s)
    # derivation is pure — same call, same matrix
    assert s == JL.sign_matrix(16, 64)


def test_distortion_concentrates(spark):
    """JL lemma as measured: the ratio ‖Px−Py‖²/(K‖x−y‖²) has mean ~1
    and std ~sqrt(2/16)≈0.35 — so the bulk of pair mass must land in
    buckets 5..15 (ratio 0.5..1.6) and the extreme tails stay thin."""
    rows = catalog.SPARK_QUERIES["jl_distortion_report"](
        spark, SF_DIR_SMALL
    ).collect()
    total = sum(r["n_pairs"] for r in rows)
    mid = sum(r["n_pairs"] for r in rows if 5 <= r["bucket"] <= 15)
    far = sum(r["n_pairs"] for r in rows if r["bucket"] < 2 or r["bucket"] > 30)
    assert mid / total >= 0.6, f"JL concentration broke: {mid}/{total}"
    assert far / total <= 0.01


def test_jl_topk_recall_floor(spark):
    """16 of 64 dims on near-random synthetic vectors keeps only
    coarse geometry — measured recall@10 is 0.30 at sf0.001 (vs 0.10
    for random top-10 from ~10 candidates per rank... i.e. well above
    chance at |C|=100: random would be 10/100). The floor guards
    against a silent matrix/fold regression, not an accuracy SLO: the
    production use is a 4×-cheaper shortlist feeding the exact
    re-rank (knn_int8_rerank's pattern)."""
    exact = catalog.SPARK_QUERIES["knn_exact"](spark, SF_DIR_SMALL).select(
        "query_id", "neighbor_id"
    )
    jl = catalog.SPARK_QUERIES["jl_project_topk"](
        spark, SF_DIR_SMALL
    ).select("query_id", "neighbor_id")
    recall = jl.join(exact, ["query_id", "neighbor_id"]).count() / exact.count()
    assert recall >= 0.2, f"JL top-10 recall degenerate: {recall:.2f}"
