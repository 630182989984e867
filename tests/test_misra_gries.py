"""Misra-Gries mergeable-summary guarantees on randomized skewed
streams (operators/sketches.py): for ANY stream and ANY partitioning,
(a) every item with true count > n/(k+1) appears in the merged
candidate set, (b) estimates never exceed true counts, (c) the
underestimate is at most n/(k+1). These are the theorems the
heavy_hitters_mg gate surfaces as booleans; here they're checked on
adversarial inputs the corpus doesn't produce (heavy skew, singleton
tails, tiny k, repartitioned streams)."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.operators import sketches


def _zipf_stream(seed: int, n: int, vocab: int, s: float) -> list[str]:
    rng = random.Random(seed)
    weights = [1.0 / (i + 1) ** s for i in range(vocab)]
    return rng.choices([f"w{i}" for i in range(vocab)], weights, k=n)


@pytest.mark.parametrize(
    "seed,n,vocab,s,k,parts",
    [
        (1, 5000, 50, 1.2, 8, 4),
        (2, 8000, 200, 1.5, 16, 7),
        (3, 3000, 10, 0.5, 4, 3),   # near-uniform, tiny k
        (4, 6000, 500, 2.0, 8, 11),  # hard skew, long singleton tail
    ],
)
def test_mg_guarantees(spark, seed, n, vocab, s, k, parts):
    stream = _zipf_stream(seed, n, vocab, s)
    truth = Counter(stream)
    df = spark.createDataFrame(
        [(w,) for w in stream], "item string"
    ).repartition(parts)

    cand = {
        r["item"]: r["est"]
        for r in sketches.merged_candidates(df, "item", k).collect()
    }
    bound = n / (k + 1)
    for item, est in cand.items():
        assert est <= truth[item], (item, est, truth[item])
        assert truth[item] - est <= bound, (item, est, truth[item], bound)
    for item, cnt in truth.items():
        if cnt * (k + 1) > n:
            assert item in cand, f"heavy hitter {item} (cnt={cnt}) dropped"

    verified = sketches.heavy_hitters_verified(df, "item", k).collect()
    expect = {w for w, c in truth.items() if c * (k + 1) > n}
    assert {r["item"] for r in verified} == expect
    assert all(r["found_by_sketch"] and r["within_bound"] for r in verified)
    assert all(r["exact_cnt"] == truth[r["item"]] for r in verified)


def test_mg_summary_size_bounded(spark):
    """Each partition contributes at most k counter rows."""
    stream = _zipf_stream(9, 4000, 300, 1.0)
    df = spark.createDataFrame([(w,) for w in stream], "item string").repartition(5)
    summ = sketches.misra_gries_summaries(df, "item", 12)
    per_part = (
        summ.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    assert all(r["count"] <= 12 for r in per_part)


# ------------------------------------------------------ Count-Min dual
def _cm_reference(stream, width):
    """Pure-Python CM grid + estimates (same md5-once derivation: one
    digest per item, row d reads hex window [8d, 8d+8))."""
    import hashlib

    from cargo_chat_spark.operators.sketches import CM_DEPTH

    def cell(w, d):
        hexd = hashlib.md5(f"cm|{w}".encode()).hexdigest()
        return int(hexd[8 * d: 8 * d + 8], 16) % width

    grid = [[0] * width for _ in range(CM_DEPTH)]
    for w in stream:
        for d in range(CM_DEPTH):
            grid[d][cell(w, d)] += 1
    return lambda w: min(grid[d][cell(w, d)] for d in range(CM_DEPTH))


@pytest.mark.parametrize("seed,n,vocab,width,parts", [
    (11, 4000, 60, 16, 4),
    (12, 2500, 300, 32, 7),
])
def test_count_min_matches_reference(spark, seed, n, vocab, width, parts):
    stream = _zipf_stream(seed, n, vocab, 1.3)
    truth = Counter(stream)
    df = spark.createDataFrame(
        [(w,) for w in stream], "item string"
    ).repartition(parts)
    grid = sketches.count_min_sketch(df, "item", width)
    items = spark.createDataFrame(
        [(w,) for w in sorted(truth)], "item string"
    )
    est = {
        r["item"]: r["cm_est"]
        for r in sketches.cm_estimates(items, grid, "item", width).collect()
    }
    ref = _cm_reference(stream, width)
    for w, cnt in truth.items():
        assert est[w] == ref(w), w
        assert est[w] >= cnt, w  # CM never underestimates
    # grid row mass conservation: every row sums to the stream length
    rows = grid.groupBy("seed").agg(F.sum("c").alias("s")).collect()
    assert all(r["s"] == n for r in rows)


def test_count_min_never_seen_item_estimates_known_zero(spark):
    """An absent grid cell is a KNOWN zero (ADVICE r11): a probe item
    the tiny stream never touched must estimate exactly what the
    full-grid pure-Python reference gives (0 when any of its cells is
    unpopulated), never NULL."""
    width = 64
    stream = ["alpha", "beta", "gamma", "alpha"]
    df = spark.createDataFrame([(w,) for w in stream], "item string")
    grid = sketches.count_min_sketch(df, "item", width)
    probes = ["alpha", "zz-never-seen-0", "zz-never-seen-1", "qqq"]
    items = spark.createDataFrame([(w,) for w in probes], "item string")
    est = {
        r["item"]: r["cm_est"]
        for r in sketches.cm_estimates(items, grid, "item", width).collect()
    }
    ref = _cm_reference(stream, width)
    for w in probes:
        assert est[w] is not None, w
        assert est[w] == ref(w), w
    # with 3 distinct words over 3x64 cells the never-seen probes hit at
    # least one empty cell each -> the estimates are genuine zeros
    assert any(est[w] == 0 for w in probes[1:])


# ----------------------------------------- HRW placement (storage card)
def test_hrw_minimal_movement(spark):
    """Rendezvous hashing's defining property, measured: growing 8→9
    shards moves ≈1/9 of docs (11.2% at sf0.001) where mod-hash moves
    ≈8/9 (88.8%) — and an unmoved doc's winning weight is untouched, so
    HRW movement can never exceed the new shard's win share."""
    from cargo_chat_spark.queries import catalog
    from tests.conftest import SF_DIR_SMALL

    rows = catalog.SPARK_QUERIES["hrw_reshard_report"](
        spark, SF_DIR_SMALL
    ).collect()
    tot = sum(r["n_docs"] for r in rows)
    hrw = sum(r["n_moved_hrw"] for r in rows)
    mod = sum(r["n_moved_mod"] for r in rows)
    assert 0.05 <= hrw / tot <= 0.20, hrw / tot
    assert mod / tot >= 0.8
    assert len(rows) == 8 and tot == 500


# --------------------------------------- CM join-size / KMV properties
def test_cm_join_size_one_sided(spark):
    """The inner-product estimate can never undercount a join (every
    collision only adds), and exact sizes match a direct join."""
    from cargo_chat_spark.queries import catalog
    from tests.conftest import SF_DIR_SMALL

    rows = catalog.SPARK_QUERIES["cm_join_size_report"](
        spark, SF_DIR_SMALL
    ).collect()
    assert {r["pair"] for r in rows} == {
        "orders_customer", "lineitem_part", "lineitem_orders"
    }
    assert all(r["overestimates"] for r in rows)
    assert all(r["cm_est"] >= r["exact_size"] > 0 for r in rows)


def test_kmv_exact_branch_and_envelope(spark):
    """Columns with ≤ k distinct values estimate exactly; high-
    cardinality columns land within a loose 3/sqrt(k) envelope (~38%
    for k=64 — KMV's σ is ~1/sqrt(k), measured 4-30% here)."""
    from cargo_chat_spark.queries import catalog
    from tests.conftest import SF_DIR_SMALL

    rows = {
        r["col"]: r
        for r in catalog.SPARK_QUERIES["kmv_distinct_report"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    seg = rows["customer.c_mktsegment"]
    assert seg["kmv_est"] == seg["exact_distinct"]
    assert seg["rel_err_micro"] == 0
    for col, r in rows.items():
        assert r["rel_err_micro"] <= 380_000, (col, r)


def test_kmv_set_ops_sanity(spark):
    """Merged-sketch set estimates track the exact answers within the
    KMV envelope, and the sketch intersection share is consistent:
    inter_est = shared_k·union_est // k by construction, and exact
    containment inter ≤ union holds for the estimates' inputs."""
    from cargo_chat_spark.queries import catalog
    from cargo_chat_spark.queries.sketch_queries import KMV_SET_K
    from tests.conftest import SF_DIR_SMALL

    r = catalog.SPARK_QUERIES["kmv_set_ops_report"](
        spark, SF_DIR_SMALL
    ).collect()[0]
    assert r["exact_inter"] <= r["exact_union"]
    assert r["inter_est"] == r["shared_k"] * r["union_est"] // KMV_SET_K
    assert 0 <= r["shared_k"] <= KMV_SET_K
    # loose 3/sqrt(k) envelope on the union estimate (measured 5-32%)
    assert abs(r["union_est"] - r["exact_union"]) <= 0.38 * r["exact_union"]
