"""Connected-components operator: pointer-jump convergence + lineage bound.

VERDICT r2 item 4 (checkpoint the label frame) and ADVICE r2 (a chain with
diameter > max_iter must not fail the whole dedup query).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.operators.graph import connected_components


def _chain_edges(spark, n: int):
    """Path graph 0-1-2-...-(n-1), both directions."""
    e = spark.range(n - 1).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("d")
    )
    return e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))


@pytest.mark.slow
def test_chain_diameter_beyond_plain_max_iter(spark):
    """A 40-hop chain needs 40 plain propagation rounds; pointer jumping
    must close it well inside max_iter=20 (ADVICE r2: degrade-don't-fail
    is the backstop, but this shape shouldn't even need it)."""
    comp = connected_components(_chain_edges(spark, 41), max_iter=20)
    rows = comp.collect()
    assert len(rows) == 41
    assert {r.component_id for r in rows} == {0}


def test_two_components_and_min_label(spark):
    e1 = _chain_edges(spark, 5)  # nodes 0..4
    e2 = _chain_edges(spark, 3).select(
        (F.col("s") + 100).alias("s"), (F.col("d") + 100).alias("d")
    )  # nodes 100..102
    comp = connected_components(e1.unionByName(e2), max_iter=20)
    got = {r.doc_id: r.component_id for r in comp.collect()}
    assert all(got[i] == 0 for i in range(5))
    assert all(got[i] == 100 for i in (100, 101, 102))


def test_lineage_stays_bounded_by_checkpoint(spark):
    """The label frame is localCheckpoint()ed every `checkpoint_every`
    rounds, so the FINAL plan must not stack one join per round — a 2**k
    star-of-chains forces several rounds, and the optimized plan's join
    count must stay below what an uncheckpointed loop would accumulate."""
    comp = connected_components(
        _chain_edges(spark, 300), max_iter=20, checkpoint_every=2
    )
    plan = comp._jdf.queryExecution().optimizedPlan().toString()
    # the checkpoint shows up as a lineage-free RDD scan standing in for
    # all rounds before the cut (since the convergence probe runs on
    # checkpoint rounds, the loop now always BREAKS on one — the final
    # frame may be the checkpoint itself, rendering as LogicalRDD with
    # zero joins above it)
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, (
        "no localCheckpoint truncation in lineage"
    )
    # ...and at most ~2 rounds of joins (3 joins/round, AQE may render a
    # plan section twice) survive above it; an uncheckpointed 6+-round run
    # accumulates 18+ joins in a single rendering.
    joins = plan.count("Join")
    assert joins <= 14, f"lineage not truncated: {joins} joins in final plan"
    assert {r.component_id for r in comp.collect()} == {0}


@pytest.mark.slow
def test_sparse_convergence_probe_same_labels(spark):
    """The every-k-rounds convergence probe (round-4 verdict item 8) must
    produce byte-identical labels to the every-round probe: one no-change
    round is a fixed point, so probe cadence can't affect the answer."""
    import random

    rng = random.Random(17)
    nodes = list(range(60))
    raw = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges_list = [(s, d) for s, d in raw if s != d]
    e = spark.createDataFrame(edges_list, "s bigint, d bigint")
    e = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    every_round = {
        r.doc_id: r.component_id
        for r in connected_components(
            e, max_iter=20, convergence_check_every=1
        ).collect()
    }
    sparse = {
        r.doc_id: r.component_id
        for r in connected_components(
            e, max_iter=20, convergence_check_every=5
        ).collect()
    }
    assert every_round == sparse


def test_nonconvergence_degrades_with_warning(spark):
    """max_iter=1 cannot close a 10-chain: expect a RuntimeWarning and a
    conservative refinement (no cross-component merges), not an error."""
    with pytest.warns(RuntimeWarning, match="refinement"):
        comp = connected_components(_chain_edges(spark, 10), max_iter=1)
    got = {r.doc_id: r.component_id for r in comp.collect()}
    assert len(got) == 10
    # refinement property: label <= own id, and label is in the same
    # (here: only) component
    assert all(lbl <= i for i, lbl in got.items())


@pytest.mark.slow
def test_local_union_find_matches_distributed(spark):
    """connected_components_local (bounded-collect union-find) must produce
    identical labels to the distributed pointer-jump loop on random
    graphs."""
    import random

    from cargo_chat_spark.operators.graph import connected_components_local

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        pairs = {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(10, 80))
        }
        rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        edges = spark.createDataFrame(rows, "s: long, d: long")
        dist = {
            (r["doc_id"], r["component_id"])
            for r in connected_components(edges).collect()
        }
        loc = {
            (r["doc_id"], r["component_id"])
            for r in connected_components_local(edges).collect()
        }
        assert dist == loc


def test_local_union_find_node_guard(spark):
    from cargo_chat_spark.operators.graph import connected_components_local

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)] + [(i + 1, i) for i in range(30)],
        "s: long, d: long",
    )
    with pytest.raises(ValueError, match="max_nodes|use the"):
        connected_components_local(edges, max_nodes=10)


# ------------------------------------------------------ triangle counting


def test_triangle_counts_match_bruteforce(spark):
    """Degree-ordered compact-forward triangle counts == brute-force
    neighbor-set intersection on the sf0.001 co-purchase graph; also
    pins that orientation keeps exactly one direction per edge."""
    from cargo_chat_spark.queries import graph_queries as G
    from cargo_chat_spark.queries.catalog import SPARK_QUERIES
    from tests.conftest import SF_DIR_SMALL

    edges = {
        (r["s"], r["d"])
        for r in G._copurchase_edges(spark, SF_DIR_SMALL).collect()
    }
    nbrs: dict = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
    want: dict = {}
    for v, ns in nbrs.items():
        t = sum(len(ns & nbrs[u]) for u in ns)  # each triangle seen twice
        if t:
            want[v] = t // 2
    got = {
        r["partkey"]: r["triangles"]
        for r in SPARK_QUERIES["copurchase_triangles"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert got == want
    assert sum(got.values()) % 3 == 0  # every triangle credits 3 corners


def test_triangle_orientation_is_a_tournament(spark):
    """On a tie-heavy 4-clique every edge must be oriented exactly once
    (the (deg, node) tuple order is a strict total order)."""
    from pyspark.sql import functions as F

    nodes = [0, 1, 2, 3]
    und = [(a, b) for a in nodes for b in nodes if a != b]
    edges = spark.createDataFrame(und, "s bigint, d bigint")
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    a = deg.selectExpr("node AS s", "deg AS deg_s")
    b = deg.selectExpr("node AS d", "deg AS deg_d")
    ordered = (
        edges.join(a, "s").join(b, "d")
        .where(
            (F.col("deg_s") < F.col("deg_d"))
            | ((F.col("deg_s") == F.col("deg_d")) & (F.col("s") < F.col("d")))
        )
    )
    got = {(r["s"], r["d"]) for r in ordered.collect()}
    assert got == {(x, y) for x, y in und if x < y}  # all degrees tie


def test_label_propagation_matches_bruteforce(spark):
    """Deterministic synchronous LPA == the python reference (same
    neighbor-mode update, same (count desc, label asc) tie-break) on the
    sf0.001 co-purchase graph."""
    from cargo_chat_spark.queries import graph_queries as G
    from cargo_chat_spark.queries.catalog import SPARK_QUERIES
    from tests.conftest import SF_DIR_SMALL

    edges = {
        (r["s"], r["d"])
        for r in G._copurchase_edges(spark, SF_DIR_SMALL).collect()
    }
    nbrs: dict = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
    labels = {v: v for v in nbrs}
    for _ in range(G._LPA_ITERS):
        nxt = {}
        for v, ns in nbrs.items():
            counts: dict = {}
            for u in ns:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    got = {
        r["partkey"]: r["community"]
        for r in SPARK_QUERIES["copurchase_label_prop"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert got == labels
    # LPA must actually coarsen: fewer distinct communities than nodes
    assert len(set(got.values())) < len(got)
