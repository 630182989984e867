"""Graph analytics beyond connected components: fixed-point PageRank over
the part co-purchase graph (parts that appear in the same order).

Why fixed-point integers: PageRank is normally float — and float
contribution sums accumulate in shuffle order, so two engines (or two
runs) legitimately disagree in the low bits, which would make a value-hash
oracle impossible. Here every quantity is an INTEGER number of
rank-quanta (SCALE = 1e12): initial rank = SCALE div N, a node's
per-neighbor contribution = rank div degree, damping is 85*sum div 100 —
all integer division and integer sums, which are associative and
bit-identical in Spark and DuckDB. The oracle unrolls the same three
iterations as CTEs; the gate therefore pins the ITERATIVE ALGORITHM's
values exactly, something the float form cannot offer.

Scale posture: candidate edges come from a self-equi-join on l_orderkey
(never all-pairs — order baskets are small), deduped once and
memo-persisted; each iteration is one equi-join + one map-side-combinable
integer SUM on the edge list, the same shape GraphX/Pregel lowers to. At
100 TB the edge list is the partitioned artifact and iterations reuse its
partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cargo_chat_spark.caching import memo_persist
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import (
    load_table,
    load_table_spread,
    parquet_rows,
)


def _est_nodes(sf_dir: str) -> int:
    """Upper bound on graph node count for the broadcast-regime guard:
    the part table's row count read from the parquet FOOTER — driver-side
    metadata, no Spark job (the old ``part.count()`` was one full-scan
    job per graph query whose only purpose was this plan decision)."""
    return parquet_rows(os.path.join(sf_dir, "part.parquet"))

_SCALE = 1_000_000_000_000
_ITERS = 3


def _oracle_sql() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _ITERS + 1):
        iters.append(
            f"""i{i} AS (
    SELECT d.node, d.deg, d.cnt,
           (15 * ({_SCALE} // d.cnt)) // 100
             + (85 * COALESCE(x.inc, 0)) // 100 AS r
    FROM {prev} d LEFT JOIN (
        SELECT e.d AS node, SUM({prev}.r // {prev}.deg) AS inc
        FROM edges e JOIN {prev} ON {prev}.node = e.s
        GROUP BY e.d) x USING (node))"""
        )
        prev = f"i{i}"
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
    SELECT pa AS s, pb AS d FROM pairs
    UNION ALL
    SELECT pb AS s, pa AS d FROM pairs
),
deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY s),
nn AS (SELECT COUNT(*) AS cnt FROM deg),
r0 AS (SELECT node, deg, cnt, {_SCALE} // cnt AS r FROM deg CROSS JOIN nn),
{",".join(iters)}
SELECT node AS partkey, CAST(deg AS BIGINT) AS degree,
       CAST(r AS BIGINT) AS rank_fp
FROM {prev}
"""


_PAGERANK_SQL = _oracle_sql()


def _copurchase_edges(spark, sf_dir):
    def build():
        # basket form, not a self-join: ONE shuffle groups each order's
        # parts (baskets are small — collect_set is bounded by basket
        # size), pairs generate map-side from the sorted array, and one
        # more shuffle dedupes pairs globally. The self-join + double
        # distinct form was measured ~2x slower at sf0.1.
        # The scan is spread on the groupBy key when the parquet layout
        # under-splits it (guide §2.6): the basket aggregate then reuses
        # that hash partitioning, so the CPU-dense pair explode fused
        # after it runs at full parallelism instead of on the few
        # byte-sized partitions AQE coalesces a tiny shuffle to.
        li = load_table_spread(spark, sf_dir, "lineitem", "l_orderkey")
        baskets = li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("ps")
        )
        pair_arr = F.expr(
            """
            CASE WHEN size(ps) < 2 THEN
                CAST(array() AS array<struct<pa: bigint, pb: bigint>>)
            ELSE flatten(transform(sequence(1, size(ps) - 1), i ->
                transform(sequence(i + 1, size(ps)), j ->
                    struct(element_at(ps, i) AS pa,
                           element_at(ps, j) AS pb))))
            END
            """
        )
        pairs = (
            baskets.select(F.explode(pair_arr).alias("p"))
            .select("p.pa", "p.pb")
            .distinct()
        )
        return pairs.selectExpr("pa AS s", "pb AS d").unionAll(
            pairs.selectExpr("pb AS s", "pa AS d")
        )

    return memo_persist(spark, ("copurchase_edges", sf_dir), build)


def _copurchase_adjacency(spark, sf_dir):
    """Adjacency-list twin of ``_copurchase_edges`` for the broadcast
    regime (r14 optimization): one row per node with the sorted distinct
    neighbor array. Collapses the edge artifact from E rows to N rows, so
    per-iteration joins probe node-cardinality instead of edge-cardinality
    and ``deg`` falls out as ``size(nbrs)`` with no extra aggregation
    pass. Build is baskets → directed-pair explode → one
    ``collect_set`` shuffle (the pair ``distinct`` and the separate
    ``deg`` shuffle of the edge form both disappear). Only used when the
    node guard says ranks broadcast: in that regime the largest possible
    neighbor array (n_nodes elements) is bounded by the same guard, so
    the fat-row hazard hot nodes pose at 100 TB cannot occur here — past
    the guard the callers keep the skew-safe edge-list form."""

    def build():
        # spread-on-underscan as in _copurchase_edges: the pair explode
        # fused after the basket aggregate is CPU-dense (profiled at 3-4
        # tasks × ~1 s from an AQE-coalesced 5 MB shuffle while 28 cores
        # idled); the explicit keyed repartition is the identity at
        # production split counts (guide §2.6).
        li = load_table_spread(spark, sf_dir, "lineitem", "l_orderkey")
        baskets = li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("ps")
        )
        # both directions in ONE flatten (x, y≠x), no unionAll re-read
        pair_arr = F.expr(
            """
            CASE WHEN size(ps) < 2 THEN
                CAST(array() AS array<struct<s: bigint, d: bigint>>)
            ELSE flatten(transform(ps, x ->
                transform(filter(ps, y -> y != x), y ->
                    struct(x AS s, y AS d))))
            END
            """
        )
        both = baskets.select(F.explode(pair_arr).alias("p"))
        return both.groupBy(F.col("p.s").alias("node")).agg(
            F.array_sort(F.collect_set("p.d")).alias("nbrs")
        )

    return memo_persist(spark, ("copurchase_adjacency", sf_dir), build)


# Last iteration's physical plan (the iteration subtree is consumed by an
# eager localCheckpoint, so it is invisible on the returned frame) — kept
# for the plan tests that pin the broadcast-vs-shuffle join choice.
_LAST_ITER_PLAN: str | None = None

# Conservative bytes-per-row estimate for the broadcast rank relation
# (4 bigints in an UnsafeRow + broadcast HashedRelation overhead). Used
# only for the broadcast-vs-shuffle decision, so erring high is safe.
_RANK_ROW_BYTES = 64


def _broadcast_threshold_bytes(spark) -> int:
    """Parse spark.sql.autoBroadcastJoinThreshold ('10485760', '10MB',
    '-1' = disabled) into bytes."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(raw)) * mult
    except ValueError:
        return 10 << 20


@register("part_copurchase_pagerank", sql=_PAGERANK_SQL)
def part_copurchase_pagerank(spark, sf_dir):
    """3-iteration damped (d=0.85) PageRank in exact fixed-point over the
    part co-purchase graph; rank_fp is the rank in 1e-12 quanta.

    Join strategy is size-guarded (round-6 verdict item 5): the rank
    frame is node-cardinality (the part vocabulary), tiny at bench SF but
    unbounded at 100 TB. While its estimated size fits under
    autoBroadcastJoinThreshold, iterations run over the ADJACENCY-LIST
    artifact (`_copurchase_adjacency`) as one FUSED plan — per-iteration
    broadcast joins probe N rows (not E), contributions explode map-side,
    deg falls out of size(nbrs), and no per-iteration localCheckpoint is
    needed because the only multi-consumed subtrees are the tiny
    broadcast builds, which ReuseExchange materializes once each (r14
    measurement: 22 jobs → 4, 6.4 s → ~3.1 s at sf0.1). Past the
    threshold we fall back to shuffle joins against the skew-safe
    edge-list frame memo-persisted PRE-PARTITIONED on the join key, so
    every iteration reuses the edge partitioning and only the
    node-cardinality side moves; that regime keeps the per-iteration
    localCheckpoint lineage truncation. The guard reads an upper bound on
    node count (the part table's row count — a metadata-cheap scan) so
    the regime is decided BEFORE either graph artifact is built; erring
    high only ever picks the conservative shuffle path. Results are
    identical either way (exact integer arithmetic)."""
    est_nodes = _est_nodes(sf_dir)
    use_broadcast = (
        0 < est_nodes * _RANK_ROW_BYTES <= _broadcast_threshold_bytes(spark)
    )
    global _LAST_ITER_PLAN
    if use_broadcast:
        adj = _copurchase_adjacency(spark, sf_dir)
        n_nodes = adj.count()  # materializes the memo-persist
        # r15: state rides the CONTRIBUTION frame, not a rank frame. The
        # r14 form broadcast TWO node-cardinality relations per iteration
        # (ranks into the contribution join, inc back into the rank
        # update) — 6 sequential broadcast builds for 3 iterations, each
        # a serial driver round-trip (the 8-vs-32-core ratio of 1.00
        # showed the query is bound by exactly this chain). deg and cnt
        # are functions of the cached adjacency, so each iteration needs
        # only ONE broadcast — the previous round's aggregated inc; the
        # rank recomputes inline as the SAME integer expression
        # (guide §1.1, §2.4). Iteration 1's uniform rank needs no join
        # at all: its contributions explode straight off the adjacency.
        # All arithmetic is the identical integer div/sum chain, so the
        # values are bit-equal to the oracle's unrolled CTEs.
        base = F.expr(f"(15 * ({_SCALE} div {n_nodes})) div 100")
        damped = base + F.expr("(85 * coalesce(inc, 0)) div 100")
        inc = (
            adj.select(
                F.explode("nbrs").alias("node2"),
                F.expr(
                    f"({_SCALE} div {n_nodes}) div size(nbrs)"
                ).alias("c"),
            )
            .groupBy(F.col("node2").alias("node"))
            .agg(F.sum("c").alias("inc"))
        )
        for _ in range(_ITERS - 1):
            inc = (
                adj.join(F.broadcast(inc), "node", "left")
                .select(
                    F.explode("nbrs").alias("node2"),
                    damped.alias("r"),
                    F.size("nbrs").cast("bigint").alias("dg"),
                )
                .select("node2", F.expr("r div dg").alias("c"))
                .groupBy(F.col("node2").alias("node"))
                .agg(F.sum("c").alias("inc"))
            )
        ranks = adj.join(F.broadcast(inc), "node", "left").select(
            "node",
            F.size("nbrs").cast("bigint").alias("deg"),
            damped.alias("r"),
        )
        _LAST_ITER_PLAN = (
            ranks._jdf.queryExecution().executedPlan().toString()
        )
        return ranks.select(
            F.col("node").alias("partkey"),
            F.col("deg").cast("bigint").alias("degree"),
            F.col("r").cast("bigint").alias("rank_fp"),
        )
    # shuffle regime: edge-list form, per-iteration lineage truncation
    edges = memo_persist(
        spark,
        ("copurchase_edges_by_s", sf_dir),
        lambda: _copurchase_edges(spark, sf_dir).repartition("s"),
    )
    deg = (
        edges.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    n_nodes = deg.count()
    ranks = deg.select(
        "node", "deg",
        F.lit(n_nodes).alias("cnt"),
        F.lit(_SCALE // n_nodes).alias("r"),
    ).localCheckpoint(eager=True)
    for _ in range(_ITERS):
        inc = (
            edges.join(ranks, edges.s == ranks.node)
            .select(F.col("d").alias("node"), F.expr("r div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        nxt = ranks.join(inc, "node", "left").select(
            "node",
            "deg",
            "cnt",
            (
                F.expr(f"(15 * ({_SCALE} div cnt)) div 100")
                + F.expr("(85 * coalesce(inc, 0)) div 100")
            ).alias("r"),
        )
        _LAST_ITER_PLAN = (
            nxt._jdf.queryExecution().executedPlan().toString()
        )
        ranks = nxt.localCheckpoint(eager=True)
    return ranks.select(
        F.col("node").alias("partkey"),
        F.col("deg").cast("bigint").alias("degree"),
        F.col("r").cast("bigint").alias("rank_fp"),
    )


# --------------------------------------------------------- BFS hop counts
# Multi-source shortest-path-in-hops (the "distance to the nearest seed"
# primitive: influence radius, recall-set expansion, contamination blast
# radius). Hop counts are small exact integers, so unlike float sssp
# weights the ITERATIVE result value-hashes across engines; the oracle
# unrolls the same frontier rounds as CTEs (pagerank precedent). Each
# round is one equi-join of the persisted edges against the frontier +
# one anti-join against the visited set — node-cardinality frames; the
# corpus-scale edge list never re-shuffles on the broadcast path and
# reuses its `s`-hash partitioning on the shuffle path.

_BFS_HOPS = 3
_N_SEEDS = 3


def _bfs_oracle_sql() -> str:
    sql = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
    SELECT pa AS s, pb AS d FROM pairs
    UNION ALL
    SELECT pb AS s, pa AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
d0 AS (SELECT node, 0 AS hop FROM nodes ORDER BY node LIMIT {_N_SEEDS})"""
    prev = "d0"
    for k in range(1, _BFS_HOPS + 1):
        sql += f""",
d{k} AS (
    SELECT * FROM {prev}
    UNION ALL
    SELECT f.node, {k} AS hop FROM (
        SELECT DISTINCT e.d AS node
        FROM edges e JOIN {prev} p ON p.node = e.s AND p.hop = {k - 1}
    ) f
    WHERE f.node NOT IN (SELECT node FROM {prev}))"""
        prev = f"d{k}"
    return sql + f"""
SELECT node AS partkey, CAST(hop AS INT) AS hop FROM {prev}
"""


_BFS_SQL = _bfs_oracle_sql()

# Last frontier round's physical plan (consumed by the eager
# localCheckpoint, invisible on the returned frame) — for the plan test
# pinning the broadcast-vs-shuffle choice, like _LAST_ITER_PLAN above.
_LAST_BFS_PLAN: str | None = None


@register("copurchase_bfs_hops", sql=_BFS_SQL)
def copurchase_bfs_hops(spark, sf_dir):
    """Hops from the nearest of the _N_SEEDS lowest-partkey seeds over
    the co-purchase graph, _BFS_HOPS frontier rounds; unreached nodes
    are absent. Same size-guarded join strategy as the pagerank gate:
    frontier/visited frames broadcast while node-cardinality fits under
    autoBroadcastJoinThreshold, else shuffle joins against edges
    memo-persisted pre-partitioned on the join key.

    r14: the broadcast regime expands frontiers over the adjacency-list
    artifact (join probes N rows, neighbors explode map-side) — the same
    restructure as pagerank; the per-round checkpoints stay because
    ``dist`` genuinely feeds two consumers per round."""
    est_nodes = _est_nodes(sf_dir)
    use_broadcast = (
        0 < est_nodes * _RANK_ROW_BYTES <= _broadcast_threshold_bytes(spark)
    )
    if use_broadcast:
        node_hint = F.broadcast
        adj = _copurchase_adjacency(spark, sf_dir)
        nodes = adj.select("node")
        n_nodes = adj.count()  # materializes the memo-persist
    else:
        node_hint = lambda df: df  # noqa: E731
        edges = memo_persist(
            spark,
            ("copurchase_edges_by_s", sf_dir),
            lambda: _copurchase_edges(spark, sf_dir).repartition("s"),
        )
        nodes = edges.select(F.col("s").alias("node")).distinct()
        nodes = nodes.localCheckpoint(eager=True)
        n_nodes = nodes.count()
    dist = (
        nodes.orderBy("node")
        .limit(_N_SEEDS)
        .select("node", F.lit(0).alias("hop"))
        .localCheckpoint(eager=True)
    )
    for k in range(1, _BFS_HOPS + 1):
        frontier = dist.where(F.col("hop") == k - 1).select("node")
        if use_broadcast:
            reached = (
                adj.join(F.broadcast(frontier), "node")
                .select(F.explode("nbrs").alias("node"))
                .distinct()
            )
        else:
            reached = (
                edges.join(node_hint(frontier), edges.s == frontier.node)
                .select(F.col("d").alias("node"))
                .distinct()
            )
        fresh = reached.join(node_hint(dist), "node", "left_anti").select(
            "node", F.lit(k).alias("hop")
        )
        global _LAST_BFS_PLAN
        _LAST_BFS_PLAN = (
            fresh._jdf.queryExecution().executedPlan().toString()
        )
        # checkpoint per round: the next round's anti-join consumes dist
        # twice (frontier + visited) — without truncation round i replays
        # rounds 1..i-1 (the pagerank lineage lesson)
        dist = dist.unionAll(fresh).localCheckpoint(eager=True)
    return dist.select(F.col("node").alias("partkey"), F.col("hop").cast("int"))


# ----------------------------------------------------- label propagation
# Deterministic semi-synchronous LPA (community detection): every node
# starts as its own label; each round it adopts the most frequent label
# among its NEIGHBORS, ties broken (count desc, label asc) — fully
# deterministic, so unlike classic randomized LPA the iterative result
# value-hashes across engines. Per round: one equi-join of the persisted
# edges against the node-cardinality label frame, one (node, label)
# count aggregate, and a rank-1 window (WindowGroupLimit prunes
# map-side). Same broadcast/shuffle size guard as the other members.

_LPA_ITERS = 2


def _lpa_oracle_sql() -> str:
    sql = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
    SELECT pa AS s, pb AS d FROM pairs
    UNION ALL
    SELECT pb AS s, pa AS d FROM pairs
),
l0 AS (SELECT DISTINCT s AS node, s AS lab FROM edges)"""
    for k in range(1, _LPA_ITERS + 1):
        sql += f""",
c{k} AS (
    SELECT e.s AS node, p.lab, COUNT(*) AS cnt
    FROM edges e JOIN l{k - 1} p ON p.node = e.d
    GROUP BY 1, 2
),
l{k} AS (
    SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (
                   PARTITION BY node ORDER BY cnt DESC, lab ASC
               ) AS rn
        FROM c{k}) WHERE rn = 1)"""
    return sql + f"""
SELECT node AS partkey, CAST(lab AS BIGINT) AS community FROM l{_LPA_ITERS}
"""


_LPA_SQL = _lpa_oracle_sql()


@register("copurchase_label_prop", sql=_LPA_SQL)
def copurchase_label_prop(spark, sf_dir):
    """_LPA_ITERS rounds of deterministic synchronous label propagation
    over the co-purchase graph; community = the converged-so-far label."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("lab"))
    est_nodes = _est_nodes(sf_dir)
    use_broadcast = (
        0 < est_nodes * _RANK_ROW_BYTES <= _broadcast_threshold_bytes(spark)
    )
    if use_broadcast:
        # r14: FUSED adjacency-list rounds (the pagerank restructure) —
        # a node's label flows to every neighbor via one N-row broadcast
        # join + map-side explode per round; the label chain is linear
        # (each labels_{k} feeds only counts_{k+1}) so no per-round
        # checkpoint is needed.
        adj = _copurchase_adjacency(spark, sf_dir)
        adj.count()  # materializes the memo-persist once
        labels = adj.select("node", F.col("node").alias("lab"))
        for _ in range(_LPA_ITERS):
            counts = (
                adj.join(F.broadcast(labels), "node")
                .select(F.explode("nbrs").alias("node2"), "lab")
                .groupBy(F.col("node2").alias("node"), F.col("lab"))
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            labels = (
                counts.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("node", "lab")
            )
        return labels.select(
            F.col("node").alias("partkey"),
            F.col("lab").cast("bigint").alias("community"),
        )
    edges = memo_persist(
        spark,
        ("copurchase_edges_by_s", sf_dir),
        lambda: _copurchase_edges(spark, sf_dir).repartition("s"),
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_LPA_ITERS):
        # neighbor labels arrive over the d-side join so e.s aggregates
        counts = (
            edges.join(labels, edges.d == labels.node)
            .select(F.col("s").alias("node"), "lab")
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=True)
        )
    return labels.select(
        F.col("node").alias("partkey"), F.col("lab").cast("bigint").alias("community")
    )


# --------------------------------------------------------- triangle counts
# Per-node triangle participation over the co-purchase graph via the
# standard degree-ordered (compact-forward) algorithm: orient each
# undirected edge from its (degree, node)-smaller endpoint to the larger,
# so every triangle a<b<c is enumerated EXACTLY once as the wedge
# (a→b, b→c) closed by (a→c). Degree ordering is what makes this scale:
# wedge counts are Σ out-deg², and orientation caps out-degree at
# O(sqrt(|E|)) for any graph — the all-pairs blowup a naive neighbor
# self-join hits on hubs cannot happen. Exact integers, one-shot (no
# iterations): joins shuffle on the wedge key, per-node credit is one
# map-side-combinable aggregate.

_TRIANGLE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
    SELECT pa AS s, pb AS d FROM pairs
    UNION ALL
    SELECT pb AS s, pa AS d FROM pairs
),
deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY s),
ordered AS (
    SELECT e.s AS u, e.d AS v
    FROM edges e
    JOIN deg a ON a.node = e.s
    JOIN deg b ON b.node = e.d
    WHERE a.deg < b.deg OR (a.deg = b.deg AND a.node < b.node)
),
tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM ordered e1
    JOIN ordered e2 ON e2.u = e1.v
    JOIN ordered e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT node AS partkey, CAST(COUNT(*) AS BIGINT) AS triangles
FROM corners GROUP BY node
"""


@register("copurchase_triangles", sql=_TRIANGLE_SQL)
def copurchase_triangles(spark, sf_dir):
    """Per-node triangle counts; nodes in no triangle are absent.

    Physical strategy: edge-iterator with sorted-adjacency intersection
    rather than the literal wedge self-join the oracle spells — for edge
    u→v the closing vertices are exactly out(u) ∩ out(v), so the plan is
    ONE adjacency aggregate plus two equi-joins of the E-row oriented
    edge list against the node-cardinality adjacency frame, the
    intersection and corner-credit explode all map-side. The 49M-row
    wedge frame the self-join form materializes (measured at sf0.1)
    never exists. Adjacency broadcasts while Σ|out| fits the threshold;
    past it both joins degrade to shuffle equi-joins of E rows — still
    strictly cheaper than shuffling the O(E^1.5) wedge set."""
    # r14: derive the oriented edge stream from the adjacency-list
    # artifact — deg_s falls out of size(nbrs) and only ONE E-row join
    # (for deg_d) remains instead of two; the guard decides the regime
    # before either artifact is built (the pagerank restructure).
    est_nodes = _est_nodes(sf_dir)
    if 0 < est_nodes * _RANK_ROW_BYTES <= _broadcast_threshold_bytes(spark):
        adj0 = _copurchase_adjacency(spark, sf_dir)
        deg = adj0.select("node", F.size("nbrs").cast("bigint").alias("deg"))
        b = deg.selectExpr("node AS d", "deg AS deg_d")
        ordered = (
            adj0.select(
                F.col("node").alias("s"),
                F.size("nbrs").cast("bigint").alias("deg_s"),
                F.explode("nbrs").alias("d"),
            )
            .join(F.broadcast(b), "d")
            .where(
                (F.col("deg_s") < F.col("deg_d"))
                | ((F.col("deg_s") == F.col("deg_d")) & (F.col("s") < F.col("d")))
            )
            .select(F.col("s").alias("u"), F.col("d").alias("v"))
            .persist()  # consumed by the adjacency agg + the edge stream
        )
    else:
        edges = _copurchase_edges(spark, sf_dir)
        deg = edges.groupBy(F.col("s").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        # orient: (deg, node)-smaller endpoint → larger, capping out-degree
        # at O(sqrt(E)); deg joins broadcast under the pagerank guard's
        # node-cardinality argument.
        a = deg.selectExpr("node AS s", "deg AS deg_s")
        b = deg.selectExpr("node AS d", "deg AS deg_d")
        ordered = (
            edges.join(a, "s")
            .join(b, "d")
            .where(
                (F.col("deg_s") < F.col("deg_d"))
                | ((F.col("deg_s") == F.col("deg_d")) & (F.col("s") < F.col("d")))
            )
            .select(F.col("s").alias("u"), F.col("d").alias("v"))
            .persist()  # consumed by the adjacency agg + the edge stream
        )
    adj = (
        ordered.groupBy(F.col("u").alias("node")).agg(
            F.sort_array(F.collect_list("v")).alias("nbrs")
        )
        # consumed TWICE (au on u, av on v — different join keys, so the
        # two broadcast builds cannot share an exchange): materialize the
        # N-row adjacency once instead of re-running the agg+sort per side
        # (captured before-plan: 25 scans / 64 exchanges, 0 reuse)
        .localCheckpoint(eager=True)
    )
    # broadcast guard: adjacency holds one entry per oriented edge
    n_edges = ordered.count()
    if 0 < n_edges * 16 <= _broadcast_threshold_bytes(spark):
        hint = F.broadcast
    else:
        hint = lambda df: df  # noqa: E731
    au = adj.selectExpr("node AS u", "nbrs AS nbrs_u")
    av = adj.selectExpr("node AS v", "nbrs AS nbrs_v")
    tri = (
        # inner joins are exact: a missing v-adjacency means out(v) is
        # empty, so the intersection would be empty anyway
        ordered.join(hint(au), "u")
        .join(hint(av), "v")
        .select(
            "u", "v",
            F.explode(F.array_intersect("nbrs_u", "nbrs_v")).alias("w"),
        )
    )
    corners = tri.select(
        F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
    )
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
        .select(F.col("node").alias("partkey"), "triangles")
    )
