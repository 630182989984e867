"""Entity resolution / record linkage over the part dimension — the
fuzzy-matching family (blocked edit-distance candidate pairs, then
connected-component canonicalization into entity ids).

This is the classic MDM / catalog-dedup shape a training-data pipeline
needs for source canonicalization (merge "cold bolt" / "old bolt" style
spelling variants before per-entity aggregation), and the string-domain
sibling of the MinHash/SimHash document near-dup family.

Scale posture:

- Candidate generation is BLOCKED: names are first aggregated to a
  distinct-name frame (a dim-sized aggregate of the fact table — at
  100 TB this is the classic heavy-hitter-safe projection), and pairs
  are generated only within a block (same last token), i.e. an
  equi-join on the block key — never an all-pairs cross join. Skewed
  blocks would get the same hot-bucket cap as the LSH bands
  (operators/dedup.py::cap_hot_buckets) — unnecessary here because the
  block key domain is the noun vocabulary.
- ``levenshtein`` is a JVM built-in on both engines (classic DP — no
  float, bit-identical results).
- Entity canonicalization runs
  operators/graph.py::connected_components_local — the bounded-collect
  union-find: the name graph is DIM-sized by construction (nodes <=
  distinct names), where the distributed pointer-jump loop would pay
  ~15 s of per-round scheduler overhead for microseconds of work
  (measured; see the operator docstring). Document-scale graphs keep the
  distributed loop (neardup_components). Label equivalence between the
  two is pinned by tests/test_graph_components.py; the oracle is an
  independent recursive-CTE closure.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cargo_chat_spark.operators.graph import connected_components_local
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table

_NAMES_CTE = """
names AS (
    SELECT p_name,
           CAST(MIN(p_partkey) AS BIGINT) AS name_id,
           COUNT(*) AS n_parts,
           string_split(p_name, ' ')[-1] AS block_key
    FROM part GROUP BY p_name
)
"""

_SIMILAR_SQL = f"""
WITH {_NAMES_CTE}
SELECT a.p_name AS name_a, b.p_name AS name_b,
       a.n_parts AS n_a, b.n_parts AS n_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM names a JOIN names b
  ON a.block_key = b.block_key AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


def _names(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_name")
        .agg(
            F.min("p_partkey").cast("bigint").alias("name_id"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .withColumn("block_key", F.element_at(F.split("p_name", " "), -1))
    )


@register("similar_part_names", sql=_SIMILAR_SQL)
def similar_part_names(spark, sf_dir):
    """Blocked Levenshtein candidate pairs (edit distance <= 3, same last
    token) between distinct part names."""
    names = _names(spark, sf_dir)
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
        F.col("block_key").alias("bk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
        F.col("block_key").alias("bk2"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("bk") == F.col("bk2")) & (F.col("name_a") < F.col("name_b")),
        )
        .where(dist <= 3)
        .select("name_a", "name_b", "n_a", "n_b", dist.cast("int").alias("dist"))
    )


_ENTITY_SQL = f"""
WITH RECURSIVE {_NAMES_CTE},
pairs AS (
    SELECT a.name_id AS id_a, b.name_id AS id_b
    FROM names a JOIN names b
      ON a.block_key = b.block_key AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
),
edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs
    UNION ALL
    SELECT id_b AS s, id_a AS d FROM pairs
),
reach(src, dst) AS (
    SELECT s, s FROM edges
    UNION
    SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s
),
comp AS (
    SELECT src AS name_id, MIN(dst) AS component_id
    FROM reach GROUP BY src
)
SELECT n.p_name, n.name_id, n.n_parts,
       CAST(COALESCE(c.component_id, n.name_id) AS BIGINT) AS entity_id
FROM names n LEFT JOIN comp c ON c.name_id = n.name_id
"""


@register("part_name_entities", sql=_ENTITY_SQL)
def part_name_entities(spark, sf_dir):
    """Canonical entity id per part name: connected components over the
    edit-distance<=2 blocked pair graph (min name_id per component);
    isolated names keep their own id."""
    names = _names(spark, sf_dir)
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("name_id").alias("id_a"),
        F.col("block_key").alias("bk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("name_id").alias("id_b"),
        F.col("block_key").alias("bk2"),
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("bk") == F.col("bk2")) & (F.col("name_a") < F.col("name_b")),
        )
        .where(F.levenshtein("name_a", "name_b") <= 2)
        .select("id_a", "id_b")
    )
    edges = pairs.selectExpr("id_a AS s", "id_b AS d").unionAll(
        pairs.selectExpr("id_b AS s", "id_a AS d")
    )
    # name graphs are dim-sized by construction (nodes <= distinct part
    # names, a vocabulary, not a fact table) -> bounded-collect union-find;
    # document-scale graphs keep the distributed loop (neardup_components)
    comp = connected_components_local(edges)
    return (
        names.join(comp, names.name_id == comp.doc_id, "left")
        .select(
            "p_name",
            "name_id",
            "n_parts",
            F.coalesce(F.col("component_id"), F.col("name_id"))
            .cast("bigint")
            .alias("entity_id"),
        )
    )


# --------------------------------------- recursive-CTE closure (Spark 4)
# Third member of the connected-components family, and the gate for
# Spark 4's WITH RECURSIVE surface: the SAME entity closure computed
# declaratively in SQL on BOTH engines. Spark does not yet support UNION
# (dedup) inside recursion, so the Spark side runs UNION ALL with an
# explicit depth bound (8 — far above the name graph's diameter; the
# path-enumeration blowup is bounded because blocked-edit-distance
# components are tiny chains) and dedups in the final aggregate. The
# oracle keeps DuckDB's fixed-point UNION form — agreement proves the
# bounded unrolling reached the same closure.
#
# r5 verdict item 3: CTEs referenced from inside the recursion are
# INLINED into every iteration step, so the blocked Levenshtein pair
# build re-ran up to 9 times (measured 2.08x the bar single-shot). The
# edge frame is therefore PERSISTED before the recursion (memo-keyed, so
# bench cold repeats invalidate it like every other persisted subtree):
# each recursion step now reads an InMemoryTableScan of the dim-sized
# edge list instead of re-running groupBy+broadcast-join+levenshtein.
@register("part_name_entities_recursive", sql=_ENTITY_SQL)
def part_name_entities_recursive(spark, sf_dir):
    """Entity ids via a recursive CTE (transitive closure in SQL)."""
    from cargo_chat_spark import caching

    names = _names(spark, sf_dir)
    suffix = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    view = f"rcte_names_{suffix}"
    eview = f"rcte_edges_{suffix}"
    names.createOrReplaceTempView(view)

    def _build_edges():
        a = names.select(
            F.col("p_name").alias("name_a"),
            F.col("name_id").alias("id_a"),
            F.col("block_key").alias("bk"),
        )
        b = names.select(
            F.col("p_name").alias("name_b"),
            F.col("name_id").alias("id_b"),
            F.col("block_key").alias("bk2"),
        )
        pairs = (
            a.join(
                F.broadcast(b),
                (F.col("bk") == F.col("bk2"))
                & (F.col("name_a") < F.col("name_b")),
            )
            .where(F.levenshtein("name_a", "name_b") <= 2)
            .select("id_a", "id_b")
        )
        return pairs.selectExpr("id_a AS s", "id_b AS d").unionAll(
            pairs.selectExpr("id_b AS s", "id_a AS d")
        )

    edges = caching.memo_persist(
        spark, ("rcte_edges", os.path.normpath(sf_dir)), _build_edges
    )
    edges.createOrReplaceTempView(eview)
    return spark.sql(
        f"""
WITH RECURSIVE reach(src, dst, depth) AS (
    SELECT s, s, 0 FROM {eview}
    UNION ALL
    SELECT r.src, e.d, r.depth + 1
    FROM reach r JOIN {eview} e ON r.dst = e.s
    WHERE r.depth < 8
),
comp AS (
    SELECT src AS name_id, MIN(dst) AS component_id
    FROM reach GROUP BY src
)
SELECT n.p_name, n.name_id, n.n_parts,
       CAST(COALESCE(c.component_id, n.name_id) AS BIGINT) AS entity_id
FROM {view} n LEFT JOIN comp c ON c.name_id = n.name_id
"""
    )
