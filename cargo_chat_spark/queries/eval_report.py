"""ANN evaluation as a first-class, oracle-gated operator.

Every ANN member's recall is pinned in pytest (tests/test_ann_recall.py),
but a production retrieval stack wants recall as DATA — a report the
pipeline can compute per corpus version, alert on, and regress. This
gate computes recall@10 vs the exact kNN for three ladder members
(LSH forest, trained IVF, int8 re-rank) entirely declaratively: the
exact and approximate top-10 sets are the ALREADY-GATED queries, hits
are a per-query semi-join intersection, and the recall is integer
micro-units (floor(1e6·hits/(10·|Q|))) so the whole report value-hashes
across engines. The oracle nests the members' existing DuckDB oracles
verbatim — a change in any member's semantics moves this report too.

Scale shape: each member costs its own (gated) plan plus one broadcast
semi-join against the exact set (|Q|·10 rows, tiny) and a 1-row
aggregate — the report adds no term beyond the members it measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.queries.registry import register


def _report_sql() -> str:
    from cargo_chat_spark.queries.ann_lsh import _RP_FOREST_SQL
    from cargo_chat_spark.queries.similarity import _trained_sql
    from cargo_chat_spark.queries.vector_search import _KNN_INT8_SQL, _KNN_SQL

    members = {
        "forest": _RP_FOREST_SQL,
        "int8": _KNN_INT8_SQL,
        "ivf_trained": _trained_sql(),
    }
    parts = []
    for name, sql in sorted(members.items()):
        parts.append(f"""
SELECT '{name}' AS member,
    (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM exact)
        AS n_queries,
    (SELECT CAST(count(*) AS BIGINT)
     FROM ({sql}) a
     JOIN exact e ON a.query_id = e.query_id
                 AND a.neighbor_id = e.neighbor_id) AS n_hits""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH exact AS (
    SELECT query_id, neighbor_id FROM ({_KNN_SQL}) x
)
SELECT member, n_queries, n_hits,
    (1000000 * n_hits) // (10 * n_queries) AS recall_micro
FROM ({body})
"""


@register("ann_recall_report", sql=_report_sql())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 vs exact kNN for three ANN ladder members, as one
    value-hashed report row per member — evaluation-as-data for the
    retrieval stack. Fully declarative: no collect anywhere; each
    member's plan is its gated form, hits come from a semi-join against
    the exact top-10 set, recall is exact integer micro-units."""
    from cargo_chat_spark.queries.ann_lsh import rp_lsh_forest_topk
    from cargo_chat_spark.queries.similarity import ivf_topk_trained
    from cargo_chat_spark.queries.vector_search import (
        knn_exact,
        knn_int8_rerank,
    )

    exact = knn_exact(spark, sf_dir).select("query_id", "neighbor_id")
    nq = exact.agg(
        F.count_distinct("query_id").cast("bigint").alias("n_queries")
    )
    members = {
        "forest": rp_lsh_forest_topk,
        "int8": knn_int8_rerank,
        "ivf_trained": ivf_topk_trained,
    }
    parts = []
    for name in sorted(members):
        approx = members[name](spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        hits = approx.join(
            exact, ["query_id", "neighbor_id"], "semi"
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        parts.append(
            hits.crossJoin(F.broadcast(nq)).select(
                F.lit(name).alias("member"), "n_queries", "n_hits"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "member",
        "n_queries",
        "n_hits",
        F.expr("(1000000 * n_hits) DIV (10 * n_queries)").alias(
            "recall_micro"
        ),
    )
