"""Cost-based-optimizer pin: table statistics drive the join strategy.

A catalog table whose ANALYZE'd size is under the broadcast threshold
must broadcast WITHOUT an explicit hint — at 100 TB the planner, not the
query author, should pick sides as dims grow/shrink. The negative case
(stats absent + conservative file-size estimate over threshold) keeps a
sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMALL


def test_analyzed_stats_enable_unhinted_broadcast(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_test")
    try:
        sup = spark.read.parquet(f"{SF_DIR_SMALL}/supplier.parquet")
        sup.write.mode("overwrite").saveAsTable("cbo_test.supplier_dim")
        spark.sql(
            "ANALYZE TABLE cbo_test.supplier_dim COMPUTE STATISTICS"
        )
        stats = spark.sql(
            "DESCRIBE EXTENDED cbo_test.supplier_dim"
        ).collect()
        assert any(
            "Statistics" in (r["col_name"] or "") for r in stats
        ), "ANALYZE left no statistics row"

        li = spark.read.parquet(f"{SF_DIR_SMALL}/lineitem.parquet")
        dim = spark.table("cbo_test.supplier_dim")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
        try:
            joined = li.join(dim, li.l_suppkey == dim.s_suppkey).groupBy(
                "s_name"
            ).agg(F.count(F.lit(1)).alias("n"))
            plan = joined._sc._jvm.PythonSQLUtils.explainString(
                joined._jdf.queryExecution(), "formatted"
            )
            assert "BroadcastHashJoin" in plan, plan[:1500]

            # negative control: threshold below the dim's size => no
            # unhinted broadcast
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
            joined2 = li.join(dim, li.l_suppkey == dim.s_suppkey)
            plan2 = joined2._sc._jvm.PythonSQLUtils.explainString(
                joined2._jdf.queryExecution(), "formatted"
            )
            assert "SortMergeJoin" in plan2, plan2[:1500]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_test.supplier_dim")
        spark.sql("DROP DATABASE IF EXISTS cbo_test")
