"""Error bound for the HLL rollup gate (weekly_hll_rollup): the
merged-sketch estimate must stay within 5% of the exact weekly distinct
count (lgConfigK=14 gives ~0.8% standard error, so 5% is a loose
tripwire for a broken merge, not a tight accuracy claim). Since round
10 the gate itself value-hashes this bound as a boolean column
(within_5pct) plus the exact count — this test pins that the booleans
hold and the gate's exact column matches an independent recomputation."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.queries.analytics import weekly_hll_rollup
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL


def test_weekly_hll_estimate_within_bound(spark):
    rows = weekly_hll_rollup(spark, SF_DIR_SMALL).collect()
    e = load_table(spark, SF_DIR_SMALL, "events")
    exact = {
        r["week"]: r["exact"]
        for r in (
            e.groupBy(F.date_trunc("week", "ts").cast("date").alias("week"))
            .agg(F.countDistinct("user_id").alias("exact"))
            .collect()
        )
    }
    assert {r["week"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_users"] == exact[r["week"]], r
        assert r["within_5pct"], f"HLL estimate outside 5% for {r['week']}"
