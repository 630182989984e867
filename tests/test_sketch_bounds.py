"""Error bound for the rows-only HLL rollup gate (weekly_hll_rollup):
the merged-sketch estimate must stay within 5% of the exact weekly
distinct count (lgConfigK=14 gives ~0.8% standard error, so 5% is a
loose tripwire for a broken merge, not a tight accuracy claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.queries.analytics import weekly_hll_rollup
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL


def test_weekly_hll_estimate_within_bound(spark):
    est = {
        r["week"]: r["est_users"]
        for r in weekly_hll_rollup(spark, SF_DIR_SMALL).collect()
    }
    e = load_table(spark, SF_DIR_SMALL, "events")
    exact = {
        r["week"]: r["exact"]
        for r in (
            e.groupBy(F.date_trunc("week", "ts").cast("date").alias("week"))
            .agg(F.countDistinct("user_id").alias("exact"))
            .collect()
        )
    }
    assert set(est) == set(exact)
    for week, ex in exact.items():
        assert abs(est[week] - ex) <= max(1, 0.05 * ex), (week, est[week], ex)
