"""Capture the POST-EXECUTION plan (AQE final, isFinalPlan=true) for
named queries: run each query through the noop sink (bench's timing
action), then dump `.explain("formatted")` — after execution the
AdaptiveSparkPlan prints its re-optimised final plan, including
ReusedExchange / AQEShuffleRead nodes that the pre-execution dump
cannot show (VERDICT r14 item 7: prove exchange reuse with
isFinalPlan=true dumps).

Usage:
    PYTHONPATH=/root/repo python tools/capture_final_plan.py \
        OUTDIR SUFFIX name...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cargo_chat_spark import caching  # noqa: E402
from cargo_chat_spark.queries import catalog  # noqa: E402
from cargo_chat_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_final_plan")
    for name in names:
        df = catalog.SPARK_QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        caching.invalidate_all()
    spark.stop()


if __name__ == "__main__":
    main()
