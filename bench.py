"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized via the noop sink (no driver collect, no
column-prune shortcut), mirroring how a cluster job would evaluate it.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cargo_chat_spark.queries import catalog  # noqa: E402
from cargo_chat_spark.session import get_spark  # noqa: E402

# Representative spread: vector search, retrieval pipeline, relational aggs,
# profiling, dedup families, text analysis, streaming-batch windows.
HEADLINE = [
    "knn_exact",
    "knn_exact_numpy",
    "rp_lsh_topk",
    "revenue_rollup",
    "segment_running_totals",
    "cosine_topk",
    "ivf_topk",
    "embedding_neardup_pairs",
    "retrieval_rank_reference",
    "context_assembly",
    "pricing_summary",
    "top_customers",
    "repo_profile",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "doc_fingerprints",
    "chunk_documents",
    "mock_embed_documents",
    "token_count",
    "quality_score",
    "events_tumbling_window",
    "event_sessions",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="cargo_chat_spark_bench")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = catalog.SPARK_QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
