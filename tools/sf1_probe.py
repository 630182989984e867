"""One-decade scaling probe (r7 verdict item 5): synthesize an sf1-scale
fixture from sf0.1 (10x replication) and measure the sf0.1 -> sf1 wall
ratio for the 10 most expensive headline queries (medians of 3), printing
a markdown table with the per-query scaling exponent log10(t10/t1).

Replication is DECORRELATED so the synthetic decade has realistic
duplicate/neighbor density instead of manufactured 10-way clusters:

- documents: per-replica cyclic translate over 'aeiounrst' (rotations
  1..9 are all non-identity), so shingles/grams/minhash signatures differ
  across replicas — near-dup pair volume stays ~linear (within-replica),
  as it would in a real 10x corpus.
- embeddings: per-replica cyclic DIMENSION rotation (a permutation:
  norms and within-replica distances unchanged, cross-replica vectors
  decorrelated) — SemDeDup cells and embedding-pair candidates scale
  linearly. vec_id offsets are NOT multiples of 100, so the
  `vec_id % 100 == 0` query set stays the ORIGINAL |Q| — the production
  shape where |Q| is an application constant, not a corpus fraction.
- lineitem/orders/customer/events: id offsets (multiples of 10^8) keep
  keys unique and co-purchase subgraphs disjoint (the scale_probe.py
  convention).

Usage: python tools/sf1_probe.py [base_sf_dir] [factor]
(SPARK_GRAFT_PROBE_QUERIES=a,b,c overrides the measured query list.)
"""

from __future__ import annotations

import math
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

QUERIES = [
    "part_copurchase_pagerank",
    "semdedup_keep",
    "retrieval_rank_reference",
    "rp_lsh_forest_topk",
    "knn_exact",
    "ivf_topk_trained",
    "contamination_bloom",
    "curation_pipeline",
    "minhash_lsh_pairs",
    "ivfpq_topk",
    # not headline-top-10 but named by the verdict: the group-aware split
    # runs the whole minhash -> LSH -> components pipeline per repeat
    "leakage_safe_split",
]
if os.environ.get("SPARK_GRAFT_PROBE_QUERIES"):
    QUERIES = [
        q.strip()
        for q in os.environ["SPARK_GRAFT_PROBE_QUERIES"].split(",")
        if q.strip()
    ]

_ID_TABLES = {
    "lineitem": ["l_orderkey", "l_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}
_COPY_TABLES = ["region", "nation", "supplier", "part"]
_ALPHA = "aeiounrst"


# SPARK_GRAFT_PROBE_TABLES=documents,embeddings limits replication to the
# named tables (the rest are copied at 1x) — the 100x two-decade probe
# (r12 verdict item 7) only reads the corpus tables, and writing a 60M-row
# lineitem it never scans would just burn the probe budget.
_REPL_ONLY = {
    t.strip()
    for t in os.environ.get("SPARK_GRAFT_PROBE_TABLES", "").split(",")
    if t.strip()
}


def _replicate(spark, base: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in _COPY_TABLES:
        shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    for t in list(_ID_TABLES) + ["documents", "embeddings"]:
        if _REPL_ONLY and t not in _REPL_ONLY:
            src = f"{base}/{t}.parquet"
            dst = f"{out}/{t}.parquet"
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(
                src, dst
            )
    for t, id_cols in _ID_TABLES.items():
        if _REPL_ONLY and t not in _REPL_ONLY:
            continue
        df = spark.read.parquet(f"{base}/{t}.parquet")
        parts = [df]
        for i in range(1, factor):
            s = df
            for c in id_cols:
                s = s.withColumn(c, F.col(c) + F.lit(i * 100_000_000))
            parts.append(s)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    if not _REPL_ONLY or "documents" in _REPL_ONLY:
        docs = spark.read.parquet(f"{base}/documents.parquet")
        parts = [docs]
        for i in range(1, factor):
            rot = _ALPHA[i % len(_ALPHA):] + _ALPHA[: i % len(_ALPHA)]
            parts.append(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 100_000_000)
                ).withColumn("text", F.translate("text", _ALPHA, rot))
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    if not _REPL_ONLY or "embeddings" in _REPL_ONLY:
        emb = spark.read.parquet(f"{base}/embeddings.parquet")
        dim = len(emb.select("embedding").first()[0])
        parts = [emb]
        for i in range(1, factor):
            k = i % dim or 1
            # i >= dim repeats the rotation cycle; compose with an
            # elementwise sign flip on the repeat pass (a distinct
            # isometry: norms and within-replica distances unchanged)
            # so a 100x probe doesn't manufacture exact-duplicate
            # replicas of replica (i - dim + 1)
            rotated = F.expr(
                f"concat(slice(embedding, {k + 1}, {dim - k}), "
                f"slice(embedding, 1, {k}))"
            )
            if i >= dim:
                rotated = F.expr(
                    f"transform(concat(slice(embedding, {k + 1}, {dim - k}), "
                    f"slice(embedding, 1, {k})), x -> -x)"
                )
            parts.append(
                emb.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * 100_000_001)
                ).withColumn("embedding", rotated)
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> None:
    from cargo_chat_spark import caching
    from cargo_chat_spark.queries import catalog
    from cargo_chat_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="sf1_probe")
    work = tempfile.mkdtemp(prefix="sf1_probe_")
    big = f"{work}/x{factor}"
    t0 = time.time()
    _replicate(spark, base, big, factor)
    print(f"[replicate x{factor}] {round(time.time() - t0, 1)}s", flush=True)

    # JIT warm pass at 1x
    for q in QUERIES:
        catalog.SPARK_QUERIES[q](spark, base).write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    for f, d in ((1, base), (factor, big)):
        for q in QUERIES:
            reps = []
            for _ in range(3):
                caching.invalidate_all()
                t0 = time.perf_counter()
                catalog.SPARK_QUERIES[q](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(time.perf_counter() - t0)
            results[q][f] = round(statistics.median(reps), 3)
            print(f"  [{f}x] {q}: {[round(r, 2) for r in reps]}", flush=True)

    print(f"| query | 1x (s) | {factor}x (s) | ratio | exponent |")
    print("|---|---|---|---|---|")
    for q in QUERIES:
        r1, rf = results[q][1], results[q][factor]
        ratio = rf / r1 if r1 else float("nan")
        expo = math.log(ratio, factor) if r1 and ratio > 0 else float("nan")
        print(f"| {q} | {r1} | {rf} | {round(ratio, 2)} | {round(expo, 2)} |")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
