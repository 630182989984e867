"""Forest occupancy lever at the SIZED configuration, with recall
(r9 verdict item 5): SCALE.md's round-9 follow-up showed the probe flat
across a decade when the plane count scales with log2(corpus); this
tool measures the probe-decade row AT the sizing rule's setting and
records recall@10 there, so the lever's cost claim carries a quality
bar instead of assuming the extra planes are free.

Sizing rule (SCALE.md): planes >= log2(corpus / target_occupancy). With
target occupancy 64/bucket, the sf0.1 corpus (~2k vectors) sizes to
p5 and the 10x decorrelated corpus (~20k) to p8 — so the sized decade
ladder is [1x @ p5] -> [10x @ p8] (occupancy held constant), probed at
the production shape (fixed |Q|=24, pruned scan).

For each (scale, planes) leg the tool reports the probe median (3 reps,
store memo warm) AND recall@10 of the store probe vs the exact kNN over
the same query set — exact ground truth via the broadcast crossJoin +
fixed-dim euclidean the kNN gate uses.

Usage: python tools/forest_lever_recall.py [base_sf_dir] [factor]
"""

from __future__ import annotations

import math
import os
import shutil
import statistics
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from sf1_probe import _replicate  # noqa: E402

TARGET_OCCUPANCY = 64


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _sized_planes(n_vectors: int) -> int:
    return max(1, math.ceil(math.log2(max(2, n_vectors) / TARGET_OCCUPANCY)))


def _exact_topk(spark, queries, emb, k=10):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cargo_chat_spark.functions import vectors

    dim = vectors.infer_dim(emb, "embedding")
    dist = F.expr(vectors.euclidean_fixed_sql("`qvec`", "`embedding`", dim))
    w = Window.partitionBy("query_id").orderBy("distance", "neighbor_id")
    return (
        emb.crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dist.alias("distance"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from cargo_chat_spark.session import get_spark
    from cargo_chat_spark.sources.forest_store import (
        probe_forest_store,
        write_forest_store,
    )
    from cargo_chat_spark.sources.testdata import load_table

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="forest_lever_recall")
    work = tempfile.mkdtemp(prefix="forest_lever_")
    big = f"{work}/x{factor}"
    t0 = time.time()
    _replicate(spark, base, big, factor)
    print(f"[replicate x{factor}] {round(time.time() - t0, 1)}s", flush=True)

    # production |Q|: a FIXED query set drawn from the BASE corpus ids
    # (present unchanged in every replica set) — the query load is an
    # application constant across scales, never a corpus fraction
    base_emb = load_table(spark, base, "embeddings").select(
        "vec_id", "embedding"
    )
    qset = base_emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    ).persist()
    legs = []
    for tag, d, planes, n_tables in (
        ("1x", base, None, None),
        (f"{factor}x", big, None, None),
        # co-sizing leg: more planes cut per-table collision probability
        # for true neighbors too, so the OTHER lever (table count) buys
        # the recall back — the standard LSH-forest (planes, L) trade
        (f"{factor}x+L", big, None, 24),
    ):
        emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")
        n = emb.count()
        planes = _sized_planes(n) if planes is None else planes
        q = qset
        nq = q.count()
        store = os.path.join(
            work, f"forest_{tag}_p{planes}_t{n_tables or 12}"
        )
        t0 = time.perf_counter()
        write_forest_store(
            emb, store, n_planes=planes,
            **({"n_tables": n_tables} if n_tables else {}),
        )
        build_s = round(time.perf_counter() - t0, 3)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _noop(probe_forest_store(spark, store, q, emb, k=10))
            reps.append(time.perf_counter() - t0)
        probe_s = round(statistics.median(reps), 3)
        approx = probe_forest_store(spark, store, q, emb, k=10).select(
            "query_id", "neighbor_id"
        )
        exact = _exact_topk(spark, q, emb)
        hits = approx.join(exact, ["query_id", "neighbor_id"], "semi").count()
        total = exact.count()
        recall = round(hits / total, 3)
        legs.append((tag, n, planes, nq, build_s, probe_s, recall))
        print(
            f"  [{tag}] corpus={n} planes={planes} (occ~"
            f"{round(n / 2 ** planes, 1)}/bucket) |Q|={nq} "
            f"build={build_s}s probe={probe_s}s recall@10={recall}",
            flush=True,
        )

    print(
        "\n| leg | corpus | planes (sized) | occupancy | probe (s) | "
        "recall@10 |"
    )
    print("|---|---|---|---|---|---|")
    for tag, n, planes, nq, build_s, probe_s, recall in legs:
        print(
            f"| {tag} @ p{planes} | {n} | {planes} | "
            f"{round(n / 2 ** planes, 1)} | {probe_s} | {recall} |"
        )
    r1, rf = legs[0][5], legs[1][5]
    ratio = rf / r1 if r1 else float("nan")
    expo = math.log(ratio, factor) if r1 and ratio > 0 else float("nan")
    print(
        f"\nsized-decade probe ratio {round(ratio, 2)} "
        f"(exponent {round(expo, 2)}); recall "
        f"{legs[0][6]} (1x) -> {legs[1][6]} ({factor}x sized) -> "
        f"{legs[2][6]} ({factor}x sized + L=24)"
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
