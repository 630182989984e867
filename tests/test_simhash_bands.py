"""64-bit simhash band structure (VERDICT r1 item 3).

Two properties of the 4x16-bit band scheme vs the old 4x8-bit byte bands
over a 32-bit fingerprint:

1. Candidate volume shrinks (65,536 values/band vs 256 — bucket occupancy
   O(n/65536), no near-quadratic candidate blowup).
2. The band join is pigeonhole-EXACT at hamming <= 3: banded output equals
   the brute-force all-pairs answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D
from cargo_chat_spark.queries.dedup import (
    _HAMMING_T,
    _simhash64_band_rows,
    simhash_neardup_pairs,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL


def _old_byte_band_candidates(spark, sf_dir) -> int:
    """Candidate-pair count of the replaced 4x8-bit byte-band scheme."""
    d = load_table(spark, sf_dir, "documents")
    sh = D.simhash32_agg(d).withColumnRenamed("simhash", "s")
    entries = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            (F.floor(F.col("s") / F.pow(F.lit(2.0), F.lit(8 * b))).cast("bigint") % 256)
            .alias("key"),
        )
        for b in range(4)
    ])
    bands = sh.select("doc_id", F.explode(entries).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.key").alias("key")
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )


def _new_band_candidates(spark, sf_dir) -> int:
    bands = _simhash64_band_rows(spark, sf_dir)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "word")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "word")
    return (
        a.join(b, ["band", "word"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )


def test_candidate_volume_shrinks(spark):
    old = _old_byte_band_candidates(spark, SF_DIR_SMALL)
    new = _new_band_candidates(spark, SF_DIR_SMALL)
    # 500 docs: byte bands produced ~24k candidates (~19% of all pairs);
    # 16-bit bands must collapse that by orders of magnitude.
    assert new < old / 10, (new, old)
    assert new > 0  # and the gate is not vacuous


def test_band_join_exact_at_threshold(spark):
    """Pigeonhole exactness: banded pairs == brute-force pairs at T=3."""
    sh = D.simhash64_bands_agg(load_table(spark, SF_DIR_SMALL, "documents"))
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"w{i}").alias(f"a{i}") for i in range(4)],
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"w{i}").alias(f"b{i}") for i in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}"))) for i in range(4)
    )
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(hamming <= _HAMMING_T)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )
    banded = simhash_neardup_pairs(spark, SF_DIR_SMALL)
    assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, brute.collect()))
