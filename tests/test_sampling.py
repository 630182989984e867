"""Training-data curation operators (stratified sampling, source mixing,
sequence packing) — full Spark-vs-DuckDB oracle equivalence at sf0.001
(these entries live in the catalog overflow tail, so THIS is their
correctness gate), plus semantic property checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from cargo_chat_spark.queries.registry import ORACLE_SQL, SPARK_QUERIES
from cargo_chat_spark.queries import dedup  # noqa: F401 (leakage_safe_split)
from cargo_chat_spark.queries import sampling
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR_SMALL}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


def _both(spark, name: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    got = SPARK_QUERIES[name](spark, SF_DIR_SMALL).toPandas()
    want = _oracle(name)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].round(6).sort_values(cols).reset_index(drop=True)
    want = want[cols].round(6).sort_values(cols).reset_index(drop=True)
    return got, want.astype(got.dtypes.to_dict())


@pytest.mark.parametrize(
    "name",
    [
        "stratified_sample",
        "source_mix",
        "pack_sequences",
        "dataset_split",
        "per_source_sample",
    ],
)
def test_oracle_equivalence(spark, name):
    got, want = _both(spark, name)
    pd.testing.assert_frame_equal(got, want)


def test_per_source_sample_is_fixed_size(spark):
    got = SPARK_QUERIES["per_source_sample"](spark, SF_DIR_SMALL).toPandas()
    sizes = got.groupby("source").size()
    assert (sizes <= sampling._PER_SOURCE_N).all()
    # every source present in the corpus is represented
    docs = SPARK_QUERIES["dataset_split"](spark, SF_DIR_SMALL).toPandas()
    assert set(sizes.index) == set(docs["source"].unique())


def test_dataset_split_properties(spark):
    """Disjoint+complete by construction; ratios near 98/1/1; and
    assignment is a pure key function — a doc keeps its split when the
    corpus around it changes (the anti-leak property)."""
    full = SPARK_QUERIES["dataset_split"](spark, SF_DIR_SMALL).toPandas()
    assert len(full) == full["doc_id"].nunique()  # one split per doc
    frac = full["split"].value_counts(normalize=True)
    assert 0.93 <= frac.get("train", 0) <= 1.0
    assert frac.get("val", 0) <= 0.05 and frac.get("test", 0) <= 0.05
    # purity: recompute on a half-corpus view — overlapping docs keep labels
    import duckdb

    con = duckdb.connect()
    half = con.execute(
        "SELECT doc_id, CASE WHEN (('0x' || substring(md5(CAST(doc_id AS "
        "VARCHAR)), 1, 8))::BIGINT % 10000) < 9800 THEN 'train' WHEN "
        "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT "
        "% 10000) < 9900 THEN 'val' ELSE 'test' END AS split FROM "
        f"read_parquet('{SF_DIR_SMALL}/documents.parquet') WHERE doc_id % 2 = 0"
    ).df()
    merged = half.merge(full, on="doc_id", suffixes=("_half", "_full"))
    assert (merged["split_half"] == merged["split_full"]).all()


def test_stratified_rates_hold(spark):
    got = SPARK_QUERIES["stratified_sample"](spark, SF_DIR_SMALL).toPandas()
    for _, r in got.iterrows():
        rate = sampling._STRATA_RATES.get(r["lang"], sampling._DEFAULT_RATE)
        # deterministic hash draw ≈ uniform: observed rate within ±15% abs
        assert abs(r["n_kept"] / r["n_total"] - rate) < 0.15, r.to_dict()
    # determinism: same result on re-run (hash of key, not rand())
    again = SPARK_QUERIES["stratified_sample"](spark, SF_DIR_SMALL).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("lang").reset_index(drop=True),
        again.sort_values("lang").reset_index(drop=True),
    )


def test_source_mix_proportions(spark):
    got = SPARK_QUERIES["source_mix"](spark, SF_DIR_SMALL).toPandas()
    kept = {r["source"]: r["n_kept"] for _, r in got.iterrows()}
    weights = sampling._MIX_WEIGHTS
    # the weighted sources must actually exist in the corpus — weights
    # naming absent sources silently turn the op into a no-op (caught
    # round 2: web/code/wiki vs the corpus's src0..src19)
    assert all(s in kept for s in weights), (sorted(weights), sorted(kept)[:5])
    total = sum(kept[s] for s in weights)
    assert total > 0
    for s, w in weights.items():
        assert abs(kept[s] / total - w) < 0.1, (s, kept, w)
    # the bottleneck source keeps ~everything (rate 1.0)
    assert abs(got["keep_rate"].max() - 1.0) < 1e-6
    # non-weighted sources are dropped entirely
    others = got[~got["source"].isin(weights)]
    assert (others["n_kept"] == 0).all() and (others["keep_rate"] == 0).all()


def test_pack_budget_respected(spark):
    got = SPARK_QUERIES["pack_sequences"](spark, SF_DIR_SMALL).toPandas()
    assert len(got) > 0
    # each pack's total stays under budget + one overflow doc (greedy
    # first-fit semantics: the doc that crosses the boundary starts the
    # next bin, so a bin exceeds budget only via its own last doc)
    docs_tokens = duckdb.sql(
        "SELECT max(len(regexp_split_to_array(trim(text), '\\s+'))) AS m "
        f"FROM read_parquet('{SF_DIR_SMALL}/documents.parquet')"
    ).df()["m"][0]
    assert (got["total_tokens"] <= sampling._PACK_BUDGET + docs_tokens).all()
    # packs within a shard cover contiguous id ranges (first-fit in order)
    assert (got["first_doc"] <= got["last_doc"]).all()


def test_leakage_safe_split_groups_never_straddle(spark):
    """The property the operator exists for: every near-dup component is
    entirely inside ONE split (a per-doc draw provably violates this on
    the same fixture), singletons keep dataset_split-compatible draws,
    and ratios stay near 98/1/1."""
    ls = SPARK_QUERIES["leakage_safe_split"](spark, SF_DIR_SMALL).toPandas()
    assert len(ls) == ls["doc_id"].nunique()

    per_group = ls.groupby("group_id")["split"].nunique()
    assert (per_group == 1).all()

    clusters = ls[ls["group_id"] != ls["doc_id"]]
    assert len(clusters) > 0, "fixture must contain near-dup clusters"

    # every cluster member inherits exactly the REPRESENTATIVE's label:
    # the split of group_id g equals the split a singleton with doc_id g
    # would get from dataset_split (same draw primitive on the same key)
    pd_split = SPARK_QUERIES["dataset_split"](spark, SF_DIR_SMALL).toPandas()
    rep = pd_split.rename(
        columns={"doc_id": "group_id", "split": "split_rep"}
    )[["group_id", "split_rep"]]
    merged = clusters.merge(rep, on="group_id")
    assert len(merged) == len(clusters)
    assert (merged["split"] == merged["split_rep"]).all()

    frac = ls["split"].value_counts(normalize=True)
    assert 0.93 <= frac.get("train", 0) <= 1.0
    assert frac.get("val", 0) <= 0.05 and frac.get("test", 0) <= 0.05


def test_kfold_groups_never_straddle_and_uniform(spark):
    """k-fold sibling of the straddle property: every near-dup component
    sits entirely in ONE fold, folds cover 0..K-1, and the fold equals
    the draw of the group key mod K (so assignment is reproducible from
    the key alone — no stored placement)."""
    from cargo_chat_spark.queries import _draws as dr
    from cargo_chat_spark.queries.dedup import _KFOLD_K

    kf = SPARK_QUERIES["kfold_group_assign"](spark, SF_DIR_SMALL).toPandas()
    assert len(kf) == kf["doc_id"].nunique()

    per_group = kf.groupby("group_id")["fold"].nunique()
    assert (per_group == 1).all()

    clusters = kf[kf["group_id"] != kf["doc_id"]]
    assert len(clusters) > 0, "fixture must contain near-dup clusters"

    assert set(kf["fold"].unique()) <= set(range(_KFOLD_K))
    assert kf["fold"].nunique() == _KFOLD_K, "a fold came out empty"
    # uniformity is exact in distribution (DRAW_MOD % K == 0): no fold
    # should be wildly off 1/K on ~500 groups
    frac = kf["fold"].value_counts(normalize=True)
    assert frac.max() < 2.5 / _KFOLD_K and frac.min() > 0.25 / _KFOLD_K

    # reproducible-from-key: fold == md5-draw(group_id) % K
    import hashlib

    def draw(g: int) -> int:
        return int(hashlib.md5(str(g).encode()).hexdigest()[:8], 16) % dr.DRAW_MOD

    sample = kf.sample(n=min(100, len(kf)), random_state=0)
    for _, row in sample.iterrows():
        assert row["fold"] == draw(int(row["group_id"])) % _KFOLD_K


def test_token_budget_mix_is_append_stable_and_cuts(spark):
    """The mixture must be reproducible across corpus versions: adding
    new (higher-id) docs can never evict an already-kept doc, because
    the running prefix below any kept id is unchanged. And the budget
    must actually CUT (a budget above every source's total would make
    the gate vacuous)."""
    from cargo_chat_spark.queries.sampling import _MIX_BUDGET, token_budget_mix

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    totals = {
        r["source"]: r["t"]
        for r in docs.select("source", n_tokens.alias("n"))
        .groupBy("source").agg(F.sum("n").alias("t")).collect()
    }
    assert all(t > _MIX_BUDGET for t in totals.values()), (
        "budget must cut every source for the gate to discriminate"
    )

    full = {
        r["source"]: (r["n_docs_kept"], r["tokens_kept"], r["last_doc"])
        for r in token_budget_mix(spark, SF_DIR_SMALL).collect()
    }
    # tokens_kept crosses the budget by at most the crossing doc
    for src, (n, tok, last) in full.items():
        assert tok >= _MIX_BUDGET or totals[src] < _MIX_BUDGET
    # append-stability: re-run over a PREFIX corpus (drop the top third
    # of doc_ids) — every source's kept set below the cut is unchanged,
    # so sources whose budget filled inside the prefix report identical
    # rows
    cut = docs.approxQuantile("doc_id", [0.66], 0.0)[0]
    prefix_rows = (
        docs.where(F.col("doc_id") <= cut)
        .select("doc_id", "source", n_tokens.alias("n_tokens"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = (
        prefix_rows.withColumn(
            "before_total", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
        .where(F.col("before_total") < _MIX_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_tokens").cast("bigint").alias("tok"),
            F.max("doc_id").cast("bigint").alias("last"),
        )
    )
    for r in pref.collect():
        src = r["source"]
        if r["tok"] >= _MIX_BUDGET:  # budget filled inside the prefix
            assert full[src] == (r["n"], r["tok"], r["last"])
