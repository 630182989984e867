"""Decontamination + PII scan — full Spark-vs-DuckDB oracle equivalence at
sf0.001 (overflow-tail entries: THIS is their correctness gate), plus
semantic property checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cargo_chat_spark.queries import catalog  # noqa: F401  (fills registry)
from cargo_chat_spark.queries import curation
from cargo_chat_spark.queries.registry import ORACLE_SQL, SPARK_QUERIES
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


@pytest.mark.parametrize("name", ["contamination_13gram", "pii_scan"])
def test_oracle_equivalence(spark, name):
    got, want = _both(spark, name)
    pd.testing.assert_frame_equal(got, want)


def test_contamination_flags_real_overlaps(spark):
    got = SPARK_QUERIES["contamination_13gram"](spark, SF_DIR_SMALL).toPandas()
    # the gate must discriminate: some (not all) docs are contaminated
    assert 0 < len(got) < 400, len(got)
    # no eval doc may appear as a flagged corpus doc
    assert (got["doc_id"] % curation._EVAL_MOD != 0).all()
    assert (got["n_hit_grams"] >= 1).all() and (got["n_eval_docs"] >= 1).all()


def test_pii_counts_match_injection(spark):
    got = SPARK_QUERIES["pii_scan"](spark, SF_DIR_SMALL).toPandas()
    assert len(got) == 500
    by_id = got.set_index("doc_id")
    for doc_id, row in by_id.iterrows():
        assert row["n_emails"] == (1 if doc_id % 7 == 3 else 0), doc_id
        assert row["n_ips"] == (1 if doc_id % 11 == 5 else 0), doc_id
        assert row["n_phones"] == (1 if doc_id % 13 == 7 else 0), doc_id
    # redaction changes the text exactly when something was found
    injected = got[(got.n_emails + got.n_ips + got.n_phones) > 0]
    assert len(injected) > 0
    # hashes are 32-char hex (stable, hashable gate output)
    assert got["redacted_hash"].str.fullmatch("[0-9a-f]{32}").all()


def test_media_featurize_oracle(spark):
    """The multimodal mapInPandas path vs its DuckDB byte-statistics twin
    (ASCII corpus: payload byte i == codepoint of char i+1)."""
    got, want = _both(spark, "media_featurize")
    pd.testing.assert_frame_equal(got, want)
    assert got["decode_ok"].all()
    assert set(got["bucket"]) == set(range(8))


def test_quality_filter_oracle(spark):
    got, want = _both(spark, "quality_filter")
    pd.testing.assert_frame_equal(got, want)
    # discriminates: both kept and dropped docs exist, with named reasons
    assert got["keep"].any() and (~got["keep"]).any()
    dropped = got[~got["keep"]]
    assert (dropped["reasons"].str.len() > 0).all()
    assert (got[got["keep"]]["reasons"] == "").all()


def test_neardup_components_oracle(spark):
    """Iterative min-label propagation (Spark) vs recursive-CTE
    reachability closure (DuckDB) — different algorithms, same canonical
    (doc_id, min-reachable-id) answer."""
    got, want = _both(spark, "neardup_components")
    pd.testing.assert_frame_equal(got, want)
    # component ids are members of their own component (canonical rep)
    reps = set(got["component_id"])
    assert reps <= set(got["doc_id"])
    # at least one non-trivial cluster (doc_id != component_id)
    assert (got["doc_id"] != got["component_id"]).any()


def test_neardup_dedup_keep_oracle(spark):
    got, want = _both(spark, "neardup_dedup_keep")
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 500  # full corpus, not just paired docs
    # exactly one kept doc per multi-doc cluster; singletons all kept
    multi = got[got["cluster_size"] > 1]
    assert len(multi) > 0
    assert multi["kept"].sum() < len(multi)
    assert got[got["cluster_size"] == 1]["kept"].all()


def test_html_extract_recovers_visible_text_exactly(spark):
    """The strip chain must recover precisely the wrapper's visible
    text: title + heading + body + the decoded entity sampler — nothing
    of the markup, nothing lost."""
    from cargo_chat_spark.queries.curation import html_text_extract

    got = (
        html_text_extract(spark, SF_DIR_SMALL)
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    docs = {
        r["doc_id"]: r
        for r in (
            spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
            .orderBy("doc_id").limit(5)
            .collect()
        )
    }
    for r in got:
        d = docs[r["doc_id"]]
        visible = " ".join(
            (d["lang"] + " " + d["source"] + " " + d["text"]).split()
        ) + " &x <y> \"z\" 'w' !"
        assert r["clean_prefix"] == visible[:64]
        assert r["clean_len"] == len(visible)
        assert 0.0 < r["text_ratio"] < 1.0
