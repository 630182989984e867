"""Semantic pins for DSIR importance resampling (queries/dataselect.py):
beyond the value-hash oracle (tests/test_oracle_harness.py covers both
gates), the METHOD must actually do its job — documents from the target
language distribution must score higher on average than the rest, and
the selection must be the weight frame's own top slice."""

from __future__ import annotations

from cargo_chat_spark.queries.dataselect import (
    TOP_K,
    dsir_logratio_weights,
    dsir_topk_selection,
)
from tests.conftest import SF_DIR_SMALL


def test_target_lang_scores_higher_on_average(spark):
    rows = dsir_logratio_weights(spark, SF_DIR_SMALL).collect()
    en = [r["weight"] for r in rows if r["lang"] == "en"]
    rest = [r["weight"] for r in rows if r["lang"] != "en"]
    assert en and rest
    # the corpus' five languages share one synthetic vocabulary, so the
    # separation is modest — but the sign must be right: fitting the
    # target model on en must score en docs higher on average
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_selection_is_the_weight_frames_top_slice(spark):
    w = {
        r["doc_id"]: r["weight"]
        for r in dsir_logratio_weights(spark, SF_DIR_SMALL).collect()
    }
    sel = dsir_topk_selection(spark, SF_DIR_SMALL).collect()
    assert len(sel) == min(TOP_K, len(w))
    # ranks are 1..k, weights descending under (weight, doc_id) order
    by_rank = sorted(sel, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, len(sel) + 1))
    keys = sorted(((-w[d], d) for d in w))[: len(sel)]
    assert {d for _, d in keys} == {r["doc_id"] for r in sel}
    for r in sel:
        assert w[r["doc_id"]] == r["weight"]
