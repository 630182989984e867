"""Gate-window tripwires: the driver's correctness gate reads the FIRST 50
`queries()` entries. These pins catch the two silent failure modes of the
rotation machinery in `queries/catalog.py`:

- a new query registered without a tail decision displaces entry #50 out
  of the gated window (round 4 nearly shipped this with events_asof_join);
- a typo'd name in `_OVERFLOW_TAIL` matches nothing, leaving the query
  in-window while the comment claims it was demoted.
"""

from __future__ import annotations

from cargo_chat_spark.queries import catalog

WINDOW = 50


def test_window_and_tail_partition_cleanly():
    names = list(catalog.SPARK_QUERIES)
    window = set(names[:WINDOW])
    assert len(names) >= WINDOW, "registry shrank below the gate window"
    assert not window & set(catalog._OVERFLOW_TAIL), (
        "tail entries leaked into the gated window: "
        f"{sorted(window & set(catalog._OVERFLOW_TAIL))}"
    )
    # every name past the window must be an explicit tail decision
    overflow = set(names[WINDOW:])
    undeclared = overflow - set(catalog._OVERFLOW_TAIL)
    assert not undeclared, (
        f"queries pushed out of the gate window without a tail entry: "
        f"{sorted(undeclared)} — add them to _OVERFLOW_TAIL (with a "
        "rationale) or demote something else"
    )


def test_tail_names_all_resolve():
    unknown = [n for n in catalog._OVERFLOW_TAIL if n not in catalog.SPARK_QUERIES]
    assert not unknown, f"_OVERFLOW_TAIL names match no registered query: {unknown}"


def test_tail_entries_keep_oracle_coverage():
    """Tail entries are only externally ungated — they must still be
    locally checkable: every tail entry needs oracle SQL unless it is one
    of the documented rows-only ops."""
    rows_only_ok = {
        "distinct_counts_approx",
        "ivf_topk_trained_live",
        "event_value_percentiles_approx",
        # HLL sketches are engine-specific (no DuckDB twin); error bound
        # pinned by tests/test_sketch_bounds.py
        "weekly_hll_rollup",
    }
    missing = [
        n
        for n in catalog._OVERFLOW_TAIL
        if n in catalog.SPARK_QUERIES
        and n not in catalog.ORACLE_SQL
        and n not in rows_only_ok
    ]
    assert not missing, f"tail entries without oracle SQL: {missing}"


def test_round6_promotion_plan_names_resolve():
    """The drafted rotation plan must stay executable: every planned
    promotion names a registered query, and none of them is already
    inside the gated window (promoting an in-window name is a no-op that
    wastes a slot)."""
    names = list(catalog.SPARK_QUERIES)
    window = set(names[:WINDOW])
    unknown = [
        n for n in catalog.ROUND6_PROMOTION_PLAN if n not in catalog.SPARK_QUERIES
    ]
    assert not unknown, f"rotation plan names unknown queries: {unknown}"
    already = [n for n in catalog.ROUND6_PROMOTION_PLAN if n in window]
    assert not already, f"rotation plan promotes in-window names: {already}"
    assert len(set(catalog.ROUND6_PROMOTION_PLAN)) == len(
        catalog.ROUND6_PROMOTION_PLAN
    ), "duplicate names in rotation plan"
