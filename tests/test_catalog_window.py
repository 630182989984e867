"""Gate-window tripwires: the driver's correctness gate reads the FIRST 50
`queries()` entries. Since round 6 the window is the EXPLICIT
`catalog.GATE_WINDOW` list, so the failure modes shift from silent
displacement to list drift — these pins catch:

- GATE_WINDOW not actually occupying positions 0-49 of queries();
- a typo'd name in GATE_WINDOW / _OVERFLOW_TAIL / PROMOTION_PLAN
  matching nothing;
- a window entry losing its value-hash oracle (every gated row must be a
  STRONG check — rows-only entries stay outside the window);
- an out-of-window entry without local oracle coverage.
"""

from __future__ import annotations

from cargo_chat_spark.queries import catalog

WINDOW = 50

# EMPTY since round 10 (r9 verdict item 4): the four approximate gates
# (distinct_counts_approx, event_value_percentiles_approx,
# weekly_hll_rollup, ivf_topk_trained_live) now value-hash their
# deterministic error/recall-bound booleans instead of engine-specific
# sketch estimates — 228/228 registry entries carry value-hash oracles.
ROWS_ONLY_OK: set[str] = set()


def test_gate_window_is_the_first_fifty():
    names = list(catalog.SPARK_QUERIES)
    assert len(names) >= WINDOW, "registry shrank below the gate window"
    assert names[:WINDOW] == catalog.GATE_WINDOW, (
        "queries() iteration order no longer leads with GATE_WINDOW — "
        "the driver would gate the wrong entries"
    )


def test_gate_window_exactly_fifty_unique_resolving_names():
    assert len(catalog.GATE_WINDOW) == WINDOW
    assert len(set(catalog.GATE_WINDOW)) == WINDOW, "duplicates in GATE_WINDOW"
    unknown = [n for n in catalog.GATE_WINDOW if n not in catalog.SPARK_QUERIES]
    assert not unknown, f"GATE_WINDOW names match no registered query: {unknown}"


def test_gate_window_entries_all_have_value_hash_oracles():
    weak = [n for n in catalog.GATE_WINDOW if n not in catalog.ORACLE_SQL]
    assert not weak, (
        f"in-window entries without oracle SQL (would gate rows-only): {weak}"
    )


def test_tail_names_all_resolve():
    unknown = [n for n in catalog._OVERFLOW_TAIL if n not in catalog.SPARK_QUERIES]
    assert not unknown, f"_OVERFLOW_TAIL names match no registered query: {unknown}"


def test_out_of_window_entries_keep_local_oracle_coverage():
    """Ungated entries must still be locally checkable: every registered
    query outside the window needs oracle SQL unless it is a documented
    rows-only op."""
    window = set(catalog.GATE_WINDOW)
    missing = [
        n
        for n in catalog.SPARK_QUERIES
        if n not in window
        and n not in catalog.ORACLE_SQL
        and n not in ROWS_ONLY_OK
    ]
    assert not missing, f"out-of-window entries without oracle SQL: {missing}"


def test_promotion_plan_names_resolve():
    """The rotation queue must stay executable: every planned promotion
    names a registered query, and none of them is already inside the
    gated window (promoting an in-window name is a no-op that wastes a
    slot). The queue is legitimately empty after the r10 rotation burned
    the full r9 queue — the checks then hold vacuously."""
    window = set(catalog.GATE_WINDOW)
    unknown = [
        n for n in catalog.PROMOTION_PLAN if n not in catalog.SPARK_QUERIES
    ]
    assert not unknown, f"rotation plan names unknown queries: {unknown}"
    already = [n for n in catalog.PROMOTION_PLAN if n in window]
    assert not already, f"rotation plan promotes in-window names: {already}"
    assert len(set(catalog.PROMOTION_PLAN)) == len(
        catalog.PROMOTION_PLAN
    ), "duplicate names in rotation plan"


def test_every_never_gated_entry_is_window_or_planned():
    """No registry entry may fall through the rotation: anything outside
    the window must either already carry an external row (r1-r5), sit in
    the round-9 queue, or be a documented tail duplicate."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gated: set[str] = set()
    for fn in sorted(os.listdir(here)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            try:
                with open(os.path.join(here, fn)) as f:
                    gated |= set(json.load(f).keys())
            except (OSError, ValueError):
                continue
    accounted = (
        set(catalog.GATE_WINDOW)
        | set(catalog.PROMOTION_PLAN)
        | set(catalog._OVERFLOW_TAIL)
        | gated
    )
    orphans = [n for n in catalog.SPARK_QUERIES if n not in accounted]
    assert not orphans, (
        f"registry entries with no external row, no window slot, no "
        f"rotation-plan slot, and no tail rationale: {orphans}"
    )


def test_phase_builders_name_registered_queries():
    """Every bench phase builder must back a registered gate (a typo'd
    name would silently lose its phase split), and phased entries keep
    their value-hash oracles — the probe-only timing semantics only
    make sense for gated queries."""
    from cargo_chat_spark.queries.registry import PHASE_BUILDERS

    unknown = [n for n in PHASE_BUILDERS if n not in catalog.SPARK_QUERIES]
    assert not unknown, f"phase builders for unregistered queries: {unknown}"
    no_oracle = [n for n in PHASE_BUILDERS if n not in catalog.ORACLE_SQL]
    assert not no_oracle, f"phased entries without oracles: {no_oracle}"
    assert all(callable(f) for f in PHASE_BUILDERS.values())
