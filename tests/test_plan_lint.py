"""Registry-wide physical-plan lint: every registered query's plan is
scanned for the two anti-patterns that silently kill 100 TB scale:

- ``CartesianProduct`` — a NON-broadcast cross join (all-pairs shuffle).
  ``BroadcastNestedLoopJoin`` (tiny side broadcast, e.g. scalar
  thresholds or the kNN query side) is fine and NOT flagged.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan.
  ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas`` etc.
  (Arrow-batched) are the sanctioned Python stages.

This is the executable form of the repo's own rule book (SCALE.md
"Global posture"): a future query that sneaks in an interpreted UDF or an
unbroadcast cross join fails here, not in the round bench.
"""

from __future__ import annotations

import pytest

from cargo_chat_spark.queries import catalog
from tests.conftest import SF_DIR_SMALL


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", sorted(catalog.SPARK_QUERIES))
def test_no_cartesian_or_interpreted_python(name, spark):
    df = catalog.SPARK_QUERIES[name](spark, SF_DIR_SMALL)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan, (
        f"{name}: non-broadcast cross join in physical plan"
    )
    # \b excludes BatchEvalPythonUDTF — Spark 4 UDTFs evaluate in batches
    # despite the node-name prefix; the row-at-a-time scalar-UDF node is
    # exactly "BatchEvalPython"
    import re

    assert not re.search(r"\bBatchEvalPython\b", plan), (
        f"{name}: row-at-a-time Python UDF in physical plan"
    )
