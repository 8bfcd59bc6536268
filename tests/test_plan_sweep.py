"""Global physical-plan sweep: EVERY registry gate's plan is checked
for the anti-patterns that kill a 100x scale-up, in one test.

The per-operator pins in test_plans.py assert each design's SPECIFIC
shape (broadcasts, pushdown, zero-exchange layouts); this sweep is the
backstop that no gate — present or future — ships with:

  * CartesianProduct: an unconditioned cross join of two distributed
    relations.  (Broadcast nested-loop against a bounded/1-row side is
    a different node and is allowed — that is the standard scalar-
    aggregate probe pattern, e.g. q22's average-balance crossJoin.)
  * BatchEvalPython: a row-at-a-time (pickled) Python UDF in the
    plan.  All Python execution must go through Arrow
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
    BatchEvalPythonUDTF with arrow enabled) — the 10-100x rule from
    the module docstrings.

Streaming gates are excluded: calling them drains a real stream (the
plan shapes of their stateful operators are pinned separately in
test_streaming.py / test_plans.py).  Even dd5 — the declared-role
exact O(n^2) verifier — passes this bar: its block-pair stage is a
bucketed equi-join, never a CartesianProduct node.
"""

from __future__ import annotations

import pytest

from python_sql_datawarehouse_project_spark import registry

_SKIP_PREFIXES = ("stream_",)  # drained streams execute on call


def _plan_of(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


_QUERIES = {
    k: v
    for k, v in registry.queries().items()
    if not k.startswith(_SKIP_PREFIXES)
}


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_scale_antipatterns(name, spark, sf_dir):
    p = _plan_of(_QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in p, f"{name}: non-broadcast cross join"
    # Row-at-a-time Python UDF: "BatchEvalPython" exactly (the UDTF
    # node is BatchEvalPythonUDTF — allowed, it is the lateral seam
    # and Spark has no arrow UDTF node name distinction here).
    import re

    row_udf = re.search(r"BatchEvalPython(?!UDTF)", p)
    assert not row_udf, f"{name}: row-at-a-time Python UDF in plan"
