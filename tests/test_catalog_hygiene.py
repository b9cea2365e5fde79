"""Catalog-wide plan hygiene: EVERY cataloged query (not just the
headline subset) must avoid the two unconditional scale-killers —
a non-broadcast CartesianProduct (quadratic shuffle blowup) and
BatchEvalPython (row-at-a-time Python UDF in the hot path).

BroadcastNestedLoopJoin is deliberately allowed: the brute-force
similarity baselines broadcast a small side with a non-equi condition,
which is the intended plan. Arrow-batched Python (ArrowEvalPython /
MapInPandas / FlatMapGroupsInPandas) is the sanctioned escape hatch and
is likewise allowed.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES


@pytest.mark.parametrize("name", list(ALL_QUERIES), ids=lambda n: n)
def test_no_cartesian_or_rowwise_python(spark, sf_dir, name):
    df = ALL_QUERIES[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
