"""Catalog-wide plan hygiene: EVERY cataloged query (not just the
headline subset) must avoid the two unconditional scale-killers —
a non-broadcast CartesianProduct (quadratic shuffle blowup) and
BatchEvalPython (row-at-a-time Python UDF in the hot path).

BroadcastNestedLoopJoin is deliberately allowed: the brute-force
similarity baselines broadcast a small side with a non-equi condition,
which is the intended plan. Arrow-batched Python (ArrowEvalPython /
MapInPandas / FlatMapGroupsInPandas) is the sanctioned escape hatch and
is likewise allowed.

Plans are built under ``pinning.disabled()``: the production plans pin
shared subframes with a lazy localCheckpoint, which swaps the pinned
subtree for an opaque ``Scan ExistingRDD`` in explain() — an edit
INSIDE a pinned frame (q2/q11/q15/q20, j11, g16, t8, t14, s6, the LSH
band frames, ...) would otherwise silently escape this sweep (ADVICE
r3). With pinning off the full logical tree is visible, and the
un-pinned tree is a superset of the pinned one, so the outer plan is
still covered.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pokemon_showdown_airflow_etl_spark import pinning
from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES


@pytest.mark.parametrize("name", list(ALL_QUERIES), ids=lambda n: n)
def test_no_cartesian_or_rowwise_python(spark, sf_dir, name):
    with pinning.disabled():
        df = ALL_QUERIES[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_pinning_disabled_actually_exposes_subtrees(spark, sf_dir):
    """Guard the guard: with pinning ON, a pinned plan contains an
    opaque ExistingRDD scan; with pinning OFF it must not — i.e. the
    hygiene sweep above really sees inside the frames."""
    name = "q15_top_supplier"  # pins the shared revenue aggregate
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ALL_QUERIES[name].spark(spark, sf_dir).explain("formatted")
    assert "ExistingRDD" in buf.getvalue()
    buf = io.StringIO()
    with pinning.disabled():
        with contextlib.redirect_stdout(buf):
            ALL_QUERIES[name].spark(spark, sf_dir).explain("formatted")
    assert "ExistingRDD" not in buf.getvalue()


def test_reliable_pins_flag_swaps_localcheckpoint_for_disk_persist(
    spark, sf_dir, monkeypatch
):
    """SPARK_GRAFT_RELIABLE_PINS=1 (the cluster-deploy escape hatch,
    VERDICT r7 item 10): pins become persist(DISK_ONLY) — lineage kept
    (no opaque ExistingRDD in the plan, an InMemoryRelation instead) and
    results identical to the localCheckpoint default."""
    name = "q15_top_supplier"  # pins the shared revenue aggregate
    baseline = ALL_QUERIES[name].spark(spark, sf_dir).collect()

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_PINS", "1")
    df = ALL_QUERIES[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ExistingRDD" not in plan, "reliable pin still localCheckpoints"
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan
    assert df.collect() == baseline
