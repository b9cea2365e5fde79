"""Local mirror of the driver's correctness gate: every cataloged query
runs in Spark AND in DuckDB; results must match on row count, column
names, and (order-insensitively) values — the same contract the driver
checks at sf0.01.
"""

from __future__ import annotations

import math

import pytest

from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES

ORACLE_QUERIES = [q for q in ALL_QUERIES.values() if q.oracle is not None]
ROWS_ONLY_QUERIES = [q for q in ALL_QUERIES.values() if q.oracle is None]


def _normalize(value):
    import datetime
    from decimal import Decimal

    if isinstance(value, Decimal):
        value = float(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # exact bit-level comparison (repr round-trips doubles); only
        # -0.0/0.0 are collapsed. A lossy format here (e.g. %.9g) once
        # masked a real cross-engine round-half divergence — the driver
        # may hash raw values, so the local gate must be at least as
        # strict.
        return repr(value + 0.0)
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat()
    return value


def _rows_to_set(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_normalize(row[i]) for i in order))
    # key=repr: the order-insensitive compare only needs SOME total
    # order applied identically to both sides; natural tuple comparison
    # raises when a nullable column (None vs int) leads the sorted
    # column order — s11's first_corpus_dup was the first to hit it
    # (d9 dodged it only because its id column sorts first)
    return sorted(out, key=repr)


def _assert_canonicalizer_safe(name, schema):
    """The driver's canonicalizer sorts cell values and cannot hash
    list/map-typed cells (s14/t23 sat at `err` in CORRECTNESS_r08 with
    `TypeError: unhashable type: 'list'`). Catalog entries must
    serialize complex columns (the g5 array_join pattern) — operators
    may still return real arrays; only the cataloged projection is
    constrained."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for field in schema.fields:
        assert not isinstance(field.dataType, (ArrayType, MapType, StructType)), (
            f"{name}: output column {field.name!r} is {field.dataType} — "
            "driver canonicalizer cannot hash complex cells; serialize "
            "with array_join (g5 pattern) or explode to scalar rows"
        )


@pytest.mark.parametrize("query", ORACLE_QUERIES, ids=lambda q: q.name)
def test_matches_oracle(query, spark, duck, sf_dir):
    sdf = query.spark(spark, sf_dir)
    _assert_canonicalizer_safe(query.name, sdf.schema)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # vacuity gate, folded into the parity pass (r13: the separate
    # test re-EXECUTED all 183 queries just to ask limit(1).count(),
    # doubling the sweep's wall time — the rows are already in hand
    # here): an empty result hash-matches an empty oracle even when
    # the operator is broken, so every oracle-checked query must
    # return at least one row at test scale (a census once found two
    # vacuous checks).
    assert len(spark_rows) > 0, (
        f"{query.name} returns no rows — the parity check is vacuous"
    )

    rel = duck.sql(query.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{query.name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{query.name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = _rows_to_set(spark_cols, spark_rows)
    d = _rows_to_set(duck_cols, duck_rows)
    if s != d:
        only_s = [r for r in s if r not in d][:5]
        only_d = [r for r in d if r not in s][:5]
        raise AssertionError(
            f"{query.name}: value mismatch\n spark-only: {only_s}\n duck-only: {only_d}"
        )


@pytest.mark.parametrize("query", ROWS_ONLY_QUERIES, ids=lambda q: q.name)
def test_rows_only_runs(query, spark, sf_dir):
    df = query.spark(spark, sf_dir)
    _assert_canonicalizer_safe(query.name, df.schema)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


# The standalone vacuity test (test_result_is_not_vacuous) was folded
# into test_matches_oracle above in r13: it re-executed every cataloged
# query a second time only to count one row, and the full suite had
# outgrown the driver's pytest budget (VERIFY_r12 tests_ok=false with
# the run truncated at ~92% and zero failures). Coverage is identical —
# the same per-entry "returns at least one row" assertion now runs on
# the rows the parity pass already collected.
