"""Query catalog plumbing.

A Query pairs a PySpark plan (callable (spark, sf_dir) -> DataFrame) with
the equivalent DuckDB SQL oracle. The driver hashes results column-name-
sorted and order-insensitively, so: every computed column is aliased
identically on both sides, every unstable float is rounded identically on
both sides, and aggregates carry explicit casts so dtypes agree.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..io import table


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)
