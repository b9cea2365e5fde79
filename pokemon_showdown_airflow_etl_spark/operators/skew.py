"""Skew mitigation utilities (SURVEY.md §4 / the 100 TB checklist).

AQE's skew-join splitting handles sort-merge joins automatically; these
helpers cover the two places AQE can't: aggregations over a skewed key
(one reducer gets the hot key's entire partition) and broadcast-
ineligible joins against a skewed build side.

Salting is semantics-preserving by construction: the salted aggregate
runs the same associative partial aggregate per (key, salt) then
re-combines per key; the salted join replicates the small side once per
salt value so every (key, salt) bucket of the big side finds its match.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Uniform random salt in [0, n_salts): spreads a hot key over
    n_salts shuffle partitions. rand() is fine here — the salt never
    affects results, only placement."""
    return df.withColumn(SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))


def salted_count_by_key(df: DataFrame, key: str | Sequence[str], n_salts: int = 16) -> DataFrame:
    """Two-phase count for skewed keys: groupBy(key, salt) partial
    counts (bounded partition size) then groupBy(key) recombine (tiny).
    Same result as df.groupBy(key).count() for any input."""
    keys = [key] if isinstance(key, str) else list(key)
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias("count"))


def salted_agg_by_key(
    df: DataFrame,
    key: str | Sequence[str],
    sum_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase sum aggregation (any associative+commutative agg
    decomposes the same way)."""
    keys = [key] if isinstance(key, str) else list(key)
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(*[F.sum(c).alias(f"_p_{c}") for c in sum_cols])
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{c}").alias(f"sum_{c}") for c in sum_cols]
    )


def salted_join_small(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join when the small side is too big to broadcast:
    salt the big side, replicate the small side across all salt values
    (explode of a salt array), join on (key, salt). Each hot-key bucket
    lands on a different reducer. Result == big.join(small, on, how)
    for the join types below ONLY — right/full outer would emit each
    unmatched small-side row once per salt replica, so they are
    rejected rather than silently wrong."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join_small: how={how!r} would duplicate unmatched "
            f"small-side rows across salt replicas; use one of {sorted(allowed)}"
        )
    salted_big = with_salt(big, n_salts)
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(replicated, [on, SALT_COL], how)
    return out.drop(SALT_COL)
