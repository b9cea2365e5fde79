"""Temporal join operators Spark's DataFrame API lacks as primitives:
as-of (merge-asof) join and fixed-band range join.

The reference never joins on time (its SQLite layer is id-keyed
lookups), but an event-time analytics layer needs both shapes
constantly — "attach the latest prior state to each event" and
"aggregate everything within a window after each anchor". Naive
formulations are a correlated subquery per row or an inequality
nested-loop join; both collapse at scale. These implementations use
only equi-shuffles:

- ``asof_join``: the merge-asof trick — union both sides, one window
  per key carries the right payload forward, keep left rows. ONE hash
  exchange of each side on the key, no range explosion, no nested
  loop. This is how pandas.merge_asof generalizes to a cluster.
- ``range_join_bucketed``: quantize time into band-width buckets,
  explode the probe side into the two candidate buckets, equi-join on
  (key, bucket), then apply the exact band predicate as a residual
  filter. Shuffle keys are (key, bucket), so co-partitioning holds and
  pair fan-out is bounded by band width x per-key density.

Cross-engine note: DuckDB's native ASOF JOIN / inequality join are the
oracles for both (plans/joins.py j10/j11), so the operators are
value-checked, not just shape-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    carry: dict[str, str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: every left row picks up the carried columns
    of the latest right row with ``right_time <= left_time`` (strictly
    ``<`` when ``strict``) for the same ``on`` key; left rows with no
    prior right row keep NULLs (left-join semantics).

    ``carry`` maps right column -> output name. If several right rows
    share (key, time), the carried value is whichever sorts last within
    the tie — pre-aggregate the right side to one row per (key, time)
    when that matters (the cataloged query does).

    Plan shape: union -> one Window per key ordered by (time, side) ->
    filter. Each input shuffles ONCE on the key; within a partition the
    window sort does the merge. Left and right never meet in a join
    operator, so there is no range-condition nested loop to degenerate
    into. Skew bound: one key's rows must fit a task's sort spill,
    which holds wherever a per-key window holds.
    """
    carry = dict(carry or {})
    left_cols = left.columns
    # side 0 sorts before side 1 at equal times -> right row at the same
    # timestamp is visible to the left row (at-or-before). strict flips
    # the tags so the left row sorts first and never sees it.
    r_side, l_side = (1, 0) if strict else (0, 1)
    r = right.select(
        F.col(on),
        F.col(right_time).alias(left_time),
        F.lit(r_side).alias("_side"),
        *[F.col(src).alias(f"_carry_{dst}") for src, dst in carry.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, left_time)],
    )
    l = left.select(
        F.col(on),
        F.col(left_time),
        F.lit(l_side).alias("_side"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"_carry_{dst}")
          for src, dst in carry.items()],
        *[F.col(c) for c in left_cols if c not in (on, left_time)],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(left_time, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r)
    for dst in carry.values():
        carried = carried.withColumn(
            dst, F.last(f"_carry_{dst}", ignorenulls=True).over(w)
        )
    is_left = F.col("_side") == l_side
    return carried.filter(is_left).select(
        *left_cols, *[F.col(dst) for dst in carry.values()]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    band_seconds: int,
    left_time: str = "ts",
    right_time: str = "ts",
    carry: dict[str, str] | None = None,
) -> DataFrame:
    """Band range join: pairs (l, r) with the same ``on`` key and
    ``l.left_time <= r.right_time < l.left_time + band_seconds``,
    returned as left columns + carried right columns (inner semantics —
    aggregate and left-join back for zero-match anchors).

    The inequality is turned into an equi-join: both sides bucket time
    by the band width, a right row in bucket b can only match left rows
    in buckets b-1 and b, so the right side explodes into those two
    candidate keys, the join runs on (key, bucket), and the exact band
    predicate filters residually. No nested-loop/cartesian fallback;
    the shuffle key is (key, bucket), so per-partition work is bounded
    by the band's event density, independent of total history length.
    """
    carry = dict(carry or {})
    left_cols = left.columns
    lb = F.floor(F.unix_timestamp(F.col(left_time)) / band_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_time)) / band_seconds)
    l = left.withColumn("_bucket", lb)
    r = right.select(
        F.col(on).alias("_r_key"),
        F.col(right_time).alias("_r_time"),
        F.explode(F.array(rb - 1, rb)).alias("_bucket"),
        *[F.col(src).alias(f"_carry_{dst}") for src, dst in carry.items()],
    )
    pairs = l.join(
        r,
        (F.col(on) == F.col("_r_key")) & (l["_bucket"] == r["_bucket"]),
    ).filter(
        (F.col("_r_time") >= F.col(left_time))
        & (
            F.col("_r_time")
            < F.col(left_time) + F.expr(f"INTERVAL {int(band_seconds)} SECONDS")
        )
    )
    return pairs.select(
        *left_cols,
        F.col("_r_time").alias("r_time"),
        *[F.col(f"_carry_{dst}").alias(dst) for dst in carry.values()],
    )
