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
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _carry_type(dt: T.DataType) -> T.StructType:
    """Carried values travel boxed in a 1-field struct: the struct is
    non-null for EVERY right row, so ``F.last(..., ignorenulls=True)``
    selects the latest matched ROW, and a NULL value inside that row is
    preserved — matching pandas.merge_asof / DuckDB ASOF, which return
    the matched row's NULL rather than skipping back to an older
    non-null value."""
    return T.StructType([T.StructField("v", dt)])


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
    when that matters (the cataloged query does). A matched right row
    whose carry column is NULL yields NULL (the values ride in 1-field
    structs so the window picks the latest matched row, not the latest
    non-null value — pandas.merge_asof / DuckDB ASOF semantics).

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
        *[F.struct(F.col(src).alias("v")).alias(f"_carry_{dst}")
          for src, dst in carry.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, left_time)],
    )
    l = left.select(
        F.col(on),
        F.col(left_time),
        F.lit(l_side).alias("_side"),
        *[F.lit(None).cast(_carry_type(right.schema[src].dataType))
          .alias(f"_carry_{dst}") for src, dst in carry.items()],
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
        *left_cols, *[F.col(dst).getField("v").alias(dst) for dst in carry.values()]
    )


def asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    on: str,
    slice_seconds: int,
    left_time: str = "ts",
    right_time: str = "ts",
    carry: dict[str, str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """``asof_join`` with bounded partition work for monster keys.

    The plain merge-asof sorts each key's ENTIRE history inside one
    task; a key with 10^8 rows breaks that. Here time quantizes into
    ``slice_seconds`` slices and the join decomposes into:

    1. within-slice carry — the same union+window trick, but the window
       partitions by (key, slice), so a task sorts one slice's rows;
    2. per-(key, slice) "last right row" — a map-side-combinable
       aggregate, one small row per non-empty slice;
    3. slice-level as-of — the plain ``asof_join`` over the two SMALL
       frames (distinct left slices vs per-slice lasts, slice index as
       the time axis, strict so only EARLIER slices feed in): per-key
       volume is the slice count, not the row count;
    4. coalesce — a left row uses its within-slice carry, else the
       carry-in of its slice.

    Correctness: a right row in an earlier slice is strictly earlier in
    time than every row of this slice, so the strict slice-level as-of
    supplies exactly "latest right value before this slice starts";
    within-slice ordering (including same-timestamp ties and the
    ``strict`` flag) is identical to ``asof_join``. Same precondition:
    dedupe the right side to one row per (key, time) first. NULL carry
    values in the matched row are preserved like the plain form: both
    the within-slice carry and the slice-level carry-in move boxed
    structs, and the coalesce picks between STRUCTS (matched-row
    presence), so a NULL value in this slice's latest right row does
    not fall back to the previous slice's value.

    Shuffles: both inputs once on (key, slice); the slice-level frames
    once on key. Each partition's sort is bounded by slice density —
    pick ``slice_seconds`` so one slice of the hottest key fits a task.
    Measured overhead vs the plain operator at sf0.1 (20k purchases /
    30k clicks, local[32]): ~1.6x wall — the constant premium paid for
    partition bounds; use the plain form until a key outgrows a task.
    """
    carry = dict(carry or {})
    left_cols = left.columns
    r_side, l_side = (1, 0) if strict else (0, 1)
    lslice = F.floor(F.unix_timestamp(F.col(left_time)) / slice_seconds)
    rslice = F.floor(F.unix_timestamp(F.col(right_time)) / slice_seconds)

    r = right.select(
        F.col(on),
        F.col(right_time).alias(left_time),
        rslice.alias("_slice"),
        F.lit(r_side).alias("_side"),
        *[F.struct(F.col(src).alias("v")).alias(f"_carry_{dst}")
          for src, dst in carry.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, left_time)],
    )
    l = left.select(
        F.col(on),
        F.col(left_time),
        lslice.alias("_slice"),
        F.lit(l_side).alias("_side"),
        *[F.lit(None).cast(_carry_type(right.schema[src].dataType))
          .alias(f"_carry_{dst}") for src, dst in carry.items()],
        *[F.col(c) for c in left_cols if c not in (on, left_time)],
    )
    w_in = (
        Window.partitionBy(on, "_slice")
        .orderBy(left_time, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = l.unionByName(r)
    for dst in carry.values():
        within = within.withColumn(
            f"_w_{dst}", F.last(f"_carry_{dst}", ignorenulls=True).over(w_in)
        )
    within = within.filter(F.col("_side") == l_side)

    # per-(key, slice) last right row — right side only, pre-deduped per
    # (key, time) so max_by is deterministic. The value is boxed so a
    # NULL in the slice's last row survives as struct(NULL), not a
    # missing aggregate.
    lasts = right.groupBy(F.col(on), rslice.alias("_slice")).agg(
        *[
            F.max_by(F.struct(F.col(src).alias("v")), F.col(right_time))
            .alias(f"_last_{dst}")
            for src, dst in carry.items()
        ]
    )
    left_slices = left.select(F.col(on), lslice.alias("_slice")).distinct()
    carry_in = asof_join(
        left_slices,
        lasts,
        on=on,
        left_time="_slice",
        right_time="_slice",
        carry={f"_last_{dst}": f"_in_{dst}" for dst in carry.values()},
        strict=True,  # only strictly-earlier slices may feed in
    )
    out = within.join(carry_in, [on, "_slice"], "left")
    # coalesce between the boxed structs — "was there a matched row" —
    # then unbox, so a matched-but-NULL within-slice value wins over an
    # earlier slice's non-null carry-in.
    return out.select(
        *left_cols,
        *[
            F.coalesce(F.col(f"_w_{dst}"), F.col(f"_in_{dst}"))
            .getField("v").alias(dst)
            for dst in carry.values()
        ],
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
