"""Count-min sketch heavy hitters (SURVEY.md §2.11 sketch path).

a1 covers the BUILT-IN sketches (HLL++, KLL quantiles); this module is
the "novel sketch as a composition of DataFrame ops" case the engine
needs when Spark lacks the summary: a count-min sketch (Cormode &
Muthukrishnan 2005) built entirely from JVM-side expressions — no
Python, no driver-side sketch state.

The CMS is a depth x width counter matrix; cell (r, h_r(key) % width)
increments per occurrence, and est(key) = min over rows r. Counters are
ADDITIVE, so the distributed build is just an aggregation: explode each
key occurrence into its ``depth`` cell ids and count per cell —
map-side partial aggregation collapses the stream to <= depth * width
partial rows per task before the one exchange, which is exactly how a
hand-rolled mergeable sketch would shuffle. The materialized sketch is
a <= depth * width row table (constant size, broadcastable), queried by
joining candidate keys' cell ids against it and taking min(count).

est >= exact always (collisions only ADD); est <= exact + eps * N with
eps = e / width at the usual CMS confidence — the audit columns bound
both sides per reported key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..pinning import pin


def cms_cells(key: Column, depth: int, width: int) -> Column:
    """The ``depth`` cell ids of ``key``: row r hashes with xxhash64
    seeded by r (independent-enough row hashes), cell = r*width + h%width
    so one flat id addresses the whole matrix."""
    return F.array(
        *[
            F.lit(r * width) + F.pmod(F.xxhash64(key, F.lit(r)), F.lit(width))
            for r in range(depth)
        ]
    )


def cms_sketch(keys: DataFrame, key_col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Build the merged corpus-wide sketch: (cell long, cnt long),
    <= depth * width rows. One pass, one bounded-key shuffle."""
    return (
        keys.select(F.explode(cms_cells(F.col(key_col), depth, width)).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate counts for a candidate-key frame against a built sketch:
    explode each candidate into its cells, broadcast-join the constant-
    size sketch, min over rows. Adds ``est`` to ``candidates``."""
    cells = candidates.select(
        key_col, F.explode(cms_cells(F.col(key_col), depth, width)).alias("cell")
    )
    return (
        cells.join(F.broadcast(sketch), "cell")
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
        .join(candidates, key_col)
    )


def cms_heavy_hitters(
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    topk: int = 10,
    eps_mult: float = 4.0,
) -> DataFrame:
    """Heavy hitters with a per-key sketch-accuracy audit.

    ``keys`` is the pre-exploded occurrence stream (one row per key
    occurrence). The reported keys are the EXACT top-``topk`` (count
    desc, key asc) — the verification path, same role as d2's exact
    Jaccard next to d7's LSH: at 100 TB production swaps the exact
    audit for per-partition local-top-m candidate proposal (a global
    heavy hitter is a local one in some partition) and keeps only the
    sketch pass; the plan shape of the sketch build/query is identical.

    Returns (key, exact_n, rank, est_ge_exact, est_within_eps):
    est >= exact is the CMS no-underestimate law; est <= exact +
    eps_mult/width * N is the width bound (eps_mult=4 > e covers the
    standard confidence with slack so the boolean is stable).
    """
    exact = (
        keys.groupBy(key_col)
        .agg(F.count("*").cast("long").alias("exact_n"))
        .transform(pin)
    )
    total = exact.agg(F.sum("exact_n").alias("n_total"))
    top = exact.orderBy(F.desc("exact_n"), F.asc(key_col)).limit(topk)
    ranked = top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("exact_n"), F.asc(key_col)))
        .cast("int"),
    )
    sketch = cms_sketch(keys, key_col, depth, width)
    est = cms_estimate(ranked, sketch, key_col, depth, width)
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "exact_n",
            "rank",
            (F.col("est") >= F.col("exact_n")).alias("est_ge_exact"),
            (
                F.col("est")
                <= F.col("exact_n")
                + F.lit(eps_mult / width) * F.col("n_total")
            ).alias("est_within_eps"),
        )
        .orderBy("rank")
    )
