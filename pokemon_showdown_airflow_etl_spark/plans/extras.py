"""Gap-filling queries for SURVEY.md §2 rows not covered elsewhere:
G8 retry-outcome counters, W3 sorted iteration, C9/C11 path + fallback
scalars, and the §2.11 approximate sketches (rows-only: HLL/quantile
estimates are engine-specific by design, so DuckDB hash-equality is the
wrong oracle — tests/test_extras.py bounds their error against exact
values instead)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import Query, t
from ..pinning import pin

QUERIES: list[Query] = []


def q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn

    return deco


@q(
    "g8_retry_counters",
    """
    SELECT CAST(count(*) AS BIGINT) AS total,
           CAST(sum(CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END) AS BIGINT)
               AS recovered,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
           CAST(sum(CASE WHEN event_type NOT IN ('click','view','error') THEN 1 ELSE 0 END)
                AS BIGINT) AS skipped
    FROM events
    """,
    doc="G8 retry outcome counters (tasks/retry.py:51-57,76-132): one "
    "conditional-aggregation pass classifying every attempt — "
    "total/recovered/failed/skipped, map-side partial aggregation so the "
    "shuffle carries 4 longs regardless of input size.",
)
def g8_retry_counters(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").cast("long").alias("total"),
        F.sum(F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0))
        .cast("long")
        .alias("recovered"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("failed"),
        F.sum(
            F.when(~F.col("event_type").isin("click", "view", "error"), 1).otherwise(0)
        )
        .cast("long")
        .alias("skipped"),
    )


@q(
    "w3_sorted_dates",
    """
    SELECT d AS date, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS day_rank,
           CAST(n AS BIGINT) AS n_orders
    FROM (SELECT o_orderdate AS d, count(*) AS n FROM orders GROUP BY 1)
    """,
    doc="W3 sorted iteration (fix_compacted_status.py:177 sorts dates "
    "before per-date processing): global sort made observable via "
    "row_number rank — a single-partition window only over the tiny "
    "post-aggregation date list, never over raw rows.",
)
def w3_sorted_dates(spark, sf_dir):
    per_date = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("date"))
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    w = Window.orderBy("date")
    return per_date.select(
        "date", F.row_number().over(w).cast("long").alias("day_rank"), "n_orders"
    )


@q(
    "c9_filename_to_id",
    """
    SELECT doc_id,
           regexp_extract('replays/gen9ou/2024-01-15/doc-' || CAST(doc_id AS VARCHAR)
                          || '.json', '([^/]+)\\.json$', 1) AS replay_id
    FROM documents
    """,
    doc="C9 filename->id (import_existing_replays.py:32-34): the basename-"
    "stem extraction applied to reconstructed lake paths; on a real scan "
    "the input is input_file_name() (functions/scalars.py:filename_to_id).",
)
def c9_filename_to_id(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("replays/gen9ou/2024-01-15/doc-"), F.col("doc_id").cast("string"), F.lit(".json")
    )
    return docs.select(
        "doc_id", F.regexp_extract(path, r"([^/]+)\.json$", 1).alias("replay_id")
    )


@q(
    "c11_mtime_fallback",
    """
    SELECT doc_id,
           CAST(coalesce(CASE WHEN doc_id % 5 = 0 THEN NULL ELSE doc_id * 1000 END,
                         1700000000) AS BIGINT) AS uploadtime
    FROM documents
    """,
    doc="C11 epoch-from-mtime fallback (import_existing_replays.py:54): "
    "documents missing uploadtime fall back to file modification time "
    "(here a fixed stand-in epoch) via coalesce.",
)
def c11_mtime_fallback(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    uploadtime = F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("doc_id") * 1000
    )
    return docs.select(
        "doc_id",
        F.coalesce(uploadtime, F.lit(1_700_000_000)).cast("long").alias("uploadtime"),
    )


@q(
    "a1_approx_sketches",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_3rsd,
           TRUE AS median_rank_ok,
           TRUE AS p99_rank_ok
    FROM events GROUP BY 1
    """,
    doc="§2.11 sketch path: approx_count_distinct (HLL++) and "
    "percentile_approx per event_type — the constant-memory substitutes "
    "for exact distinct/median at 100 TB. Raw sketch values differ "
    "across engines, so the DRIVER-CHECKABLE result is the error-bound "
    "CHECK, not the sketch: Spark computes approx and exact in one "
    "plan and emits per-group booleans, which the oracle reproduces as "
    "exact counts + literal TRUEs. The HLL bound is 3x the default 5% "
    "rsd: rsd is a STANDARD DEVIATION, not a guarantee — a 1-sigma "
    "bound flipped on real data (6.7% error at sf0.1, caught by the "
    "two-scale sweep) while 15% still fails on any gross breakage. "
    "Rank checks re-scan events against the 1-row-per-group broadcast "
    "stats; both aggregations are map-side partial.",
)
def a1_approx_sketches(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # the sketches and the exact distinct run as SEPARATE aggregations
    # joined on the tiny group key: a DISTINCT aggregate mixed into the
    # same agg() forces an Expand and demotes the typed-imperative
    # sketch buffers to the sort-based path (measured 6.2 s vs 2x0.2 s
    # at sf0.1 — 15x for one plan shape)
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median_value"),
        F.percentile_approx("value", 0.99).alias("approx_p99_value"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    stats = sketches.join(exact, "event_type")
    shares = (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("exact_users").alias("exact_users"),
            F.first("approx_users").alias("approx_users"),
            (
                F.sum(
                    F.when(F.col("value") <= F.col("approx_median_value"), 1).otherwise(0)
                )
                / F.count("*")
            ).alias("median_share"),
            (
                F.sum(
                    F.when(F.col("value") <= F.col("approx_p99_value"), 1).otherwise(0)
                )
                / F.count("*")
            ).alias("p99_share"),
        )
    )
    return shares.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(3), 0.15 * F.col("exact_users"))
        ).alias("hll_within_3rsd"),
        ((F.col("median_share") >= 0.45) & (F.col("median_share") <= 0.55)).alias(
            "median_rank_ok"
        ),
        ((F.col("p99_share") >= 0.97) & (F.col("p99_share") <= 1.0)).alias(
            "p99_rank_ok"
        ),
    )


@q(
    "w5_session_windows",
    """
    WITH o AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events
    ), m AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM o
    ), s AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS span_s
    FROM s GROUP BY user_id, sid
    """,
    doc="T6 session windows (absent in the reference, free in Spark): "
    "per-user sessions with a 30-minute inactivity gap via "
    "session_window(), checked against a gaps-and-islands lag/cumsum "
    "oracle. State is per-session, merged by Spark's native session "
    "operator — the streaming-safe formulation.",
)
def w5_session_windows(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("long")
            .alias("span_s"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events", "span_s"
        )
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@q(
    "g12_event_pivot",
    f"""
    SELECT CAST(ts AS DATE) AS date,
           {", ".join(f"ROUND(sum(CASE WHEN event_type = '{t}' THEN value END), 4) AS {t}"
                      for t in EVENT_TYPES)}
    FROM events GROUP BY 1
    """,
    doc="Wide lifecycle matrix via pivot(): per-date value totals, one "
    "column per event type — the stats-dashboard shape "
    "(get_stats_by_format as a matrix). Spark's pivot with an explicit "
    "value list stays a single-pass hash aggregate; never pivot on an "
    "unbounded key at scale.",
)
def g12_event_pivot(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    out = (
        ev.withColumn("date", F.col("ts").cast("date"))
        .groupBy("date")
        .pivot("event_type", list(EVENT_TYPES))
        .sum("value")
    )
    return out.select("date", *[F.round(c, 4).alias(c) for c in EVENT_TYPES])


@q(
    "g13_event_unpivot",
    f"""
    WITH wide AS (
        SELECT CAST(ts AS DATE) AS date,
               {", ".join(f"ROUND(sum(CASE WHEN event_type = '{t}' THEN value END), 4) AS {t}"
                          for t in EVENT_TYPES)}
        FROM events GROUP BY 1
    )
    SELECT date, kind, metric FROM wide
    UNPIVOT (metric FOR kind IN ({", ".join(EVENT_TYPES)}))
    """,
    doc="unpivot/melt back to long form (stack of the g12 matrix): "
    "wide metric columns become (kind, metric) rows — the normalization "
    "step before storing heterogeneous metrics in one long table. "
    "UNPIVOT drops NULL cells on both engines.",
)
def g13_event_unpivot(spark, sf_dir):
    wide = g12_event_pivot(spark, sf_dir)
    return wide.unpivot("date", list(EVENT_TYPES), "kind", "metric").filter(
        F.col("metric").isNotNull()
    )


@q(
    "g14_value_histogram",
    """
    SELECT CAST(CASE WHEN value < 0 THEN -1 ELSE floor(value / 10.0) END AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(min(value), 4) AS bin_min,
           ROUND(max(value), 4) AS bin_max
    FROM events GROUP BY 1
    """,
    doc="Histogram binning (10-unit bins, negatives to a sentinel bin): "
    "the distribution-profiling pass — one scan, map-side partial "
    "counts, tiny result regardless of input size. Binning is explicit "
    "floor division so both engines evaluate the identical float "
    "expression (Spark's width_bucket has no DuckDB twin).",
)
def g14_value_histogram(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bin_col = (
        F.when(F.col("value") < 0, F.lit(-1))
        .otherwise(F.floor(F.col("value") / 10.0))
        .cast("int")
    )
    return (
        ev.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("bin_min"),
            F.round(F.max("value"), 4).alias("bin_max"),
        )
    )


@q(
    "j9_above_customer_avg",
    """
    WITH cents AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders
    ), enriched AS (
        SELECT o_orderkey, o_custkey, price_c,
               avg(price_c) OVER (PARTITION BY o_custkey) AS avg_c
        FROM cents
    )
    SELECT o_orderkey, o_custkey,
           ROUND(price_c / 100.0, 2) AS totalprice,
           avg_c AS cust_avg_cents
    FROM enriched WHERE price_c > avg_c
    """,
    doc="Correlated-subquery shape (orders above their customer's "
    "average) decorrelated into a partitioned window average + filter — "
    "one shuffle on the correlation key instead of a re-executed "
    "subquery per row. Prices quantize to integer cents BEFORE the "
    "average so the sum is exact on both engines: a float avg's "
    "summation-order noise would flip rows sitting on the price==avg "
    "boundary.",
)
def j9_above_customer_avg(spark, sf_dir):
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    w = Window.partitionBy("o_custkey")
    enriched = cents.withColumn("avg_c", F.avg("price_c").over(w))
    return enriched.filter(F.col("price_c") > F.col("avg_c")).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("price_c") / 100.0, 2).alias("totalprice"),
        # raw cents: the integer-sum average is bit-identical on both
        # engines, while /100 + ROUND(4) lands on round-half boundaries
        # (…43875) that Spark and DuckDB resolve differently
        F.col("avg_c").alias("cust_avg_cents"),
    )


@q(
    "g15_retention_cohorts",
    """
    WITH firstday AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1
    ), active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_date,
           CAST(datediff('day', f.cohort, a.day) AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM active a JOIN firstday f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: users bucketed by first-seen date, "
    "counted on each later active day. Cohort derivation, the distinct "
    "activity set, and the join all key on user_id, so Spark reuses ONE "
    "hash exchange across all three (ReusedExchange / co-partitioned "
    "join — no second shuffle of the fact table); the final (cohort, "
    "offset) aggregation is map-side combinable and tiny.",
)
def g15_retention_cohorts(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("day", "cohort").cast("int").alias("day_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


@q(
    "g16_funnel",
    """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
    ), s4 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
    )
    SELECT * FROM (
        SELECT 1 AS stage, 'signup' AS stage_name,
               CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        UNION ALL SELECT 2, 'view', CAST((SELECT count(*) FROM s2) AS BIGINT)
        UNION ALL SELECT 3, 'click', CAST((SELECT count(*) FROM s3) AS BIGINT)
        UNION ALL SELECT 4, 'purchase', CAST((SELECT count(*) FROM s4) AS BIGINT)
    )
    """,
    doc="Strictly-ordered funnel (signup -> view -> click -> purchase, "
    "each step's FIRST occurrence after the previous step's): cascaded "
    "min-after-previous aggregations, every stage keyed on user_id so "
    "the whole cascade rides one hash partitioning — funnel depth adds "
    "joins but NO extra shuffles of the fact table. Stage counts union "
    "into a 4-row summary.",
)
def g16_funnel(spark, sf_dir):
    # Each stage frame is pinned behind a lazy localCheckpoint: stage k
    # is consumed TWICE (by stage k+1 and by its own count), and the
    # cascade would otherwise re-derive every prior stage per consumer —
    # a plan audit measured TEN events scans for the 4-stage funnel
    # (ReuseExchange does not dedupe the repeated subplans). Pinned,
    # events is scanned once per stage filter and each per-user stage
    # frame (tiny: user_id + timestamp) materializes once.
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    prev = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .transform(pin)
    )
    frames = [prev]
    for stage in FUNNEL_STAGES[1:]:
        prev = (
            ev.filter(F.col("event_type") == stage)
            .join(prev.withColumnRenamed("t", "t_prev"), "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .transform(pin)
        )
        frames.append(prev)
    out = None
    for i, (name, fr) in enumerate(zip(FUNNEL_STAGES, frames)):
        row = fr.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("int").alias("stage"),
            F.lit(name).alias("stage_name"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


@q(
    "g17_rolling_7day",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, day, cnt,
               day - DATE '1970-01-01' AS day_idx
        FROM daily
    )
    SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
           CAST(sum(cnt) OVER w AS BIGINT) AS sum_7d,
           ROUND(CAST(sum(cnt) OVER w AS DOUBLE) / count(cnt) OVER w, 4)
               AS avg_7d
    FROM idx
    WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="7-day rolling daily-volume trend per event type — the "
    "dashboard smoothing pass over G7's daily counters. RANGE frame "
    "keyed on the integer day index (not ROWS): a calendar gap shrinks "
    "the window to the days actually inside it, so missing days are "
    "not silently treated as neighbors. One aggregation shuffle on "
    "(event_type, day) collapses events to ~types x days rows, then "
    "the window sorts within the tiny per-type partitions — the "
    "range-frame scan never touches raw events. The mean divides "
    "sum/count explicitly (avg()'s incremental mean is not "
    "bit-reproducible across engines).",
)
def g17_rolling_7day(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("cnt"))
    idx = daily.withColumn(
        "day_idx", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return idx.select(
        "event_type",
        "day",
        F.col("cnt").cast("long"),
        F.sum("cnt").over(w).cast("long").alias("sum_7d"),
        F.round(
            F.sum("cnt").over(w).cast("double") / F.count("cnt").over(w), 4
        ).alias("avg_7d"),
    )


# --- a4: deterministic HyperLogLog, registers and estimate hash-checked ------

_HLL_AUDIT = (
    # (label, table, column expr) — mixed cardinalities on purpose:
    # o_custkey exercises the raw-estimate branch, event_type the
    # linear-counting (small-range) branch, md5'd text content sits
    # between (exact dups collapse)
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.event_type", "events", "event_type"),
    ("documents.text", "documents", "text"),
)

_HLL_RANK_SQL = """61 - (CASE WHEN length(nz) = 0 THEN 0
         ELSE (length(nz) - 1) * 4 +
              CASE WHEN substr(nz, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 4
                   WHEN substr(nz, 1, 1) IN ('4','5','6','7') THEN 3
                   WHEN substr(nz, 1, 1) IN ('2','3') THEN 2
                   ELSE 1 END END)"""


def _hll_leg_sql(label: str, table: str, col: str) -> str:
    # numerator: alpha scaled by exact powers of two — the identical
    # double the Spark side embeds (operators/sketches.py::HLL_ALPHA)
    num = "(0.7213 / (1 + 1.079 / 64)) * 64 * 64 * pow(2.0, 40)"
    return f"""
    SELECT '{label}' AS key_col, n_exact, s_sum, v_zero,
           CAST(round((CASE WHEN {num} / s_sum <= 160.0 AND v_zero > 0
                             THEN 64.0 * ln(64.0 / v_zero)
                             ELSE {num} / s_sum END) * 1000) AS BIGINT)
               AS est_milli
    FROM (
        SELECT CAST(sum(CAST(pow(2.0, 40 - mr) AS BIGINT))
                    + (64 - count(*)) * CAST(pow(2.0, 40) AS BIGINT) AS BIGINT)
                   AS s_sum,
               CAST(64 - count(*) AS BIGINT) AS v_zero
        FROM (
            SELECT reg, max(least(rank, 40)) AS mr
            FROM (
                SELECT CAST(CAST('0x' || substr(h, 1, 2) AS INT) % 64 AS INT)
                           AS reg,
                       {_HLL_RANK_SQL} AS rank
                FROM (
                    SELECT h, regexp_replace(substr(h, 3, 15), '^0*', '') AS nz
                    FROM (
                        SELECT md5(CAST({col} AS VARCHAR)) AS h FROM {table}
                        WHERE {col} IS NOT NULL
                    )
                )
            ) GROUP BY reg
        )
    ) CROSS JOIN (
        SELECT CAST(count(DISTINCT {col}) AS BIGINT) AS n_exact
        FROM {table} WHERE {col} IS NOT NULL
    )
    """


@q(
    "a4_hll_distinct",
    " UNION ALL ".join(_hll_leg_sql(*leg) for leg in _HLL_AUDIT),
    doc="Deterministic HyperLogLog (Flajolet et al. 2007) — the novel-"
    "sketch counterpart to a1's built-in HLL++: registers route on "
    "md5's first hex byte % 64, ranks come from string ops on the "
    "60-bit tail (no engine-dependent integer hex parse), the register "
    "MAX is one map-side-combinable aggregation over <= 64 groups, and "
    "the register sum S = sum(2^(40-rank)) stays int64-EXACT by the "
    "rank cap. Because every step is deterministic, the driver hash-"
    "checks the SKETCH ITSELF (S, V) plus the estimate (raw "
    "alpha*m^2/sum branch AND the linear-counting small-range branch — "
    "the three audited columns' cardinalities force both), not just an "
    "error-bound boolean like a1. Exact distinct counts ride along per "
    "column, so the output doubles as a measured-accuracy audit. At "
    "100 TB this is THE mergeable distinct-count shape: per-partition "
    "64-row partials, one exchange, constant memory.",
)
def a4_hll_distinct(spark, sf_dir):
    from ..operators.sketches import hll_summary

    legs = []
    for label, table, col in _HLL_AUDIT:
        base = t(spark, sf_dir, table).filter(F.col(col).isNotNull())
        exact = base.agg(F.countDistinct(col).cast("long").alias("n_exact"))
        legs.append(
            hll_summary(base, F.col(col))
            .crossJoin(F.broadcast(exact))
            .select(
                F.lit(label).alias("key_col"),
                "n_exact",
                "s_sum",
                "v_zero",
                "est_milli",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


A5_QUANTILES_BP = (2500, 5000, 9000, 9900)
A5_K = 512


@q(
    "a5_sampled_quantiles",
    f"""
    WITH keyed AS (
        SELECT md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                   CAST(l_linenumber AS VARCHAR)) AS h,
               l_extendedprice AS v
        FROM lineitem
    ), samp AS (
        SELECT v FROM (
            SELECT v, row_number() OVER (ORDER BY h) AS r FROM keyed
        ) WHERE r <= {A5_K}
    ), sv AS (
        SELECT v, row_number() OVER (ORDER BY v) AS vr FROM samp
    ), est AS (
        SELECT qq.q_bp, sv.v AS est_value
        FROM (VALUES {", ".join(f"({q})" for q in A5_QUANTILES_BP)}) AS qq(q_bp)
        JOIN sv ON sv.vr = (qq.q_bp * {A5_K - 1}) // 10000 + 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem
    )
    SELECT CAST(e.q_bp AS INT) AS q_bp, e.est_value, tot.n_rows,
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_extendedprice < e.est_value) AS BIGINT) AS n_below,
           CAST(((SELECT count(*) FROM lineitem
                  WHERE l_extendedprice < e.est_value) * 10000) // tot.n_rows
                AS BIGINT) AS rank_bp,
           CAST(abs(((SELECT count(*) FROM lineitem
                      WHERE l_extendedprice < e.est_value) * 10000)
                    // tot.n_rows - e.q_bp) AS BIGINT) AS err_bp
    FROM est e CROSS JOIN tot
    """,
    doc="Deterministic sampled quantiles (operators/sketches.py::"
    "bottomk_sample / sampled_quantile_audit) — the quantile twin of "
    "a4's distinct sketch, closing the novel-sketch family: the k "
    "lowest-md5(key) rows form a KMV uniform sample (Bar-Yossef et "
    "al. 2002) that is a PURE FUNCTION of the data — mergeable by "
    "construction (bottom-k of unions = union of bottom-ks, which is "
    "exactly what the two-phase shard rank computes; never a global "
    "sort) — so unlike engine-specific KLL/GK summaries (a1's "
    "error-bound booleans) the estimates THEMSELVES hash-check "
    "cross-engine: nearest-rank picks on the sorted 512-value sample "
    "are raw data values, and the audit leg counts rows below each "
    "estimate in ONE combinable aggregation with the achieved rank in "
    "integer basis points (integer division end to end). Measured "
    "err_bp at k=512 is the Dvoretzky-Kiefer-Wolfowitz ~sqrt(ln/k) "
    "band; the driver hashes the exact numbers.",
)
def a5_sampled_quantiles(spark, sf_dir):
    from ..operators.sketches import sampled_quantile_audit

    li = t(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return sampled_quantile_audit(
        li, key, "l_extendedprice", quantiles_bp=A5_QUANTILES_BP, k=A5_K
    )


_A6_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@q(
    "a6_lake_sketch",
    f"""
    SELECT 'hll' AS kind, CAST(reg AS BIGINT) AS reg,
           CAST(NULL AS VARCHAR) AS hash_hex,
           CAST(NULL AS VARCHAR) AS key_str,
           CAST(mr AS BIGINT) AS v
    FROM (
        SELECT reg, max(least(rank, 40)) AS mr
        FROM (
            SELECT CAST(CAST('0x' || substr(h, 1, 2) AS INT) % 64 AS INT)
                       AS reg,
                   {_HLL_RANK_SQL} AS rank
            FROM (
                SELECT h, regexp_replace(substr(h, 3, 15), '^0*', '') AS nz
                FROM (
                    SELECT md5({_A6_NORM_SQL}) AS h FROM documents
                    WHERE text IS NOT NULL
                )
            )
        ) GROUP BY reg
    )
    UNION ALL
    SELECT 'kmv' AS kind, CAST(NULL AS BIGINT) AS reg,
           h AS hash_hex, k AS key_str, v
    FROM (
        SELECT h, k, v, row_number() OVER (ORDER BY h, k, v) AS r
        FROM (
            SELECT md5(CAST(doc_id AS VARCHAR)) AS h,
                   CAST(doc_id AS VARCHAR) AS k,
                   CAST(coalesce(length(text), 0) AS BIGINT) AS v
            FROM documents
        )
    ) WHERE r <= 512
    """,
    doc="The STORED corpus sketch facet of the incremental signature "
    "lake (jobs/doc_signature_lake.py::read_corpus_sketch over the "
    "sf-keyed demo lake — documents ingested as two real batches, then "
    "compacted): a4's HLL registers over normalized content merged by "
    "max-per-register, a5's KMV bottom-k (doc-length values) merged by "
    "bottom-k-of-union, both REDUCED to one partition by compaction. "
    "The oracle re-derives the merged sketch from raw parquet alone, "
    "so the hash check proves ingest-persist -> compaction-merge -> "
    "read serve the exact from-scratch sketch (merge laws additionally "
    "property-tested in tests/test_sketch_lake.py). At 100 TB this is "
    "why the facet exists: corpus-wide distinct-content estimates and "
    "length quantiles come from a few hundred stored rows per corpus — "
    "no re-scan of the text, and tomorrow's batch folds in with a "
    "64-row max and a bottom-k re-rank.",
)
def a6_lake_sketch(spark, sf_dir):
    from ..jobs.doc_signature_lake import read_corpus_sketch, sf_sketch_root

    root = sf_sketch_root(spark, sf_dir)
    sk = read_corpus_sketch(spark, root)
    return sk.select(
        "kind",
        F.col("reg").cast("long").alias("reg"),
        F.col("h").alias("hash_hex"),
        F.col("k").alias("key_str"),
        F.col("v").cast("long").alias("v"),
    )


# t26/a7 oracles re-tokenize exactly like the t25/a2 entries (llm.py)
from .llm import TOKENS_SQL as _TOKENS_SQL  # noqa: E402


@q(
    "t26_lake_bigram_nll",
    f"""
    WITH tk AS (
        SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents
    ), occ AS (
        SELECT doc_id, tk[u.i] AS w1, tk[u.i + 1] AS w2
        FROM tk CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk))) AS i
        ) u
        WHERE len(tk) >= 2 AND tk[1] != ''
    ), flat AS (
        SELECT unnest(tk) AS tok FROM tk
    ), vsize AS (
        SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM flat WHERE tok != ''
    ), c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM occ GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM occ GROUP BY 1
    ), lp AS (
        SELECT c2.w1, c2.w2,
               CAST(round(ln((c2.c2 + 1.0) / (c1.c1 + vsize.v)) * 1000000)
                    AS BIGINT) AS micro
        FROM c2 JOIN c1 USING (w1) CROSS JOIN vsize
    ), agg AS (
        SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(-sum(l.micro) AS BIGINT) AS nll_micro
        FROM occ o JOIN lp l USING (w1, w2) GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(a.n_bigrams, 0) AS n_bigrams,
           coalesce(a.nll_micro, 0) AS nll_micro,
           CASE WHEN a.n_bigrams > 0 THEN a.nll_micro // a.n_bigrams
                ELSE 0 END AS avg_nll_micro
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    doc="Bigram NLL served from the STORED corpus LM (jobs/"
    "doc_signature_lake.py::read_corpus_lm over the sf-keyed demo lake "
    "— documents ingested as two real batches, then compacted): the "
    "lm/ facet persists additive bigram-type counts + distinct vocab "
    "rows per ingest batch, compaction REDUCES them by SUM/DISTINCT, "
    "and operators/text.py::bigram_nll_with_lm scores the corpus under "
    "the merged stored model. The oracle is t25's from-scratch SQL "
    "verbatim, so the hash check proves ingest-persist -> compaction-"
    "merge -> stored-model scoring is BIT-identical to retraining on "
    "the raw text — the contract that lets curate's --lm-root "
    "perplexity band skip the 100 TB re-scan every run (curate.py "
    "reads this exact facet). c(w1.) is the w1-marginal of the stored "
    "bigram rows (no third leg), V is the distinct-vocab row count; "
    "scoring is one equi-join of the occurrence stream against the "
    "O(types) model table plus one doc-keyed integer sum.",
)
def t26_lake_bigram_nll(spark, sf_dir):
    from ..jobs.doc_signature_lake import read_corpus_lm, sf_sketch_root
    from ..operators.text import bigram_nll_with_lm

    root = sf_sketch_root(spark, sf_dir)
    lm = read_corpus_lm(spark, root)
    return bigram_nll_with_lm(t(spark, sf_dir, "documents"), lm, "doc_id", "text")


_A7_CELLS_SQL = (
    "r.r * 256 + CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || "
    "{key}), 1, 15)) AS BIGINT) % 256"
)


@q(
    "a7_lake_cms_heavy_hitters",
    f"""
    WITH tk AS (
        SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents
    ), grams AS (
        SELECT tk[u.i] || ' ' || tk[u.i + 1] AS gram
        FROM tk CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk))) AS i
        ) u
        WHERE len(tk) >= 2 AND tk[1] != ''
    ), rs AS (
        SELECT unnest(range(0, 4)) AS r
    ), sk AS (
        SELECT cell, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT {_A7_CELLS_SQL.format(key="gram")} AS cell
            FROM grams CROSS JOIN rs r
        ) GROUP BY cell
    ), exact AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS exact_n
        FROM grams GROUP BY gram
    ), total AS (
        SELECT CAST(sum(exact_n) AS BIGINT) AS n_total FROM exact
    ), top AS (
        SELECT gram, exact_n,
               CAST(row_number() OVER (ORDER BY exact_n DESC, gram) AS INT)
                   AS rank
        FROM exact ORDER BY exact_n DESC, gram LIMIT 10
    ), est AS (
        SELECT gram, CAST(min(sk.cnt) AS BIGINT) AS est FROM (
            SELECT t.gram, {_A7_CELLS_SQL.format(key="t.gram")} AS cell
            FROM top t CROSS JOIN rs r
        ) JOIN sk USING (cell) GROUP BY gram
    )
    SELECT t.gram, t.exact_n, t.rank, e.est,
           e.est >= t.exact_n AS est_ge_exact,
           e.est <= t.exact_n + (4.0 / 256) * total.n_total AS est_within_eps
    FROM top t JOIN est e USING (gram) CROSS JOIN total
    ORDER BY t.rank
    """,
    doc="Heavy hitters served from the STORED count-min facet (jobs/"
    "doc_signature_lake.py::read_corpus_cms over the sf-keyed demo "
    "lake): ingest persists <= depth*width md5-variant CMS cells per "
    "batch, compaction REDUCES them by SUM (the additive merge law), "
    "and the exact top-10 token bigrams are estimated against the "
    "merged STORED cells — a2's audit shape with the sketch coming "
    "from the lake instead of a fresh build. The md5 cell hash "
    "(operators/sketches.py::cms_cells_md5) is what makes this "
    "oracle-checkable: DuckDB re-derives every merged cell bit-exactly "
    "from raw parquet, so one drifted stored count mismatches the "
    "hash (xxhash64 cells forced a2 to check booleans only). The "
    "estimate itself is in the output: est >= exact is the CMS "
    "no-underestimate law, est <= exact + 4/width * N the width "
    "bound. At 100 TB the serving read is a broadcast of ~1k stored "
    "rows (cli sketch-stats --gram); only the exact-audit candidates "
    "scan the corpus, and production swaps them for per-partition "
    "top-m proposal exactly as a2's doc promises.",
)
def a7_lake_cms_heavy_hitters(spark, sf_dir):
    from ..jobs.doc_signature_lake import (
        CMS_DEPTH,
        CMS_WIDTH,
        read_corpus_cms,
        sf_sketch_root,
    )
    from ..operators.sketches import cms_estimate_md5
    from ..operators.text import _bigram_occurrences, _bigram_staged

    root = sf_sketch_root(spark, sf_dir)
    cms = read_corpus_cms(spark, root)
    docs = t(spark, sf_dir, "documents")
    occ = _bigram_occurrences(_bigram_staged(docs, "doc_id", "text"), "doc_id")
    # pinned: the gram stream feeds the exact audit aggregation only
    # (the sketch is READ, not rebuilt) — pin guards the re-tokenize
    # against the two downstream aggregations sharing it
    grams = occ.select(
        F.concat(F.col("w1"), F.lit(" "), F.col("w2")).alias("gram")
    ).transform(pin)
    exact = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("exact_n")
    ).transform(pin)
    total = exact.agg(F.sum("exact_n").cast("long").alias("n_total"))
    ranked = (
        exact.orderBy(F.desc("exact_n"), F.asc("gram"))
        .limit(10)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("exact_n"), F.asc("gram")))
            .cast("int"),
        )
    )
    est = cms_estimate_md5(ranked, cms, "gram", CMS_DEPTH, CMS_WIDTH)
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "gram",
            "exact_n",
            "rank",
            F.col("est").cast("long").alias("est"),
            (F.col("est") >= F.col("exact_n")).alias("est_ge_exact"),
            (
                F.col("est")
                <= F.col("exact_n")
                + F.lit(4.0 / CMS_WIDTH) * F.col("n_total")
            ).alias("est_within_eps"),
        )
        .orderBy("rank")
    )


@q(
    "a8_lake_heavy_hitters",
    f"""
    WITH tk AS (
        SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents
    ), grams AS (
        SELECT doc_id % 2 AS b, tk[u.i] || ' ' || tk[u.i + 1] AS gram
        FROM tk CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk))) AS i
        ) u
        WHERE len(tk) >= 2 AND tk[1] != ''
    ), bc AS (
        SELECT b, gram, CAST(count(*) AS BIGINT) AS n
        FROM grams GROUP BY 1, 2
    ), cand AS (
        SELECT DISTINCT gram FROM (
            SELECT b, gram,
                   row_number() OVER (
                       PARTITION BY b ORDER BY n DESC, gram ASC
                   ) AS r
            FROM bc
        ) WHERE r <= 64
    ), rs AS (
        SELECT unnest(range(0, 4)) AS r
    ), sk AS (
        SELECT cell, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT {_A7_CELLS_SQL.format(key="gram")} AS cell
            FROM grams CROSS JOIN rs r
        ) GROUP BY cell
    ), est AS (
        SELECT gram, CAST(min(sk.cnt) AS BIGINT) AS est FROM (
            SELECT c.gram, {_A7_CELLS_SQL.format(key="c.gram")} AS cell
            FROM cand c CROSS JOIN rs r
        ) JOIN sk USING (cell) GROUP BY gram
    )
    SELECT gram, est, rank FROM (
        SELECT gram, est,
               CAST(row_number() OVER (ORDER BY est DESC, gram ASC) AS INT)
                   AS rank
        FROM est
    ) WHERE rank <= 10 ORDER BY rank
    """,
    doc="Corpus-wide heavy hitters served ENTIRELY from stored rows "
    "(jobs/doc_signature_lake.py::lake_heavy_hitters; cli sketch-stats "
    "--top-grams): the hh/ facet persists each ingest batch's exact "
    "top-m candidate bigrams (deterministic — batch-level counts with "
    "a total tie order, so unlike per-partition Misra-Gries the "
    "oracle can re-derive them from raw parquet), compaction merges "
    "candidates by distinct/max (idempotent — crash-window safe "
    "twice over), and serving estimates the merged stored candidates "
    "against the merged stored cms/ cells, ranking by (est desc, "
    "gram). a7 audits the sketch against an exact corpus scan; THIS "
    "entry is the production read — the whole pipeline, candidates "
    "included, touches only a few thousand persisted rows however "
    "large the corpus (the local-HH coverage law: a corpus heavy "
    "hitter clears some batch's top-m). The oracle replays per-batch "
    "top-64 proposal + merged-cell estimation from raw parquet, so "
    "one missing candidate or drifted stored count mismatches the "
    "hash.",
)
def a8_lake_heavy_hitters(spark, sf_dir):
    from ..jobs.doc_signature_lake import lake_heavy_hitters, sf_sketch_root

    root = sf_sketch_root(spark, sf_dir)
    return lake_heavy_hitters(spark, root, topk=10)


T27_ALPHA = 0.5
T27_NUM, T27_DEN = 2, 5  # token budget = 40% of corpus tokens
T27_SHARDS = 16


@q(
    "t27_token_budget_mixture",
    f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(coalesce(len({_TOKENS_SQL}), 0) AS BIGINT) AS n_tokens
        FROM documents
    ), cnt AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_domain,
               CAST(sum(n_tokens) AS BIGINT) AS tok_domain
        FROM d GROUP BY source
    ), mic AS (
        SELECT source, tok_domain,
               CAST(round(pow(n_domain, {T27_ALPHA}) * 1000000) AS BIGINT)
                   AS micro
        FROM cnt
    ), tot AS (
        SELECT CAST(sum(micro) AS BIGINT) AS tot,
               CAST((SELECT (sum(n_tokens) * {T27_NUM}) // {T27_DEN} FROM d)
                    AS BIGINT) AS b
        FROM mic
    ), base AS (
        SELECT m.source, m.tok_domain,
               least(m.tok_domain, (m.micro * t.b) // t.tot) AS t0,
               (m.micro * t.b) % t.tot AS rem,
               ((m.micro * t.b) // t.tot) < m.tok_domain AS uncapped,
               t.b AS b
        FROM mic m CROSS JOIN tot t
    ), ranked AS (
        SELECT *,
               row_number() OVER (
                   ORDER BY CASE WHEN uncapped THEN rem ELSE -1 END DESC,
                            source ASC
               ) AS rnk
        FROM base
    ), lo AS (
        SELECT CAST(max(b) - sum(t0) AS BIGINT) AS L FROM base
    ), tgt AS (
        SELECT r.source,
               CAST(r.t0 + CASE WHEN r.uncapped AND r.rnk <= lo.L
                                THEN 1 ELSE 0 END AS BIGINT) AS tok_target
        FROM ranked r CROSS JOIN lo
    ), sel AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY CAST(CAST('0x' ||
                              substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                              AS INT) % {T27_SHARDS} AS INT) ASC,
                            md5(CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM d
    )
    SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.source, s.n_tokens,
           s.cum_tokens, t.tok_target
    FROM sel s JOIN tgt t USING (source)
    WHERE s.cum_tokens <= t.tok_target
    """,
    doc="Temperature mixture to an exact TOKEN budget (operators/"
    "sampling.py::token_budget_mixture) — the unit a pretraining run "
    "plans by: per-domain count^alpha weights split a 40%-of-corpus "
    "token budget by capped floor shares + largest-remainder topping "
    "(+1 token units), and each domain keeps the maximal hash-ordered "
    "PREFIX of its docs whose running token total fits the target "
    "(undershoot < the first excluded doc, never overshoot; "
    "zero-token docs ride free). The running total is TWO-PHASE for "
    "scale: the corpus shuffles once on (domain, hash-shard), the "
    "cumulative sum runs within each (domain, shard) window, and the "
    "cross-shard offsets come from the constant-size domain x shard "
    "totals table — no window sorts a whole domain in one task (the "
    "t15/t22 shard discipline applied to prefix sums); the oracle "
    "computes the same order with one flat window, which is exactly "
    "the equivalence the hash check proves. Completes the mixture "
    "family: t13 given weights, t15 given caps, t21/t22 doc budgets, "
    "t27 token budgets.",
)
def t27_token_budget_mixture(spark, sf_dir):
    from ..operators.dedup import tokens as _tokens
    from ..operators.sampling import token_budget_mixture

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.coalesce(F.size(_tokens(F.col("text"))), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    ).transform(pin)
    total = d.agg(F.sum("n_tokens")).first()[0] or 0
    budget = (int(total) * T27_NUM) // T27_DEN
    return token_budget_mixture(
        d,
        "doc_id",
        "source",
        "n_tokens",
        budget,
        alpha=T27_ALPHA,
        n_shards=T27_SHARDS,
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        "n_tokens",
        "cum_tokens",
        "tok_target",
    )


from ..operators.sketches import (  # noqa: E402
    BLOOM_K as _BK,
    BLOOM_M_BITS as _BM,
    BLOOM_WORD_BITS as _BW,
)
from .llm import _GRAM4_SQL as _A10_GRAM4_SQL  # noqa: E402

_A10_ABSENT_SUFFIX = " zzqxv"
# the engine-portable double-hash positions of a gram column g
# (operators/sketches.py::bloom_positions): both md5 slices reduce mod
# m before the Kirsch-Mitzenmacher combine
_A10_POS_SQL = (
    f"SELECT gram, (h1 + i * (2 * h2 + 1)) % {_BM} AS p FROM (\n"
    f"    SELECT gram,\n"
    f"           CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) % {_BM} AS h1,\n"
    f"           CAST(('0x' || substr(md5(gram), 17, 15)) AS BIGINT) % {_BM} AS h2\n"
    f"    FROM {{src}}\n"
    f") CROSS JOIN (SELECT unnest(range(0, {_BK})) AS i)"
)


@q(
    "a10_lake_bloom_decontaminate",
    f"""
    WITH tk AS (
        SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents
    ), gr AS (
        SELECT unnest({_A10_GRAM4_SQL}) AS gram FROM tk WHERE len(tk) >= 4
    ), exact AS (
        SELECT DISTINCT gram FROM gr
    ), cnts AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS exact_n FROM gr GROUP BY 1
    ), top AS (
        SELECT gram,
               CAST(row_number() OVER (ORDER BY exact_n DESC, gram) AS INT)
                   AS rank
        FROM cnts ORDER BY exact_n DESC, gram LIMIT 10
    ), panel AS (
        SELECT gram, rank FROM top
        UNION ALL
        SELECT gram || '{_A10_ABSENT_SUFFIX}', rank FROM top
    ), bloom AS (
        SELECT p // {_BW} AS w,
               bit_or(1::BIGINT << CAST(p % {_BW} AS INT)) AS bits
        FROM ({_A10_POS_SQL.format(src="exact")}) GROUP BY 1
    ), probe AS (
        SELECT pp.gram,
               CAST(sum(CASE WHEN coalesce(b.bits, 0) & pp.bv = pp.bv
                             THEN 1 ELSE 0 END) AS INT) AS hits
        FROM (
            SELECT gram, p // {_BW} AS w,
                   1::BIGINT << CAST(p % {_BW} AS INT) AS bv
            FROM ({_A10_POS_SQL.format(src="panel")})
        ) pp LEFT JOIN bloom b ON pp.w = b.w
        GROUP BY 1
    )
    SELECT pl.gram, pl.rank,
           coalesce(e.present, FALSE) AS in_corpus,
           pr.hits = {_BK} AS maybe_in_corpus,
           (NOT coalesce(e.present, FALSE)) OR pr.hits = {_BK}
               AS no_false_negative
    FROM panel pl
    JOIN probe pr USING (gram)
    LEFT JOIN (SELECT gram, TRUE AS present FROM exact) e USING (gram)
    ORDER BY pl.rank, pl.gram
    """,
    doc="Decontamination membership served from the STORED Bloom facet "
    "(jobs/doc_signature_lake.py::read_corpus_bloom over the sf-keyed "
    "demo lake — documents ingested as two real batches, then "
    "compacted): ingest persists <= BLOOM_WORDS (w, bits) rows of word-"
    "4-gram bits per batch (t9's collision key), compaction REDUCES "
    "them by bitwise OR (idempotent — the merge law that heals crash-"
    "window double reads, property-tested in tests/test_bloom_lake.py), "
    "and a 20-gram panel — the exact top-10 corpus 4-grams plus an "
    "absent variant of each — probes the merged stored words. The "
    "oracle re-derives every stored word from raw parquet (62-bit "
    "BIGINT words, bits 0..61, both engines refuse 1<<63), so one "
    "drifted stored bit mismatches the hash. in_corpus is the exact "
    "audit; maybe_in_corpus the served verdict; no_false_negative the "
    "Bloom law (present implies maybe — the guarantee decontamination "
    "relies on; absent panel grams read false except at the ~fill^k "
    "false-positive rate — single-digit ppm at this SF, the "
    "sketch-stats bloom_fp_ppm gauge). At 100 TB the serve "
    "touches <= 32768 stored rows broadcast against the probe grams — "
    "an eval-benchmark intake (cli decon-check) checks contamination without re-scanning "
    "corpus text; only the top-10 audit leg scans the corpus, and it "
    "exists for the oracle.",
)
def a10_lake_bloom_decontaminate(spark, sf_dir):
    from ..jobs.doc_signature_lake import (
        batch_gram4_stream,
        read_corpus_bloom,
        sf_sketch_root,
    )
    from ..operators.sketches import bloom_maybe_contains

    root = sf_sketch_root(spark, sf_dir)
    bloom = read_corpus_bloom(spark, root)
    docs = t(spark, sf_dir, "documents")
    # the exact-audit leg: pinned because top-10 ranking and the
    # in_corpus flag both read it (the bloom itself is READ from the
    # lake, not rebuilt)
    cnts = (
        batch_gram4_stream(docs, "doc_id", "text")
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .transform(pin)
    )
    top = (
        cnts.orderBy(F.desc("exact_n"), F.asc("gram"))
        .limit(10)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("exact_n"), F.asc("gram")))
            .cast("int"),
        )
        .transform(pin)
    )
    panel = top.select("gram", "rank").unionByName(
        top.select(
            F.concat(F.col("gram"), F.lit(_A10_ABSENT_SUFFIX)).alias("gram"),
            "rank",
        )
    )
    verdict = bloom_maybe_contains(panel.select("gram"), bloom, "gram")
    present = cnts.select("gram", F.lit(True).alias("present"))
    return (
        panel.join(verdict, "gram")
        .join(present, "gram", "left")
        .select(
            "gram",
            "rank",
            F.coalesce(F.col("present"), F.lit(False)).alias("in_corpus"),
            F.col("maybe_present").alias("maybe_in_corpus"),
            (
                ~F.coalesce(F.col("present"), F.lit(False))
                | F.col("maybe_present")
            ).alias("no_false_negative"),
        )
        .orderBy("rank", "gram")
    )


# a4's alpha numerator verbatim (_hll_leg_sql) — exact powers of two
_A4_NUM_SQL = "(0.7213 / (1 + 1.079 / 64)) * 64 * 64 * pow(2.0, 40)"


@q(
    "a11_grouped_hll_distinct",
    f"""
    WITH regs AS (
        SELECT grp, reg, max(least(rank, 40)) AS mr
        FROM (
            SELECT grp,
                   CAST(CAST('0x' || substr(h, 1, 2) AS INT) % 64 AS INT)
                       AS reg,
                   {_HLL_RANK_SQL} AS rank
            FROM (
                SELECT grp, h, regexp_replace(substr(h, 3, 15), '^0*', '') AS nz
                FROM (
                    SELECT event_type AS grp,
                           md5(CAST(user_id AS VARCHAR)) AS h
                    FROM events WHERE user_id IS NOT NULL
                )
            )
        ) GROUP BY grp, reg
    ), summ AS (
        SELECT grp,
               CAST(sum(CAST(pow(2.0, 40 - mr) AS BIGINT))
                    + (64 - count(*)) * CAST(pow(2.0, 40) AS BIGINT) AS BIGINT)
                   AS s_sum,
               CAST(64 - count(*) AS BIGINT) AS v_zero
        FROM regs GROUP BY grp
    ), ex AS (
        SELECT event_type AS grp,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )
    SELECT s.grp AS event_type, ex.n_exact, s.s_sum, s.v_zero,
           CAST(round((CASE WHEN {_A4_NUM_SQL} / s.s_sum <= 160.0
                                 AND s.v_zero > 0
                            THEN 64.0 * ln(64.0 / s.v_zero)
                            ELSE {_A4_NUM_SQL} / s.s_sum END) * 1000)
                AS BIGINT) AS est_milli
    FROM summ s JOIN ex USING (grp)
    ORDER BY event_type
    """,
    doc="GROUPED deterministic HyperLogLog — a4's novel sketch in the "
    "standard OLAP shape ('distinct users per segment'): one register "
    "table per event_type, built in ONE map-side-combinable max "
    "aggregation over (group, register) — <= 64 partial rows per group "
    "per task however many events — then a per-group summary with the "
    "int64-exact register sum, zero-register count, and the estimate "
    "(both branches). Exact per-group distincts ride along as the "
    "accuracy audit, and every number — registers, S, V, estimate — "
    "hash-checks cross-engine. At 100 TB this replaces a "
    "count(DISTINCT) per segment (a full shuffle of user ids per "
    "group) with constant-size per-group state that also merges "
    "across days by register max — the same law the lake's sketch "
    "facet compacts under.",
)
def a11_grouped_hll_distinct(spark, sf_dir):
    from ..operators.sketches import hll_registers_by, hll_summary_by

    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    summ = hll_summary_by(hll_registers_by(ev, "event_type", F.col("user_id")))
    exact = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        summ.join(exact, "grp")
        .select(
            F.col("grp").alias("event_type"),
            "n_exact",
            "s_sum",
            "v_zero",
            "est_milli",
        )
        .orderBy("event_type")
    )


A12_PAIRS_SQL = "l.grp < r.grp"


def _hll_overlap_sql(regs_src: str, ex_src: str) -> str:
    """The a12 overlap-oracle skeleton parameterized by its two inner
    sources: ``regs_src`` yields (grp, h) rows (h = the md5 the HLL
    hashes), ``ex_src`` yields (grp, uid) rows for the exact audit.
    a12 fills it with events/user_id, a13 with documents/normalized
    content — ONE SQL derivation for the register build, pairwise
    union merge, inclusion-exclusion, and audit, so the two oracles
    cannot drift."""
    return f"""
    WITH regs AS (
        SELECT grp, reg, max(least(rank, 40)) AS mr
        FROM (
            SELECT grp,
                   CAST(CAST('0x' || substr(h, 1, 2) AS INT) % 64 AS INT)
                       AS reg,
                   {_HLL_RANK_SQL} AS rank
            FROM (
                SELECT grp, h, regexp_replace(substr(h, 3, 15), '^0*', '') AS nz
                FROM ({regs_src})
            )
        ) GROUP BY grp, reg
    ), pairs AS (
        SELECT l.grp AS grp_a, r.grp AS grp_b FROM
            (SELECT DISTINCT grp FROM regs) l JOIN
            (SELECT DISTINCT grp FROM regs) r ON {A12_PAIRS_SQL}
    ), uregs AS (
        SELECT p.grp_a, p.grp_b, g.reg, max(g.mr) AS mr
        FROM pairs p JOIN regs g ON g.grp IN (p.grp_a, p.grp_b)
        GROUP BY 1, 2, 3
    ), est AS (
        SELECT grp, CAST(round((CASE WHEN {_A4_NUM_SQL} / s_sum <= 160.0
                                          AND v_zero > 0
                                     THEN 64.0 * ln(64.0 / v_zero)
                                     ELSE {_A4_NUM_SQL} / s_sum END) * 1000)
                         AS BIGINT) AS est_milli
        FROM (
            SELECT grp,
                   CAST(sum(CAST(pow(2.0, 40 - mr) AS BIGINT))
                        + (64 - count(*)) * CAST(pow(2.0, 40) AS BIGINT)
                        AS BIGINT) AS s_sum,
                   CAST(64 - count(*) AS BIGINT) AS v_zero
            FROM regs GROUP BY grp
        )
    ), uest AS (
        SELECT grp_a, grp_b,
               CAST(round((CASE WHEN {_A4_NUM_SQL} / s_sum <= 160.0
                                     AND v_zero > 0
                                THEN 64.0 * ln(64.0 / v_zero)
                                ELSE {_A4_NUM_SQL} / s_sum END) * 1000)
                    AS BIGINT) AS union_est_milli
        FROM (
            SELECT grp_a, grp_b,
                   CAST(sum(CAST(pow(2.0, 40 - mr) AS BIGINT))
                        + (64 - count(*)) * CAST(pow(2.0, 40) AS BIGINT)
                        AS BIGINT) AS s_sum,
                   CAST(64 - count(*) AS BIGINT) AS v_zero
            FROM uregs GROUP BY 1, 2
        )
    ), ex AS (
        SELECT p.grp_a, p.grp_b,
               CAST(count(DISTINCT CASE WHEN e1.grp = p.grp_a
                                        THEN e1.uid END) AS BIGINT) AS n_a,
               CAST(count(DISTINCT CASE WHEN e1.grp = p.grp_b
                                        THEN e1.uid END) AS BIGINT) AS n_b,
               CAST(count(DISTINCT e1.uid) AS BIGINT) AS n_union
        FROM pairs p JOIN ({ex_src}) e1 ON e1.grp IN (p.grp_a, p.grp_b)
        GROUP BY 1, 2
    )
    SELECT p.grp_a, p.grp_b,
           ea.est_milli AS est_a_milli,
           eb.est_milli AS est_b_milli,
           u.union_est_milli,
           ea.est_milli + eb.est_milli - u.union_est_milli
               AS overlap_est_milli,
           ex.n_a, ex.n_b, ex.n_union,
           ex.n_a + ex.n_b - ex.n_union AS n_overlap
    FROM pairs p
    JOIN est ea ON ea.grp = p.grp_a
    JOIN est eb ON eb.grp = p.grp_b
    JOIN uest u USING (grp_a, grp_b)
    JOIN ex USING (grp_a, grp_b)
    ORDER BY grp_a, grp_b
    """



@q(
    "a12_hll_set_ops",
    _hll_overlap_sql(
        "SELECT event_type AS grp, md5(CAST(user_id AS VARCHAR)) AS h "
        "FROM events WHERE user_id IS NOT NULL",
        "SELECT event_type AS grp, user_id AS uid FROM events "
        "WHERE user_id IS NOT NULL",
    ),
    doc="HLL set operations — audience overlap between segments from "
    "STORED-SHAPE sketches alone: per-segment register tables (a11's "
    "build), pairwise UNION sketches by the register-max merge law "
    "(the union estimate needs no data revisit — max over two 64-row "
    "frames), and the intersection by inclusion-exclusion "
    "est(A)+est(B)-est(A|B) — the standard sketch answer to 'how many "
    "users do segments A and B share'. Exact per-pair distincts ride "
    "along as the audit. Every register, union register, and estimate "
    "is deterministic, so the whole derivation hash-checks "
    "cross-engine. At 100 TB: segment sketches are 64 rows each, so "
    "all O(k^2) pair overlaps cost k^2 x 64-row merges — no re-scan, "
    "no distinct shuffle; the same stored registers the lake's sketch "
    "facet compacts under answer every pairwise question after the "
    "fact.",
)
def a12_hll_set_ops(spark, sf_dir):
    from ..operators.sketches import hll_pairwise_overlap, hll_registers_by

    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    regs = hll_registers_by(ev, "event_type", F.col("user_id"))
    # estimates + unions from registers alone (the shared derivation —
    # operators/sketches.py::hll_pairwise_overlap, also serving the
    # lake's stored hllg facet in a13)
    # ov is bounded (k^2 pairs) and derives from the operator's pinned
    # register frame — its three downstream references recompute bounded
    # joins, which costs less than another ~0.5 s plan-time pin (r13)
    ov = hll_pairwise_overlap(regs)
    pe = ev.select(F.col("event_type").alias("grp"), F.col("user_id").alias("uid"))
    return _with_exact_overlap_audit(ov, pe)


def _with_exact_overlap_audit(ov: DataFrame, pe: DataFrame) -> DataFrame:
    """Join the exact per-pair distinct audit (n_a, n_b, n_union,
    n_overlap) onto a pairwise-overlap estimate frame — the a12/a13
    verification legs share this so the audit math cannot drift.

    Shape (r13, guide §3): the raw (grp, uid) stream is DISTINCTED
    once before touching the pairs — after that every per-side uid is
    unique, so the two per-side tallies are plain counts (the old
    three-countDistinct aggregation expanded every row 3x through the
    exchange). The old OR-predicate join (grp == grp_a OR grp == grp_b)
    could only plan as a nested-loop over |rows| x |pairs|; the doubled
    pair-key frame (each pair listed once under each side's grp, with a
    side flag) broadcasts and hash-joins the distincted stream ONCE —
    grp_a < grp_b means a row matches exactly one side of a pair, so
    the join output is the identical multiset, consumed in a single
    pass (no pin, no second distinct)."""
    pairs = ov.select("grp_a", "grp_b")
    pkeys = pairs.select(
        F.col("grp_a").alias("grp"), "grp_a", "grp_b", F.lit(1).alias("_a")
    ).unionByName(
        pairs.select(
            F.col("grp_b").alias("grp"), "grp_a", "grp_b", F.lit(0).alias("_a")
        )
    )
    ex = (
        pe.distinct()
        .join(F.broadcast(pkeys), "grp")
        .groupBy("grp_a", "grp_b")
        .agg(
            F.sum("_a").cast("long").alias("n_a"),
            F.sum(1 - F.col("_a")).cast("long").alias("n_b"),
            F.countDistinct("uid").cast("long").alias("n_union"),
        )
    )
    return (
        ov.join(ex, ["grp_a", "grp_b"])
        .select(
            "grp_a",
            "grp_b",
            "est_a_milli",
            "est_b_milli",
            "union_est_milli",
            "overlap_est_milli",
            "n_a",
            "n_b",
            "n_union",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_overlap"),
        )
        .orderBy("grp_a", "grp_b")
    )


@q(
    "a13_lake_segment_overlap",
    _hll_overlap_sql(
        f"SELECT lang AS grp, md5({_A6_NORM_SQL}) AS h "
        "FROM documents WHERE text IS NOT NULL",
        f"SELECT lang AS grp, {_A6_NORM_SQL} AS uid "
        "FROM documents WHERE text IS NOT NULL",
    ),
    doc="Lake-served segment overlap — a11/a12 as a STORED facet of "
    "the signature lake (VERDICT r11 item 6): ingest persists "
    "per-batch grouped-HLL registers over the considered docs' "
    "normalized content keyed by segment "
    "(jobs/doc_signature_lake.py::batch_hllg_rows, hllg/), compaction "
    "REDUCES them by max-per-(group, register) — idempotent, so the "
    "crash window cannot corrupt the merge — and every pairwise "
    "'how much content do segments A and B share' answer comes from "
    "the stored <= 64-row-per-group registers alone "
    "(corpus_segment_overlap; cli sketch-stats --segment-overlap), "
    "the corpus text staying cold. The estimate/union/inclusion-"
    "exclusion math is the SHARED a12 derivation (operators/"
    "sketches.py::hll_pairwise_overlap) and the oracle is the shared "
    "a12 SQL skeleton with the documents/normalized-content sources, "
    "re-deriving the merged registers from raw parquet — the hash "
    "check proves ingest-persist -> compaction-merge -> stored-row "
    "serve equals from-scratch. Exact per-pair distinct-content "
    "audits ride along (the a12 rule). At 100 TB: k segments cost "
    "k^2 x 64-row merges off stored rows, and tomorrow's batch folds "
    "in with one register max.",
)
def a13_lake_segment_overlap(spark, sf_dir):
    from ..jobs.doc_signature_lake import (
        corpus_segment_overlap,
        sf_sketch_root,
    )
    from ..operators.dedup import normalize_text

    root = sf_sketch_root(spark, sf_dir)
    # unpinned for the same reason as a12's ov: bounded rows off the
    # operator-pinned stored registers (r13)
    ov = corpus_segment_overlap(spark, root)
    # exact audit from raw parquet (the a12 rule: estimates are
    # verified against exact distincts — here, distinct normalized
    # contents per language segment)
    pe = (
        t(spark, sf_dir, "documents")
        .select(
            F.col("lang").alias("grp"),
            normalize_text(F.col("text")).alias("uid"),
        )
        .filter(F.col("uid").isNotNull())
    )
    return _with_exact_overlap_audit(ov, pe)


_A14_V_SQL = f"CAST(len({_TOKENS_SQL}) AS BIGINT)"
_A14_LO_SQL = (
    "CASE WHEN length(CAST(v AS VARCHAR)) <= 3 THEN v "
    "ELSE CAST(substr(CAST(v AS VARCHAR), 1, 3) "
    "|| repeat('0', length(CAST(v AS VARCHAR)) - 3) AS BIGINT) END"
)
_A14_SCALE_SQL = (
    "CASE WHEN length(CAST(v AS VARCHAR)) <= 3 THEN 1 "
    "ELSE CAST('1' || repeat('0', length(CAST(v AS VARCHAR)) - 3) AS BIGINT) "
    "END"
)


@q(
    "a14_lake_token_quantiles",
    f"""
    WITH vals AS (
        SELECT {_A14_V_SQL} AS v
        FROM documents WHERE text IS NOT NULL
    ), b AS (
        SELECT {_A14_LO_SQL} AS lo,
               {_A14_LO_SQL} + {_A14_SCALE_SQL} - 1 AS hi
        FROM vals
    ), g AS (
        SELECT lo, hi, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2
    ), c AS (
        SELECT lo, hi,
               CAST(sum(cnt) OVER (ORDER BY lo) AS BIGINT) AS n_le
        FROM g
    ), tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM g
    ), qs(q_ppm) AS (
        VALUES (250000), (500000), (750000), (900000), (990000)
    ), t2 AS (
        SELECT q_ppm,
               (CAST(q_ppm AS BIGINT) * n_total + 999999) // 1000000
                   AS target,
               n_total
        FROM qs CROSS JOIN tot
    )
    SELECT CAST(t2.q_ppm AS INTEGER) AS q_ppm,
           min(c.lo) AS est_lo,
           min_by(c.hi, c.lo) AS est_hi,
           min_by(c.n_le, c.lo) AS n_le,
           t2.n_total
    FROM t2 JOIN c ON c.n_le >= t2.target
    GROUP BY t2.q_ppm, t2.n_total
    ORDER BY q_ppm
    """,
    doc="Lake-served token-length quantiles — the engine's mergeable "
    "QUANTILE sketch as a stored facet (operators/sketches.py::"
    "hist_rows; jobs/doc_signature_lake.py::batch_hist_rows, hist/): "
    "ingest persists per-batch deterministic decimal-bucket histograms "
    "of each considered doc's whitespace token count (exact singleton "
    "buckets below 10^3, first-3-significant-digits buckets above — "
    "< 1% relative width — all pure string/integer math so the SAME "
    "formula runs in the oracle), compaction merges them by plain SUM "
    "(the additive lm/cms law, crash-window partitions excluded), and "
    "every quantile answer comes from the few-thousand-row stored "
    "bucket table alone (corpus_token_quantiles; cli sketch-stats "
    "--token-quantiles) with est_lo <= exact <= est_hi guaranteed. "
    "The 'how long are my documents' number every packing/budget "
    "decision starts from, without a corpus scan. Unlike Spark's "
    "approx_percentile, whose KLL state is opaque and engine-bound, "
    "this sketch is plain rows: any engine can merge or audit it. "
    "Plan shape: the histogram build is one narrow aggregation with "
    "map-side combine riding ingest's ONE staged token array; the "
    "quantile serve's cumulative window and target join run over the "
    "MERGED bucket table (registers-not-data rule, plan-gated), never "
    "a value stream.",
)
def a14_lake_token_quantiles(spark, sf_dir):
    from ..jobs.doc_signature_lake import (
        corpus_token_quantiles,
        sf_sketch_root,
    )

    root = sf_sketch_root(spark, sf_dir)
    return corpus_token_quantiles(spark, root)


@q(
    "t30_weighted_sample",
    """
    WITH keyed AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST(round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS
                        VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                        / 1152921504606846977.0)
                    / CAST(n_chars AS DOUBLE) * 1000000) AS BIGINT)
                   AS key_micro
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, weight, key_micro, rank FROM (
        SELECT doc_id, weight, key_micro,
               CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id)
                    AS INT) AS rank
        FROM keyed
    ) WHERE rank <= 50
    ORDER BY rank
    """,
    doc="Deterministic weighted sampling without replacement "
    "(operators/sampling.py::weighted_sample; Efraimidis & Spirakis "
    "2006): each doc races with key ln(u)/w — u a deterministic "
    "md5-uniform of its id, w its length weight — and the k largest "
    "keys win, which IS the sequential draw-proportional-to-remaining-"
    "weights distribution. The 'sample docs proportional to quality' "
    "primitive of mixture building, under the engine's no-RNG "
    "discipline: keys quantize to integer micro-units with the id "
    "tie-break, so the selected set and ranks hash-check cross-engine. "
    "At 100 TB: one map pass for keys, then a global top-k as "
    "per-partition heaps + a k-row merge (TakeOrderedAndProject — "
    "plan-gated: no single-partition sort of the corpus; the rank "
    "window sees k rows only). Null/non-positive weights are excluded "
    "— they cannot race.",
)
def t30_weighted_sample(spark, sf_dir):
    from ..operators.sampling import weighted_sample

    return weighted_sample(
        t(spark, sf_dir, "documents"), "doc_id", "n_chars", k=50
    )


_X3_BITS = 10
_X3_Z_SQL = " + ".join(
    f"(((u >> {i}) & 1) << {2 * i}) + (((d >> {i}) & 1) << {2 * i + 1})"
    for i in range(_X3_BITS)
)


@q(
    "x3_zorder_key",
    f"""
    SELECT event_id, u, d, CAST({_X3_Z_SQL} AS BIGINT) AS z
    FROM (
        SELECT event_id, user_id AS u,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        FROM events
    )
    """,
    doc="Z-order (Morton) clustering key (operators/bucketing.py::"
    "zorder_key) — the multi-dimensional layout primitive (Delta "
    "OPTIMIZE ZORDER): user and day bits interleave so rows close in "
    "BOTH dimensions get close keys, and a range-partitioned write by "
    "the key gives every file a tight min/max box in both dimensions "
    "— a user x time box query then skips files on parquet footer "
    "stats alone (measured 7/64 files touched vs 13/64 for the "
    "time-sorted layout, tests/test_bucketing.py::"
    "test_zorder_layout_prunes_more_files_than_time_sort). Pure "
    "integer bit expression, JVM-side, no shuffle; NULL in either "
    "dimension propagates to a NULL key in both engines. The oracle "
    "re-derives every interleaved bit, so a single transposed bit "
    "position flips the hash.",
)
def x3_zorder_key(spark, sf_dir):
    from ..operators.bucketing import zorder_key

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("u"),
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
        .cast("long")
        .alias("d"),
    )
    return ev.select(
        "event_id", "u", "d", zorder_key([F.col("u"), F.col("d")], bits=_X3_BITS).alias("z")
    )
