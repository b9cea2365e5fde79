"""Relational core queries: filters (F), aggregations (G), windows (W),
set ops (U), scalar functions (C) from SURVEY.md sections 2.2/2.4-2.7,
mapped onto the driver testdata per FIXTURES.md:

- ``events``   stands in for search-page rows / the event-time stream
  (monotone ``ts`` = uploadtime watermark column).
- ``orders``/``lineitem`` stand in for the replay_status lifecycle table
  (status flags, date column, conditional-aggregation shapes).
- ``documents`` stands in for replay documents (long text column).

Reference citations in each query's doc string are file:line into
/root/reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import Query, t

QUERIES: list[Query] = []


def q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn

    return deco


# --------------------------------------------------------------------------
# F — filters / predicates
# --------------------------------------------------------------------------

WATERMARK_TS = "2024-01-20 00:00:00"


@q(
    "f1_watermark_filter",
    f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '{WATERMARK_TS}'
    """,
    doc="F1 incremental high-watermark filter (tasks/discovery.py:82-100): "
    "keep rows strictly newer than the stored watermark.",
)
def f1_watermark_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit(WATERMARK_TS).cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@q(
    "f2_undownloaded_filter",
    """
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    doc="F2 undownloaded filter + projection (db.py:505-509): "
    "status-flag equality with column pruning.",
)
def f2_undownloaded_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


@q(
    "f3_conjunctive_flags",
    """
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
    doc="F3 downloaded-and-uncompacted filter (db.py:537-541): "
    "conjunction of two lifecycle flags.",
)
def f3_conjunctive_flags(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"))
        .select("o_orderkey", "o_orderdate")
    )


@q(
    "f4_failed_retry_predicate",
    """
    WITH status AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 3 = 0 THEN NULL
                    WHEN doc_id % 3 = 1 THEN TRUE
                    ELSE FALSE END AS is_retry_attempted
        FROM documents
    )
    SELECT doc_id, source
    FROM status
    WHERE source LIKE 'src1%' AND NOT coalesce(is_retry_attempted, FALSE)
    """,
    doc="F4 failed-download predicate (db.py:562-569): LIKE-prefix match plus "
    "SQLite three-valued NULL logic — NULL retry flag means 'never attempted', "
    "so coalesce(flag, false) (SURVEY hard part #4).",
)
def f4_failed_retry_predicate(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").withColumn(
        "is_retry_attempted",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("boolean"))
        .when(F.col("doc_id") % 3 == 1, F.lit(True))
        .otherwise(F.lit(False)),
    )
    return docs.filter(
        F.col("source").like("src1%") & ~F.coalesce(F.col("is_retry_attempted"), F.lit(False))
    ).select("doc_id", "source")


POINT_LOOKUP_KEY = 42


@q(
    "f6_point_lookup",
    f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey = {POINT_LOOKUP_KEY}
    """,
    doc="F6 primary-key point lookup (db.py:307-313); parquet min/max + "
    "predicate pushdown replace the B-tree probe.",
)
def f6_point_lookup(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == POINT_LOOKUP_KEY)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@q(
    "f7_partition_filter",
    """
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'click'
    """,
    doc="F7 per-format equality filter (db.py:508 et al.) — on the real lake "
    "this hits the format_id partition column and prunes directories.",
)
def f7_partition_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "value")
    )


# --------------------------------------------------------------------------
# G — aggregations
# --------------------------------------------------------------------------


@q(
    "g1_high_watermark",
    """
    SELECT event_type, max(ts) AS last_seen_ts
    FROM events GROUP BY event_type
    """,
    doc="G1 per-format high watermark MAX(uploadtime) (db.py:590-594).",
)
def g1_high_watermark(spark, sf_dir):
    return t(spark, sf_dir, "events").groupBy("event_type").agg(F.max("ts").alias("last_seen_ts"))


@q(
    "g2_low_watermark",
    """
    SELECT event_type, min(ts) AS oldest_ts
    FROM events GROUP BY event_type
    """,
    doc="G2 per-format backfill low watermark MIN(uploadtime) (db.py:616-620).",
)
def g2_low_watermark(spark, sf_dir):
    return t(spark, sf_dir, "events").groupBy("event_type").agg(F.min("ts").alias("oldest_ts"))


@q(
    "g3_lifecycle_stats",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
           ROUND(100.0 * sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / count(*), 2)
               AS pct_filled
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="G3 lifecycle stats via conditional aggregation (db.py:642-651): "
    "COUNT(*) + SUM(CASE WHEN flag ...) per group — map-side partial aggs, "
    "one shuffle.",
)
def g3_lifecycle_stats(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    n_filled = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).cast("long").alias("n_open"),
        n_filled.cast("long").alias("n_filled"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).cast("long").alias("n_pending"),
        F.round(100.0 * n_filled / F.count("*"), 2).alias("pct_filled"),
    )


@q(
    "g4_duplicate_detection",
    """
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_copies
    FROM lineitem
    GROUP BY l_orderkey
    HAVING count(*) > 1
    """,
    doc="G4 duplicate detection GROUP BY ... HAVING COUNT(*) > 1 "
    "(cleanup_db.py:130-135).",
)
def g4_duplicate_detection(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").cast("long").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@q(
    "g5_ids_by_date",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           CAST(count(*) AS BIGINT) AS n_ids,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY CAST(event_id AS VARCHAR))
               AS id_list
    FROM events
    GROUP BY 1
    """,
    doc="G5 group-ids-by-derived-date (db.py:690-700): epoch -> yyyy-MM-dd, "
    "collect ids per calendar day (compaction planning). Sorted join for a "
    "deterministic value hash.",
)
def g5_ids_by_date(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("event_date")
        .agg(
            F.count("*").cast("long").alias("n_ids"),
            F.array_join(F.sort_array(F.collect_list(F.col("event_id").cast("string"))), ",").alias(
                "id_list"
            ),
        )
    )


@q(
    "g6_dedup_keep_one",
    """
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM (
        SELECT l_orderkey, l_linenumber, l_partkey,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC,
                            l_extendedprice DESC
               ) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
    doc="G6/W1 dedup keep-one via deterministic window "
    "(cleanup_db.py:148-178; db.py:133-154 migration argmax): "
    "row_number over partitionBy(key) orderBy(desc) = 1.",
)
def g6_dedup_keep_one(spark, sf_dir):
    # full tiebreak chain: (l_orderkey, l_linenumber) is not unique in the
    # synthetic data, and an arbitrary survivor would differ per engine
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_linenumber"), F.desc("l_partkey"), F.desc("l_suppkey"), F.desc("l_extendedprice")
    )
    return (
        t(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


@q(
    "g7_daily_counters",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           ROUND(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="G7 per-date run counters (tasks/compaction.py:121-132): tumbling "
    "daily event-time window as groupBy(derived date).",
)
def g7_daily_counters(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("event_date")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("n_errors"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@q(
    "g9_table_count",
    "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem",
    doc="G9 total table count (cleanup_db.py:43-47).",
)
def g9_table_count(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").agg(F.count("*").cast("long").alias("n_rows"))


@q(
    "g10_throughput_metrics",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT)
               AS duration_sec,
           ROUND(CAST(count(*) AS DOUBLE) /
                 (CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT)), 6)
               AS events_per_sec,
           ROUND(avg(value), 4) AS avg_value
    FROM events
    """,
    doc="G10 throughput metrics (tasks/download.py:246-248, "
    "scripts/calculate_throughput.py:106-117): rate arithmetic over one agg row.",
)
def g10_throughput_metrics(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    agg = e.agg(
        F.count("*").cast("long").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("duration_sec"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    return agg.select(
        "n_events",
        "duration_sec",
        F.round(F.col("n_events").cast("double") / F.col("duration_sec"), 6).alias("events_per_sec"),
        "avg_value",
    )


@q(
    "g11_lifecycle_cube",
    """
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(strftime(ts, '%Y-%m-%d'), '<all>') AS event_date,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(value), 2) AS total_value
    FROM events
    GROUP BY CUBE(event_type, strftime(ts, '%Y-%m-%d'))
    """,
    doc="G3+G7 generalized: CUBE over (format, date) — the natural rollup the "
    "reference computes per-format and per-date separately (db.py:629-664 + "
    "compaction.py:229-232). One pass, partial aggs reused.",
)
def g11_lifecycle_cube(spark, sf_dir):
    e = t(spark, sf_dir, "events").withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
    return (
        e.cube("event_type", "d")
        .agg(F.count("*").cast("long").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("d", F.lit("<all>")).alias("event_date"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# W — windows / top-k
# --------------------------------------------------------------------------


@q(
    "w1_latest_per_key",
    """
    SELECT user_id, event_id, ts, event_type
    FROM (
        SELECT user_id, event_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="W1 latest-event-per-key top-1 (db.py:133-154): argmax by event time "
    "per entity, event_id tiebreak for determinism.",
)
def w1_latest_per_key(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@q(
    "w2_keyset_pagination",
    """
    SELECT event_id, user_id, event_type
    FROM (
        SELECT event_id, user_id, event_type,
               row_number() OVER (ORDER BY event_id) AS rn
        FROM events
    ) WHERE rn BETWEEN 101 AND 200
    """,
    doc="W2 offset pagination (scripts/reset_format_state.py:100-114): "
    "page [101, 200] in event_id order. Scale-safe form: a distributed "
    "top-(offset+page) (TakeOrderedAndProject — per-partition top-k, no "
    "global sort, no full-table window) fetches the first 200 keys, then "
    "row_number runs over only those 200 rows to slice the page. Cost is "
    "O(offset+page) per partition, not O(n) through one task; the "
    "reference's key-ordered batch-copy loop (WHERE key > last LIMIT n) "
    "degenerates to exactly this for a single page.",
)
def w2_keyset_pagination(spark, sf_dir):
    page_end = 200
    head = (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
        .limit(page_end)
    )
    w = Window.orderBy("event_id")  # over <= page_end rows, not the table
    return (
        head.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").between(101, 200))
        .select("event_id", "user_id", "event_type")
    )


@q(
    "w4_head_n",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 5
    """,
    doc="W4 head-n sampling (init_db.py:36-39): deterministic (key-ordered) "
    "LIMIT.",
)
def w4_head_n(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(5)
    )


# --------------------------------------------------------------------------
# U — set operations
# --------------------------------------------------------------------------

SPLIT_TS = "2024-01-15 00:00:00"


@q(
    "u1_union_all",
    f"""
    SELECT event_id, user_id FROM events WHERE ts < TIMESTAMP '{SPLIT_TS}'
    UNION ALL
    SELECT event_id, user_id FROM events WHERE ts >= TIMESTAMP '{SPLIT_TS}'
    """,
    doc="U1 union existing+new before rewrite (tasks/compaction.py:219).",
)
def u1_union_all(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = e.filter(F.col("ts") < F.lit(SPLIT_TS).cast("timestamp"))
    b = e.filter(F.col("ts") >= F.lit(SPLIT_TS).cast("timestamp"))
    return a.unionByName(b).select("event_id", "user_id")


@q(
    "u2_distinct_union",
    """
    SELECT DISTINCT user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id FROM events WHERE event_type = 'view'
    )
    """,
    doc="U2 id-set union across files (scripts/import_existing_replays.py:91-98).",
)
def u2_distinct_union(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    return a.unionByName(b).distinct()


@q(
    "u3_intersect",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="U3 intersection: uncompacted ids in DB vs ids found in files "
    "(scripts/fix_compacted_status.py:196).",
)
def u3_intersect(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@q(
    "u4_except",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="U4 difference: incoming minus existing (db.py:871) — customers "
    "with open but no finished orders. (Keyed so the result is non-empty "
    "at every test scale: a vacuous empty difference can't distinguish a "
    "broken subtract from a working one.)",
)
def u4_except(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)


# --------------------------------------------------------------------------
# C — scalar functions
# --------------------------------------------------------------------------


@q(
    "c1_epoch_to_date",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS event_date
    FROM events
    """,
    doc="C1/C2 epoch->partition-date string (db.py:693-694, download.py:77-78).",
)
def c1_epoch_to_date(spark, sf_dir):
    return t(spark, sf_dir, "events").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    )


@q(
    "c4_batch_id",
    """
    SELECT event_id,
           event_type || '_' || strftime(ts, '%Y%m%d_%H%M%S') AS batch_id
    FROM events
    """,
    doc="C4 batch-id synthesis {format}_{yyyyMMdd_HHmmss} (discovery.py:55).",
)
def c4_batch_id(spark, sf_dir):
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.concat_ws("_", F.col("event_type"), F.date_format("ts", "yyyyMMdd_HHmmss")).alias("batch_id"),
    )


@q(
    "c5_regex_extract",
    """
    SELECT doc_id, regexp_extract(text, 'table ([a-z]+)', 1) AS after_table
    FROM documents
    """,
    doc="C5 regex extraction from log text — pattern of "
    "re.search(r'\\|t:\\|(\\d+)', log) (import_existing_replays.py:46-49).",
)
def c5_regex_extract(spark, sf_dir):
    return t(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_extract("text", "table ([a-z]+)", 1).alias("after_table")
    )


@q(
    "c6_players_concat",
    """
    SELECT c_custkey, concat(c_name, ' vs ', c_mktsegment) AS matchup
    FROM customer
    """,
    doc="C6 players display concat 'p1 vs p2' (db.py:877).",
)
def c6_players_concat(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(
        "c_custkey", F.concat_ws(" vs ", F.col("c_name"), F.col("c_mktsegment")).alias("matchup")
    )


@q(
    "c7_batch_from_details",
    """
    SELECT event_id,
           regexp_extract('retry ok (batch ' || event_type || '_20240101)',
                          '\\(batch ([^)]+)\\)', 1) AS batch_id
    FROM events
    """,
    doc="C7 parse batch id back out of a details message (db.py:171-179).",
)
def c7_batch_from_details(spark, sf_dir):
    details = F.concat(F.lit("retry ok (batch "), F.col("event_type"), F.lit("_20240101)"))
    return t(spark, sf_dir, "events").select(
        "event_id", F.regexp_extract(details, r"\(batch ([^)]+)\)", 1).alias("batch_id")
    )


@q(
    "c8_prefix_predicate",
    """
    SELECT doc_id, source FROM documents WHERE text LIKE 'key %'
    """,
    doc="C8 failure-prefix predicate LIKE 'Failed:%' (db.py:567,648).",
)
def c8_prefix_predicate(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").startswith("key "))
        .select("doc_id", "source")
    )


@q(
    "c10_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
    doc="C10 JSON field access on the open-schema remainder "
    "(db.py:227,317-321 additional_info JSON).",
)
def c10_json_extract(spark, sf_dir):
    return t(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@q(
    "c13_bool_coercion",
    """
    SELECT doc_id,
           coalesce(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE doc_id % 2 = 0 END, FALSE)
               AS flag
    FROM documents
    """,
    doc="C13 three-valued boolean coercion (db.py:169-177,465,490).",
)
def c13_bool_coercion(spark, sf_dir):
    raw = F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("boolean")).otherwise(
        F.col("doc_id") % 2 == 0
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(raw, F.lit(False)).alias("flag")
    )
