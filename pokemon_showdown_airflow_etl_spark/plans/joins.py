"""Join-layer queries (SURVEY.md section 2.3) plus headline analytic joins.

The reference does all of its "joins" as set operations over id
collections pulled into Python (IN-lists, dict probes, set differences);
here each becomes the canonical distributed join shape: broadcast hash
join for small dims, left-semi/anti for existence/difference, and
sort-merge (AQE-managed) for fact-fact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Query, t
from ..pinning import pin

QUERIES: list[Query] = []


def q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn

    return deco


SPLIT_TS = "2024-01-20 00:00:00"


@q(
    "j1_existence_flag",
    """
    SELECT c.c_custkey,
           (o.o_custkey IS NOT NULL) AS has_order
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') o
      ON c.c_custkey = o.o_custkey
    """,
    doc="J1 bulk existence check (db.py:702-734): id-list -> flag map with "
    "missing ids defaulting to false; IN-list probe becomes a left join + "
    "IS NOT NULL (broadcast when the id set is small).",
)
def j1_existence_flag(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .distinct()
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", F.col("o_custkey").isNotNull().alias("has_order")
    )


@q(
    "j2_ingest_anti_join",
    """
    SELECT DISTINCT o_custkey AS new_key FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_acctbal > 0 AND c.c_custkey = o.o_custkey
    )
    """,
    doc="J2 idempotent-ingest anti-join (db.py:853-912): insert only rows "
    "whose key is not already present — incoming LEFT ANTI existing "
    "registry. Keys here are ordering customers absent from the "
    "positive-balance registry subset (a deliberately NON-empty result: "
    "an all-overlapping split would make the check vacuous).",
)
def j2_ingest_anti_join(spark, sf_dir):
    incoming = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("new_key"))
    existing = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("new_key"))
    )
    return incoming.join(existing, "new_key", "left_anti").distinct()


@q(
    "j3_compaction_anti_join",
    """
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderstatus = 'F' AND o.o_orderkey = l.l_orderkey
    )
    """,
    doc="J3 compaction dedup anti-join (tasks/compaction.py:158-180): skip "
    "records already present in the existing compacted day file.",
)
def j3_compaction_anti_join(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    done = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return l.join(done, l.l_orderkey == done.o_orderkey, "left_anti").select(
        "l_orderkey", "l_linenumber"
    )


@q(
    "j4_reconcile_semi_join",
    """
    SELECT o.o_orderkey
    FROM orders o
    WHERE o.o_orderstatus = 'P'
      AND EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey
      )
    """,
    doc="J4 reconciliation intersect (scripts/fix_compacted_status.py:196): "
    "left-semi join of candidate ids against observed ids.",
)
def j4_reconcile_semi_join(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select("o_orderkey")


@q(
    "j5_broadcast_lookup",
    """
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="J5 metadata broadcast lookup (tasks/download.py:164-172): the "
    "driver-side dict probe becomes an explicit broadcast hash join — no "
    "shuffle of the big side.",
)
def j5_broadcast_lookup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@q(
    "j7_membership_flag",
    """
    SELECT p.p_partkey,
           (l.l_partkey IS NOT NULL) AS is_used
    FROM part p
    LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) l
      ON p.p_partkey = l.l_partkey
    """,
    doc="J7 membership flag join (scripts/import_existing_replays.py:183-188): "
    "is_compacted = id IN compacted_ids.",
)
def j7_membership_flag(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    used = t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    return p.join(used, p.p_partkey == used.l_partkey, "left").select(
        "p_partkey", F.col("l_partkey").isNotNull().alias("is_used")
    )


@q(
    "j8_star_join_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Headline star join (TPC-H Q5 shape): fact-fact sort-merge join on "
    "orderkey, then broadcast joins up the dimension chain; grouped revenue. "
    "Exercises join reordering, broadcast selection, partial aggregation.",
)
def j8_star_join_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(l_quantity), 2) AS sum_qty,
           ROUND(sum(l_extendedprice), 2) AS sum_base_price,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(avg(l_quantity), 4) AS avg_qty,
           ROUND(avg(l_extendedprice), 4) AS avg_price,
           ROUND(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Headline scan-heavy aggregation (TPC-H Q1 shape) — the classic "
    "conditional-aggregation lifecycle-stats generalization (G3 at scale): "
    "one scan, map-side partials, tiny shuffle.",
)
def q1_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").cast("long").alias("count_order"),
    )


Q3_CUTOFF = "1998-06-01 00:00:00"


@q(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
      AND l.l_shipdate  > TIMESTAMP '{Q3_CUTOFF}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): selective date predicates "
    "pushed to both scans, customer-orders-lineitem join chain, grouped "
    "revenue, deterministic top-10 (revenue desc, orderkey tie-break). "
    "Exercises pushdown + join ordering + global TopK (Spark plans "
    "TakeOrderedAndProject, not a full sort).",
)
def q3_shipping_priority(spark, sf_dir):
    cutoff = F.lit(Q3_CUTOFF).cast("timestamp")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking): EXISTS decorrelates "
    "to a LEFT SEMI join with an equi key (orderkey) plus a non-equi "
    "residual (shipped >90 days after order) — the semi-join shape J2/J4 "
    "use, but with a residual predicate evaluated inside the join. The "
    "date range prunes the orders scan before the join.",
)
def q4_order_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").cast("long").alias("order_count"))


Q5_REGION = "ASIA"


@q(
    "q5_local_supplier_volume",
    f"""
    SELECT n.n_name AS nation,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 proper (local supplier volume): the 6-way join whose "
    "distinguishing edge is the customer-supplier SAME-NATION condition "
    "(c_nationkey = s_nationkey) riding on the supplier join — j8 "
    "without that edge is just a star. Fact-fact SMJ on orderkey, "
    "broadcast dims, region filter pruned up the chain.",
)
def q5_local_supplier_volume(spark, sf_dir):
    cutlo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cuthi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi)
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q18_MIN_QTY = 210


@q(
    "q18_top_customers",
    f"""
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > {Q18_MIN_QTY}
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(b.total_qty, 2) AS total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume customers): aggregate-then-filter "
    "(HAVING over a fact groupBy) feeding a join back to orders and "
    "customer, deterministic global top-20 by price (orderkey "
    "tie-break). The HAVING side shrinks the fact table BEFORE any join, "
    "and the top-k plans as TakeOrderedAndProject, not a full sort.",
)
def q18_top_customers(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@q(
    "q6_forecast_revenue",
    """
    SELECT ROUND(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): the pure scan-filter "
    "benchmark — every predicate pushes to the parquet scan (range on "
    "shipdate, band on discount, bound on quantity), zero joins, one "
    "2-value aggregate. The query that measures scan + pushdown "
    "efficiency and nothing else.",
)
def q6_forecast_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


Q7_NATION_A = "NATION_12"
Q7_NATION_B = "NATION_11"


@q(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
        OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping): bidirectional nation-pair "
    "trade volume by ship year. The disjunctive cross-nation predicate "
    "can only be applied AFTER both nation joins, so the plan quality "
    "question is keeping the two nation lookups broadcast (they are — "
    "25 rows, constant in SF) while supplier — which GROWS with SF — "
    "is left to AQE: broadcast at small scale, shuffle join at 100 TB. "
    "The shipdate range still pushes to the scan.",
)
def q7_volume_shipping(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B))
        | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@q(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(18, 6))
                          * (1 - CAST(l.l_discount AS DECIMAL(18, 6)))), 2)
                AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned item reporting): customers who "
    "returned the most revenue in a quarter. returnflag + orderdate "
    "predicates both push to their scans BEFORE the fact-fact join; "
    "nation is broadcast; the global top-20 plans as "
    "TakeOrderedAndProject (per-partition top-k), never a full sort. "
    "Revenue accumulates in DECIMAL so the sum is exact and "
    "partition-order-independent — a double sum rounds differently "
    "at half-cent boundaries depending on reduction order.",
)
def q10_returned_items(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@q(
    "q19_disjunctive_revenue",
    """
    SELECT ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "three brand/size/quantity condition branches OR-ed across BOTH "
    "sides of a part-lineitem join. The single-table implications ARE "
    "extractable (brand IN (...), size <= 35, quantity <= 30) and "
    "Catalyst derives them, pruning both scans before the join; the "
    "full disjunction evaluates as the join residual. Part grows with "
    "SF, so the join strategy is AQE's call (broadcast while the "
    "pruned side fits, shuffle at 100 TB), not a hard-coded hint.",
)
def q19_disjunctive_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n_items"),
        )
    )


@q(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey % 10 AS INT) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(ROUND(sum(CAST(c.c_acctbal AS DECIMAL(18, 2))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape (global sales opportunity): well-funded "
    "customers DORMANT since 2000 (no order after the cutoff — the "
    "testdata's every customer has old orders, so the unwindowed "
    "NOT EXISTS is vacuous), grouped by country code (nationkey mod "
    "10; no phone column). Two classic shapes composed: a scalar "
    "aggregate subquery joined as a broadcast 1-row cross join (no "
    "driver-side collect of the average), and a LEFT ANTI join "
    "against the date-filtered orders for NOT EXISTS.",
)
def q22_global_sales_opportunity(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@q(
    "j10_asof_last_click",
    """
    WITH clicks AS (
        SELECT user_id, ts, max(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), purch AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           ROUND(c.click_value, 4) AS last_click_value
    FROM purch p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join (a primitive Spark lacks; DuckDB's native ASOF JOIN "
    "is the oracle): every purchase event picks up the value of the "
    "same user's most recent at-or-before click, NULL when none "
    "exists. Implemented as the distributed merge-asof "
    "(operators/temporal.py:asof_join): union both sides, ONE window "
    "per user carries the click value forward, keep the purchase rows "
    "— each input shuffles once on user_id, no inequality nested "
    "loop, no correlated per-row subquery. The click side is "
    "pre-aggregated to one row per (user, ts) with max(value) — an "
    "order-independent tie-break both engines share. For keys whose "
    "full history exceeds one task's sort, asof_join_sliced bounds "
    "partition work by time-slice density (property-tested value-"
    "identical to this plan).",
)
def j10_asof_last_click(spark, sf_dir):
    from ..operators.temporal import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purch, clicks, on="user_id", carry={"click_value": "last_click_value"}
    )
    return out.select(
        "event_id", "user_id", "ts", F.round("last_click_value", 4).alias("last_click_value")
    )


@q(
    "j11_range_follow_events",
    """
    WITH signups AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'signup'
    ), matched AS (
        SELECT s.event_id, s.user_id,
               e.event_id AS r_id,
               CAST(round(e.value * 10000) AS BIGINT) AS v_ten_thousandths
        FROM signups s
        JOIN events e
          ON e.user_id = s.user_id
         AND e.ts >= s.ts
         AND e.ts < s.ts + INTERVAL 1 DAY
         AND e.event_id != s.event_id
    )
    SELECT s.event_id, s.user_id,
           CAST(count(m.r_id) AS BIGINT) AS n_follow,
           coalesce(CAST(sum(m.v_ten_thousandths) AS BIGINT), 0)
               AS follow_value_1e4
    FROM signups s LEFT JOIN matched m ON s.event_id = m.event_id
    GROUP BY 1, 2
    """,
    doc="Band range join (the other missing temporal primitive; the "
    "oracle is DuckDB's inequality join): for every signup, how many "
    "same-user events land in the following 24h and their total value. "
    "Implemented bucketed (operators/temporal.py:range_join_bucketed): "
    "time quantizes to band-width buckets, the probe side explodes "
    "into its two candidate buckets, the join is an EQUI-join on "
    "(user_id, bucket) with the exact band predicate as a residual "
    "filter — never a nested-loop/cartesian plan, and per-partition "
    "work is bounded by the band's event density. Values quantize to "
    "1e-4 integer units BEFORE summing (like j9) so the aggregate is "
    "reduction-order-exact in both engines; zero-match signups "
    "survive via the left join back to the anchor set.",
)
def j11_range_follow_events(spark, sf_dir):
    from ..operators.temporal import range_join_bucketed

    ev = t(spark, sf_dir, "events")
    # signups anchors BOTH the range join's left side and the final
    # zero-match left join — pinned so events is scanned once for the
    # anchor set and once for the probe side, not three times
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("event_id", "user_id", "ts")
        .transform(pin)
    )
    right = ev.select("event_id", "user_id", "ts", "value")
    pairs = range_join_bucketed(
        signups,
        right,
        on="user_id",
        band_seconds=86400,
        carry={"event_id": "r_id", "value": "r_value"},
    ).filter(F.col("r_id") != F.col("event_id"))
    agg = pairs.groupBy("event_id").agg(
        F.count("r_id").cast("long").alias("n_follow"),
        F.sum(F.round(F.col("r_value") * 10000).cast("long"))
        .cast("long")
        .alias("follow_value_1e4"),
    )
    return (
        signups.join(agg, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_follow", F.lit(0)).cast("long").alias("n_follow"),
            F.coalesce("follow_value_1e4", F.lit(0))
            .cast("long")
            .alias("follow_value_1e4"),
        )
    )


@q(
    "j12_asof_last_click_sliced",
    """
    WITH clicks AS (
        SELECT user_id, ts, max(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), purch AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           ROUND(c.click_value, 4) AS last_click_value
    FROM purch p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="The partition-bounded as-of join "
    "(operators/temporal.py:asof_join_sliced) on j10's exact task and "
    "oracle: time quantizes into daily slices, the carry decomposes "
    "into a within-slice window partitioned by (user, slice), a per-"
    "(user, slice) last-click aggregate, and a strict slice-level "
    "as-of over the small per-slice frames — so one task sorts one "
    "slice of one key, never a key's whole history. This is the "
    "variant that matters at 100 TB: the plain merge-asof (j10) puts "
    "a key's ENTIRE history in one task's sort; a hot key with 1e8 "
    "events breaks that, while here per-task work is bounded by slice "
    "density and the slice width is the knob. Value-identical to j10 "
    "by construction (property-tested across random configs plus the "
    "NULL-carry case) and hash-checked against DuckDB's native ASOF "
    "JOIN here.",
)
def j12_asof_last_click_sliced(spark, sf_dir):
    from ..operators.temporal import asof_join_sliced

    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_sliced(
        purch,
        clicks,
        on="user_id",
        slice_seconds=86400,
        carry={"click_value": "last_click_value"},
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.round("last_click_value", 4).alias("last_click_value"),
    )
