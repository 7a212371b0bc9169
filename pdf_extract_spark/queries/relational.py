"""Relational core: joins / aggregations / windows / semi-anti / JSON.

The reference has no SQL engine, but its dataflow is built from these
relational shapes (SURVEY.md §2.3-§2.6): partial+final aggregation (A6
analog), top-k joins (J1 analog), window dedup (W4), anti-join resume
(§2.3 note). These queries exercise them on the TPC-H-ish fixtures where a
clean ANSI oracle exists, at plan shapes that scale: broadcast for dim
tables, hash-agg with map-side partials, `TakeOrderedAndProject` for top-k.

All money/measure sums go through DECIMAL casts (exact, order-insensitive)
per the package determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import register, tbl

_DEC_SUM_QTY = "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
_DEC_SUM_PRICE = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
# discount/tax are 2-decimal in the data; DECIMAL(4,2) factors keep every
# product within int64 unscaled range on the DuckDB side while staying exact
_DISC_PRICE = ("CAST(l_extendedprice AS DECIMAL(12,2)) * "
               "CAST(1.0 - l_discount AS DECIMAL(4,2))")
_CHARGE = _DISC_PRICE + " * CAST(1.0 + l_tax AS DECIMAL(4,2))"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_DEC_SUM_QTY} AS sum_qty,
           {_DEC_SUM_PRICE} AS sum_base_price,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_CHARGE}) AS DOUBLE) AS sum_charge,
           {_DEC_SUM_QTY} / COUNT(*) AS avg_qty,
           {_DEC_SUM_PRICE} / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → partial/final hash agg (SURVEY A6 analog).

    Plan check: filter pushes to the parquet scan; WholeStageCodegen covers
    the whole agg; one shuffle on the 6-value group key.
    """
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate")
                  <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(_DEC_SUM_QTY).alias("sum_qty"),
            F.expr(_DEC_SUM_PRICE).alias("sum_base_price"),
            F.expr(f"CAST(SUM({_DISC_PRICE}) AS DOUBLE)").alias("sum_disc_price"),
            F.expr(f"CAST(SUM({_CHARGE}) AS DOUBLE)").alias("sum_charge"),
            F.expr(f"{_DEC_SUM_QTY} / COUNT(*)").alias("avg_qty"),
            F.expr(f"{_DEC_SUM_PRICE} / COUNT(*)").alias("avg_price"),
            F.expr("CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)")
            .alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast dim join ×2 → agg → top-k.

    `broadcast(customer)` keeps the big lineitem side shuffle-free on the
    first join; top-k compiles to TakeOrderedAndProject (no full sort).
    Tie-break on l_orderkey makes cutoff membership engine-independent.
    """
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp_ntz")
    cust = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust),
                                        orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"CAST(SUM({_DISC_PRICE}) AS DOUBLE)").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle=f"""
    SELECT r_name, n_name, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with broadcast dims (region/nation/
    supplier/customer) so the only shuffle is the lineitem↔orders
    equi-join + agg."""
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.expr(f"CAST(SUM({_DISC_PRICE}) AS DOUBLE)").alias("revenue"))
    )


@register(
    "window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4-shape window dedup/rank (SURVEY §2.5): row_number per key, keep
    top-3. One shuffle on the partition key; no global sort."""
    orders = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice",
                      F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "anti_join_quiet_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the checkpoint-resume primitive (SURVEY §2.3 note:
    the rebuild's lineage resume is exactly this shape): customers with no
    big-ticket order."""
    cust = tbl(spark, sf_dir, "customer")
    orders = (tbl(spark, sf_dir, "orders")
              .filter(F.col("o_totalprice") > 300_000)
              .select("o_custkey"))
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .select("c_custkey", "c_mktsegment"))


@register(
    "semi_join_urgent_customers",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join with a pushed-down filter on the probe side."""
    cust = tbl(spark, sf_dir, "customer")
    orders = (tbl(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .select("c_custkey", "c_acctbal"))


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time rollup + JSON field extraction (SURVEY F8: from_json with
    explicit schema — here get_json_object, the scalar form).

    Hour truncation via make_timestamp_ntz(field extractions), NOT
    date_trunc: Spark casts NTZ→LTZ through the session timezone inside
    date_trunc, shifting results in non-UTC sessions; field extraction on
    NTZ is timezone-free (matches DuckDB's naive date_trunc)."""
    ev = tbl(spark, sf_dir, "events")
    hour_ntz = F.expr(
        "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)")
    return (
        ev.groupBy(hour_ntz.alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
            .alias("sum_value"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        )
    )


@register(
    "events_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL THEN 1
                  WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000 THEN 1 ELSE 0 END AS new_sess
      FROM events)
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag window + conditional sum. The batch
    analog of the streaming session-window operator (§2.10 extension).
    Gap math is timestamp-zone-free (timestampdiff on the NTZ values) so it
    matches DuckDB's naive epoch_ms regardless of session timezone."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.expr("timestampdiff(MILLISECOND, prev_ts, ts)")
    new_sess = F.when(gap.isNull() | (gap > 1_800_000), 1).otherwise(0)
    return (
        ev.withColumn("prev_ts", prev)
        .select("user_id", new_sess.alias("new_sess"))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )


@register(
    "asof_join_events",
    oracle="""
    WITH errors AS (
      SELECT user_id, ts AS err_ts FROM events WHERE event_type = 'error'),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) - epoch_us(e.err_ts) AS us_since_error
    FROM purchases p
    ASOF LEFT JOIN errors e
      ON p.user_id = e.user_id AND p.ts >= e.err_ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — an operator Spark lacks natively (build brief: custom
    operators as compositions): for every purchase, the most recent error
    at-or-before it for the same user. Implemented as the standard
    union-and-carry shape: tag both streams, sort within user by event
    time, carry the last error timestamp forward with last(ignoreNulls)
    over an unbounded-preceding window, keep the probe rows. One shuffle
    on user_id, no range explosion — scales as a plain window.

    The DuckDB oracle is its native ASOF LEFT JOIN, so the composition is
    verified against a first-class implementation. Tie semantics: ties on
    ts are broken so an error at exactly the purchase ts matches (>=);
    within equal timestamps the tagged sort puts errors first."""
    ev = tbl(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("ts").alias("ets"),
                      F.lit(0).alias("side"), F.lit(None).alias("event_id")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("ets"),
                         F.lit(1).alias("side"), "event_id"))
    tagged = errors.unionByName(purchases)
    w = (Window.partitionBy("user_id")
         .orderBy("ets", "side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged.withColumn(
        "last_err_ts",
        F.last(F.when(F.col("side") == 0, F.col("ets")), ignorenulls=True)
        .over(w))
    return (carried.filter(F.col("side") == 1)
            .select(
                F.col("event_id").cast("bigint").alias("event_id"),
                "user_id",
                # timestampdiff on the NTZ values — timezone-free, matching
                # DuckDB's naive epoch_us (an NTZ→LTZ cast + unix_millis
                # would shift across DST in non-UTC sessions); microseconds,
                # because ms would floor each side differently than the diff
                F.expr("timestampdiff(MICROSECOND, last_err_ts, ets)")
                .alias("us_since_error")))


@register(
    "events_grouping_sets",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type, CAST(date_trunc('day', ts) AS DATE)),
                            (event_type), ())
    """,
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets (multi-granularity rollup in one pass): per
    (type, day), per type, and grand total — Catalyst expands the sets and
    keeps map-side partial aggregation; exact DECIMAL sums throughout."""
    ev = tbl(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    return (ev.select("event_type", day, "value")
            .groupingSets([["event_type", "day"], ["event_type"], []],
                          "event_type", "day")
            .agg(F.count("*").alias("n_events"),
                 F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
                 .alias("sum_value")))


@register(
    "part_brand_stats",
    oracle="""
    SELECT p_brand, p_type,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
             / COUNT(*) AS avg_price,
           MAX(p_size) AS max_size
    FROM part
    WHERE p_type LIKE '%ECO%' OR p_size BETWEEN 1 AND 15
    GROUP BY p_brand, p_type
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-table profiling with a disjunctive pushable predicate (LIKE +
    BETWEEN) and exact decimal averaging — completes table coverage of the
    fixture star schema."""
    part = tbl(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("%ECO%")
                    | F.col("p_size").between(1, 15))
        .groupBy("p_brand", "p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.expr("CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)"
                   " / COUNT(*)").alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


@register(
    "median_order_value",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS median_price,
           CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90_price,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate: exact interpolated percentiles (both engines
    implement the same continuous-quantile interpolation over sorted
    values; the raw parquet doubles interpolate identically)."""
    orders = tbl(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
               " AS DOUBLE)").alias("median_price"),
        F.expr("CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
               " AS DOUBLE)").alias("p90_price"),
        F.count("*").alias("n_orders"),
    )


@register(
    "above_avg_customers",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             / COUNT(*)
      FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their nation's average
    balance) — Catalyst decorrelates it into an aggregate + join; exact
    decimal averaging keeps the threshold engine-identical."""
    cust = tbl(spark, sf_dir, "customer")
    return spark.sql("""
        SELECT c_custkey, c_nationkey, c_acctbal FROM {c} c
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*)
          FROM {c} c2 WHERE c2.c_nationkey = c.c_nationkey)
    """, c=cust)


@register(
    "user_set_ops",
    oracle="""
    SELECT 'both' AS segment, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error') a
    UNION ALL
    SELECT 'purchase_only', user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error') b
    """,
)
def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-family at SQL level (SURVEY §2.6): INTERSECT / EXCEPT / UNION ALL
    over user cohorts."""
    ev = tbl(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errs = ev.filter(F.col("event_type") == "error").select("user_id")
    both = purch.intersect(errs).select(F.lit("both").alias("segment"),
                                        "user_id")
    # subtract = set EXCEPT (exceptAll is bag semantics: a user with 3
    # purchases and 1 error would survive it — not what EXCEPT means)
    only = purch.subtract(errs).select(
        F.lit("purchase_only").alias("segment"), "user_id")
    return both.unionByName(only)


@register(
    "events_pivot",
    oracle="""
    SELECT user_id % 10 AS cohort,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup
    FROM events GROUP BY user_id % 10
    """,
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide rollup): one pass, conditional aggregates per event type
    (the FILTER form keeps both engines in plain hash-agg, no pivot
    operator needed)."""
    ev = tbl(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ("view", "click", "purchase", "error", "signup")
    ]
    return (ev.groupBy((F.col("user_id") % 10).alias("cohort"))
            .agg(*aggs))
