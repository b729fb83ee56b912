"""Relational operator catalog over the driver's TPC-H-ish tables — one
entry per operator family in SURVEY.md §2, each with a DuckDB oracle.

Scale notes baked into the plans:
- dimension joins (region/nation/queries) are explicitly ``broadcast``;
- top-k is always window ``row_number`` with a full deterministic tie-break,
  never a bare LIMIT over a partial order;
- doubles in outputs are rounded on BOTH sides so cross-engine float
  summation noise cannot flip the driver's value hash;
- timestamps leave outputs as epoch micros (exact integers) or formatted
  date strings, never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style grouped aggregation (A6/A10: grouped sums/avgs/counts,
    features.py:137-168, data/queries/queries.sql:1-5)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark, sf_dir):
    """Shipping-priority join + top-10 (J3/J4 multi-table equi join + T1
    ordered limit, definitions_sql.py:22-26, queries.sql:16-30)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, orderdate
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def semi_join_customers(spark, sf_dir):
    """left_semi — EXISTS (J4 IN-subquery semi-join, queries.sql:8-10)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def anti_join_customers(spark, sf_dir):
    """left_anti — NOT EXISTS; the engine's cache-miss/resume predicate
    (P5 'not processed yet', features.py:427-445; J1 miss branch,
    util.py:948-1009).  Customers with no FINISHED ('F') order: in the
    fixture every customer has some order, so the round-2 unconditioned
    anti-join checked 0 == 0 rows (vacuous — round-2 verdict); the status
    predicate makes the miss set non-empty at every test SF."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def window_topk_parts(spark, sf_dir):
    """Per-group top-3 via row_number (W5 ranked result_seq,
    util.py:977-982; T2 per-term result cap, features.py:288-296)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "rn", "p_partkey", F.round("p_retailprice", 2).alias("price"))
    )


WINDOW_TOPK_SQL = """
SELECT p_brand, CAST(rn AS INT) AS rn, p_partkey, round(p_retailprice, 2) AS price
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
)
WHERE rn <= 3
"""


def lag_lead_events(spark, sf_dir):
    """prev/next row context (J6 adjacency join, horus_to_conll.py:43-46;
    W4 lag/lead CRF features with BOS/EOS, benchmarking.py:135-159)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(F.lag("event_type").over(w), F.lit("BOS")).alias("prev_type"),
        F.coalesce(F.lead("event_type").over(w), F.lit("EOS")).alias("next_type"),
    )


LAG_LEAD_SQL = """
SELECT event_id, user_id, event_type,
       coalesce(lag(event_type) OVER w, 'BOS') AS prev_type,
       coalesce(lead(event_type) OVER w, 'EOS') AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def running_sum_events(spark, sf_dir):
    """Prefix sum within partition (W3 char-offset accumulation,
    util.py:704-706)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


RUNNING_SUM_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
       AS running_value
FROM events
"""


def sessionize_events(spark, sf_dir):
    """Gap-based sessionization — the W1 run-length/BIO merge pattern
    (lag + change-flag + running sum; util.py:1104-1229) on a 30-min gap."""
    # parquet stores TIMESTAMP_NTZ; session TZ is UTC so the cast is identity
    ev = _t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.col("us") - F.lag("us").over(w) > 1_800_000_000, 1
        ).otherwise(F.when(F.lag("us").over(w).isNull(), 1).otherwise(0)),
    ).withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
              WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       max(us) - min(us) AS dur_us
FROM sess GROUP BY user_id, session_id
"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_counts(spark, sf_dir):
    """Per-key class-vote counts pivoted to columns (A1: per-term counts of
    classes 1..3 over retrieved docs, features.py:452-456)."""
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in _EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(*aggs)


PIVOT_SQL = f"""
SELECT user_id,
  {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""


def argmax_event_type(spark, sf_dir):
    """Argmax class per key (A3: gpb.index(max(gpb)), features.py:456;
    T4 MAX-vote, queries.sql:23-30).  Tie-break: type asc."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "n")
    )


ARGMAX_SQL = """
SELECT user_id, event_type AS top_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


def top2_margin(spark, sf_dir):
    """Margin between best and 2nd-best class (A4: heapq.nlargest(2) margin
    'confidence', features.py:376-383,468-471)."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    ranked = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    return ranked.groupBy("user_id").agg(
        (F.max(F.when(F.col("rn") == 1, F.col("n"))) -
         F.coalesce(F.max(F.when(F.col("rn") == 2, F.col("n"))), F.lit(0))).alias("margin")
    )


TOP2_MARGIN_SQL = """
WITH ranked AS (
  SELECT user_id, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
  FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type)
)
SELECT user_id,
       CAST(max(CASE WHEN rn = 1 THEN n END)
            - coalesce(max(CASE WHEN rn = 2 THEN n END), 0) AS BIGINT) AS margin
FROM ranked WHERE rn <= 2 GROUP BY user_id
"""


def region_customer_rollup(spark, sf_dir):
    """Two-hop dimension join + rollup count (F11 broadcast map lookup,
    nlp_tools.py:74-86; J4 multi-table join).  Dims broadcast explicitly."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


REGION_ROLLUP_SQL = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def json_extract_props(spark, sf_dir):
    """JSON decode at the boundary (F10: json.loads of TEXT columns,
    util.py:755-759)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
"""


def case_shape_features(spark, sf_dir):
    """Scalar shape features (F1-F3: case predicates / length / specials,
    horus_to_conll.py:49-57, horusdemo.py:59-63)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_name").contains(" "), 1).otherwise(0).alias("has_space"),
        F.element_at(F.split("p_name", " "), 1).alias("first_token"),
        F.upper("p_name").alias("name_upper"),
        F.when(F.col("p_type").rlike("[0-9]"), 1).otherwise(0).alias("type_has_digit"),
    )


CASE_SHAPE_SQL = """
SELECT p_partkey,
       CAST(length(p_name) AS INT) AS name_len,
       CASE WHEN contains(p_name, ' ') THEN 1 ELSE 0 END AS has_space,
       string_split(p_name, ' ')[1] AS first_token,
       upper(p_name) AS name_upper,
       CASE WHEN regexp_matches(p_type, '[0-9]') THEN 1 ELSE 0 END AS type_has_digit
FROM part
"""


def tumbling_window_events(spark, sf_dir):
    """Tumbling 1-hour windowed counts — the batch form of the streaming
    watermarked aggregation (streaming/incremental.py; same function runs
    on the stream).  Reference analog: none (reference is batch-only,
    SURVEY.md §2.9)."""
    from horus_ner_spark.streaming.incremental import windowed_event_counts

    return windowed_event_counts(spark, _t(spark, sf_dir, "events"))


TUMBLING_WINDOW_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2, 3
"""


ENTRIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_orders": (q3_top_orders, Q3_SQL),
    "semi_join_customers": (semi_join_customers, SEMI_JOIN_SQL),
    "anti_join_customers": (anti_join_customers, ANTI_JOIN_SQL),
    "window_topk_parts": (window_topk_parts, WINDOW_TOPK_SQL),
    "lag_lead_events": (lag_lead_events, LAG_LEAD_SQL),
    "running_sum_events": (running_sum_events, RUNNING_SUM_SQL),
    "sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    "pivot_event_counts": (pivot_event_counts, PIVOT_SQL),
    "argmax_event_type": (argmax_event_type, ARGMAX_SQL),
    "top2_margin": (top2_margin, TOP2_MARGIN_SQL),
    "region_customer_rollup": (region_customer_rollup, REGION_ROLLUP_SQL),
    "json_extract_props": (json_extract_props, JSON_EXTRACT_SQL),
    "case_shape_features": (case_shape_features, CASE_SHAPE_SQL),
    "tumbling_window_events": (tumbling_window_events, TUMBLING_WINDOW_SQL),
}
