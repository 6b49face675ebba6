"""Relational operator queries over the driver testdata tables, each with a
DuckDB oracle twin (SURVEY.md §2 rows J*, A*, W*, T*, U*, F*, P*).

Conventions for hash-stable oracle comparison:
- money aggregates go through DECIMAL(18,2) so sums are exact and
  order-independent (double sums are not associative);
- every computed column is aliased identically on both sides;
- timestamps are projected as DATE/strings, never raw (session TZ pinned
  to UTC anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.geo import haversine_km


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A: aggregations ---------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary as a ROLLUP (groupBy + multi-agg +
    subtotals + grand total; absorbs the r02 ``rollup_orders`` row so the
    registry fits the driver's 50-row CORRECTNESS budget).
    Decimal-typed sums keep the value hash exact across engines."""
    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(c * 100).cast("long")  # noqa: E731
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
                 F.sum(cents(F.col("l_extendedprice")))
                 .alias("sum_base_price_c"),
                 F.sum(cents(F.col("l_extendedprice")
                             * (F.lit(1.0) - F.col("l_discount"))))
                 .alias("sum_disc_price_c"),
                 F.count("*").alias("count_order"))
            .select(F.coalesce("l_returnflag", F.lit("ALL"))
                    .alias("ret_flag"),
                    F.coalesce("l_linestatus", F.lit("ALL"))
                    .alias("line_status"),
                    "sum_qty_c", "sum_base_price_c", "sum_disc_price_c",
                    "count_order")
            .orderBy("ret_flag", "line_status"))


SQL_PRICING = """
SELECT coalesce(l_returnflag, 'ALL') AS ret_flag,
       coalesce(l_linestatus, 'ALL') AS line_status,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
           AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY ret_flag, line_status
"""


def q_minmax_ids(spark, sf_dir):
    """A2: MAX-based id assignment (reference get_last_mid,
    csv_reader.py:41-47): max key + dense continuation. Scale-safe form —
    range-partitioned per-partition row_number + cumulative offsets
    (operators/ids.py), NOT a global single-reducer Window.orderBy."""
    from ..operators.ids import assign_global_ids
    c = _t(spark, sf_dir, "customer")
    mx = c.agg(F.max("c_custkey").alias("mx"))
    seg = c.filter(F.col("c_mktsegment") == "BUILDING")
    numbered = assign_global_ids(seg, ["c_name", "c_custkey"], out="_rid",
                                 n_parts=8)
    return (numbered.crossJoin(F.broadcast(mx))
            .select("c_custkey", "c_name",
                    (F.col("_rid") + F.col("mx")).cast("long")
                    .alias("new_id"))
            .orderBy("new_id"))


SQL_MINMAX = """
SELECT c_custkey, c_name,
       row_number() OVER (ORDER BY c_name, c_custkey)
           + (SELECT max(c_custkey) FROM customer) AS new_id
FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY new_id
"""


# --- J: joins ----------------------------------------------------------------


def q_broadcast_dim_join(spark, sf_dir):
    """J1: fact-to-dimension broadcast hash joins (orders->customer->nation
    ->region), revenue by region/priority. The fact side never shuffles for
    the join (verify: BroadcastHashJoin in .explain)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region_name"),
                     F.col("o_orderpriority").alias("priority"))
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .alias("revenue_c"))
            .orderBy("region_name", "priority"))


SQL_BROADCAST_JOIN = """
SELECT r_name AS region_name, o_orderpriority AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY region_name, priority
ORDER BY region_name, priority
"""


def q_anti_join(spark, sf_dir):
    """J4 + J5 existence joins in one row (merged r3 for the driver's
    50-row budget): the anti half (customers that never ordered — the
    reference already_present dedup gate) unioned with the semi half
    (parts that ship — endpoint-existence gating), tagged by ``kind``."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    never = (c.join(o.select(F.col("o_custkey").alias("c_custkey")),
                    "c_custkey", "left_anti")
             .select(F.lit("anti_never_ordered").alias("kind"),
                     F.col("c_custkey").cast("long").alias("key"),
                     F.col("c_name").alias("name")))
    ships = (p.join(li.select(F.col("l_partkey").alias("p_partkey")),
                    "p_partkey", "left_semi")
             .select(F.lit("semi_part_ships").alias("kind"),
                     F.col("p_partkey").cast("long").alias("key"),
                     F.col("p_name").alias("name")))
    return never.unionByName(ships).orderBy("kind", "key")


SQL_ANTI_JOIN = """
SELECT * FROM (
    SELECT 'anti_never_ordered' AS kind,
           CAST(c_custkey AS BIGINT) AS key, c_name AS name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'semi_part_ships' AS kind,
           CAST(p_partkey AS BIGINT) AS key, p_name AS name
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem))
ORDER BY kind, key
"""


def q_explode_membership_join(spark, sf_dir):
    """J2: array-membership join via explode (reference match_with_wikidata
    `b.wid IN a.wids`): explode p_name tokens, join to a token dimension
    derived from p_type words, count parts per token."""
    p = _t(spark, sf_dir, "part")
    toks = (p.select(F.explode(F.split("p_name", " ")).alias("token"),
                     "p_partkey"))
    dim = (p.select(F.explode(F.split("p_type", " ")).alias("token"))
           .distinct())
    return (toks.join(F.broadcast(dim), "token")
            .groupBy("token")
            .agg(F.countDistinct("p_partkey").alias("n_parts"))
            .orderBy("token"))


SQL_EXPLODE_JOIN = """
WITH toks AS (
    SELECT unnest(string_split(p_name, ' ')) AS token, p_partkey FROM part),
dim AS (SELECT DISTINCT unnest(string_split(p_type, ' ')) AS token FROM part)
SELECT t.token, count(DISTINCT t.p_partkey) AS n_parts
FROM toks t JOIN dim USING (token)
GROUP BY t.token ORDER BY t.token
"""


def q_levenshtein_theta_join(spark, sf_dir):
    """J6/J7/F10: theta similarity join with levenshteinSimilarity > 0.3
    (reference connect_story_by_textual_sim, db_connection.py:382-404);
    tiny sides -> broadcast cross join, similarity as an exact fraction."""
    n = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("a"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_name").alias("b"))
    pairs = n.crossJoin(F.broadcast(s))
    sim = (F.lit(1.0) - F.levenshtein("a", "b")
           / F.greatest(F.length("a"), F.length("b")))
    return (pairs.withColumn("similarity",
                             F.round(sim, 6))
            .filter(F.col("similarity") > 0.3)
            .orderBy("a", "b"))


SQL_LEV_JOIN = """
SELECT n_name AS a, s_name AS b,
       round(1.0 - levenshtein(n_name, s_name) /
             greatest(length(n_name), length(s_name)), 6) AS similarity
FROM nation, supplier
WHERE 1.0 - levenshtein(n_name, s_name) /
      greatest(length(n_name), length(s_name)) > 0.3
ORDER BY a, b
"""


# --- W: windows ---------------------------------------------------------------


def q_window_order_rank(spark, sf_dir):
    """W1/W2: per-customer order sequencing (row_number + running decimal
    sum under the stable (custkey, date, key) ordering)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.withColumn("order_seq", F.row_number().over(w))
            .withColumn("running_spend_c",
                        F.sum(F.round(F.col("o_totalprice") * 100)
                              .cast("long"))
                        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .select("o_custkey", "o_orderkey", "order_seq",
                    "running_spend_c")
            .orderBy("o_custkey", "order_seq"))


SQL_WINDOW_RANK = """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS order_seq,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS running_spend_c
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_seq
"""


# --- T: top-k -----------------------------------------------------------------


def q_topk_per_group(spark, sf_dir):
    """Top-3 orders per priority class (window rank + filter — the
    distributed form of per-seed top-k) UNION the global top-25
    (``priority='ALL'``), absorbing the r02 ``topk_orders`` row. The
    global half is ORDER BY + LIMIT, which must plan as
    TakeOrderedAndProject — never a global sort (the reference sorts
    everything and slices in Python, db/db_search.py:237; pinned in
    test_plans.py)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    per_group = (o.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <= 3)
                 .select(F.col("o_orderpriority").alias("priority"),
                         "rk", "o_orderkey",
                         F.col("o_totalprice").alias("price")))
    top_global = (o.select("o_orderkey",
                           F.col("o_totalprice").alias("price"))
                  .orderBy(F.col("price").desc(),
                           F.col("o_orderkey").asc())
                  .limit(25)
                  .withColumn("rk", F.row_number().over(
                      Window.orderBy(F.col("price").desc(),
                                     F.col("o_orderkey").asc())))
                  .select(F.lit("ALL").alias("priority"), "rk",
                          "o_orderkey", "price"))
    return per_group.unionByName(top_global).orderBy("priority", "rk")


def topk_global_plan_probe(spark, sf_dir):
    """The global-top-k half alone, for the TakeOrderedAndProject plan
    assertion (the union adds a rank window on the 25 survivors, which is
    fine — the heavy scan side still takes the top-k path)."""
    o = _t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_custkey",
                     F.col("o_totalprice").alias("price"))
            .orderBy(F.col("price").desc(), F.col("o_orderkey").asc())
            .limit(25))


SQL_TOPK_PER_GROUP = """
SELECT * FROM (
    SELECT o_orderpriority AS priority, rk, o_orderkey, price FROM (
        SELECT o_orderpriority, o_orderkey,
               o_totalprice AS price,
               row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders) WHERE rk <= 3
    UNION ALL
    SELECT 'ALL' AS priority, rk, o_orderkey, price FROM (
        SELECT o_orderkey, o_totalprice AS price,
               row_number() OVER (ORDER BY o_totalprice DESC,
                                  o_orderkey ASC) AS rk
        FROM orders) WHERE rk <= 25)
ORDER BY priority, rk
"""


# --- U: set operations ---------------------------------------------------------


def q_union_dedup(spark, sf_dir):
    """U1 + U3 set operations in one row (merged r3). ``op='union'``:
    union of two overlapping filtered scans deduped on the key, ``n`` =
    how many source branches carried it (reference Europeana
    lat/lon-scan U keyword-scan, collisions collapsed by the id
    constraint). ``op='except_all'``: multiset difference counts
    (candidate minus materialized, the resume anti-join shape)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    union_part = (a.unionByName(b)
                  .groupBy("o_orderkey")
                  .agg(F.count("*").alias("n"))
                  .select(F.lit("union").alias("op"),
                          F.col("o_orderkey").cast("long").alias("key"),
                          "n"))
    big = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey")
    except_part = (big.exceptAll(urgent)
                   .groupBy("o_custkey").agg(F.count("*").alias("n"))
                   .select(F.lit("except_all").alias("op"),
                           F.col("o_custkey").cast("long").alias("key"),
                           "n"))
    return union_part.unionByName(except_part).orderBy("op", "key")


SQL_UNION_DEDUP = """
SELECT * FROM (
    SELECT 'union' AS op, CAST(o_orderkey AS BIGINT) AS key,
           count(*) AS n
    FROM (SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
          UNION ALL
          SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY o_orderkey
    UNION ALL
    SELECT 'except_all' AS op, CAST(o_custkey AS BIGINT) AS key,
           count(*) AS n
    FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 150000
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY o_custkey)
ORDER BY op, key
"""


# --- F/P: scalar functions ------------------------------------------------------


def q_scalar_functions(spark, sf_dir):
    """P2/P7/F4/F12 parity in one projection: md5-derived commonsMedia URL
    (recursive_hops_ingestion.py:81-89), P7 label cleaning, URL tail
    extraction (db_connection.py:232-239)."""
    p = _t(spark, sf_dir, "part")
    fn = F.regexp_replace(F.col("p_name"), " ", "_")
    h = F.md5(fn)
    url = F.concat(F.lit("https://upload.wikimedia.org/wikipedia/commons/"),
                   F.substring(h, 1, 1), F.lit("/"),
                   F.substring(h, 1, 2), F.lit("/"), fn)
    cleaned = F.regexp_replace(F.col("p_type"), "[^a-zA-Z0-9 \n\\.]", "")
    cleaned = F.regexp_replace(cleaned, " ", "_")
    cleaned = F.regexp_replace(cleaned, "3", "three")
    tail = F.element_at(F.split(url, "/"), -1)
    return (p.select("p_partkey", url.alias("image_url"),
                     cleaned.alias("cleaned_type"),
                     tail.alias("url_tail"))
            .orderBy("p_partkey"))


SQL_SCALAR_FUNCS = """
SELECT p_partkey,
       'https://upload.wikimedia.org/wikipedia/commons/' ||
           substr(md5(replace(p_name, ' ', '_')), 1, 1) || '/' ||
           substr(md5(replace(p_name, ' ', '_')), 1, 2) || '/' ||
           replace(p_name, ' ', '_') AS image_url,
       replace(replace(regexp_replace(p_type, '[^a-zA-Z0-9 \n.]', '', 'g'),
               ' ', '_'), '3', 'three') AS cleaned_type,
       list_extract(string_split(
           'https://upload.wikimedia.org/wikipedia/commons/' ||
           substr(md5(replace(p_name, ' ', '_')), 1, 1) || '/' ||
           substr(md5(replace(p_name, ' ', '_')), 1, 2) || '/' ||
           replace(p_name, ' ', '_'), '/'), -1) AS url_tail
FROM part ORDER BY p_partkey
"""


# --- geo (J3/F5/T1) -------------------------------------------------------------


def _customer_geo(spark, sf_dir):
    """Deterministic synthetic coordinates derived from c_custkey (integer
    arithmetic -> bit-identical in both engines)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 73 % 36000) / 100.0 - 180.0).alias("lon"))

_GEO_SQL = """
geo AS (SELECT c_custkey,
               (c_custkey * 37 % 18000) / 100.0 - 90.0 AS lat,
               (c_custkey * 73 % 36000) / 100.0 - 180.0 AS lon
        FROM customer)
"""


def q_geo_topk(spark, sf_dir):
    """T1: k nearest customers to a fixed point, haversine distance
    (reference get_top_closest, db/db_search.py:261-288); distance rounded
    to 1e-4 km for cross-engine hash stability."""
    g = _customer_geo(spark, sf_dir)
    d = haversine_km(F.lit(41.9), F.lit(12.5), F.col("lat"), F.col("lon"))
    return (g.withColumn("dist_km", F.round(d, 4))
            .filter(F.col("dist_km") < 5000)
            .orderBy("dist_km", "c_custkey")
            .limit(50)
            .select("c_custkey", "dist_km"))


SQL_GEO_TOPK = """
WITH """ + _GEO_SQL + """
SELECT c_custkey,
       round(2 * 6371.0088 * asin(sqrt(
           sin(radians(lat - 41.9) / 2) ^ 2 +
           cos(radians(41.9)) * cos(radians(lat)) *
           sin(radians(lon - 12.5) / 2) ^ 2)), 4) AS dist_km
FROM geo
WHERE round(2 * 6371.0088 * asin(sqrt(
           sin(radians(lat - 41.9) / 2) ^ 2 +
           cos(radians(41.9)) * cos(radians(lat)) *
           sin(radians(lon - 12.5) / 2) ^ 2)), 4) < 5000
ORDER BY dist_km, c_custkey LIMIT 50
"""


def relational_queries() -> dict:
    return {
        "pricing_summary": q_pricing_summary,
        "minmax_ids": q_minmax_ids,
        "broadcast_dim_join": q_broadcast_dim_join,
        "anti_join": q_anti_join,
        "explode_membership_join": q_explode_membership_join,
        "levenshtein_theta_join": q_levenshtein_theta_join,
        "window_order_rank": q_window_order_rank,
        "topk_per_group": q_topk_per_group,
        "union_dedup": q_union_dedup,
        "scalar_functions": q_scalar_functions,
        "geo_topk": q_geo_topk,
    }


def relational_oracle_sql() -> dict:
    return {
        "pricing_summary": SQL_PRICING,
        "minmax_ids": SQL_MINMAX,
        "broadcast_dim_join": SQL_BROADCAST_JOIN,
        "anti_join": SQL_ANTI_JOIN,
        "explode_membership_join": SQL_EXPLODE_JOIN,
        "levenshtein_theta_join": SQL_LEV_JOIN,
        "window_order_rank": SQL_WINDOW_RANK,
        "topk_per_group": SQL_TOPK_PER_GROUP,
        "union_dedup": SQL_UNION_DEDUP,
        "scalar_functions": SQL_SCALAR_FUNCS,
        "geo_topk": SQL_GEO_TOPK,
    }
