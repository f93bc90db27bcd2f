"""Relational query surface — SURVEY.md §2b (Q1-Q24).

The reference delegates this entire surface to Postgres via its ``-q`` SQL
string (reference src/lib.rs:39-40, prepare/execute at
src/pg_arrow_source.rs:221,240); here each operator is a native
DataFrame/Spark-SQL plan optimized by Catalyst.  Every query is registered
with an equivalent ANSI-SQL oracle for DuckDB.

Determinism rules applied throughout (see queries/__init__.py docstring):
aliases match the oracle exactly; derived doubles rounded; year()/length()
etc. cast to BIGINT on the Spark side because DuckDB returns BIGINT where
Spark returns INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lakehouse_loader_spark.catalog import load_table, register_views
from lakehouse_loader_spark.queries import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1 scan + projection + aliasing  (reference test: column cherry-picking,
# tests/basic_integration.rs:77)
# --------------------------------------------------------------------------
@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey AS okey, l_linenumber AS lineno,
           l_extendedprice AS price, l_returnflag AS rflag
    FROM lineitem
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table scan with column pruning + aliasing; Catalyst pushes the
    4-column ReadSchema into the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("rflag"),
    )


# --------------------------------------------------------------------------
# Q2 filters: AND/OR, comparison, IN, BETWEEN, LIKE, IS NOT NULL
# --------------------------------------------------------------------------
@query(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' OR o_orderpriority LIKE '1-%')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_custkey IS NOT NULL
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate pushdown: all four conjuncts reach the parquet
    scan as PushedFilters."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") | F.col("o_orderpriority").like("1-%"))
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# Q3 computed projections: arithmetic, CASE WHEN, casts
# (reference tests: `cint8 + 1` basic_integration.rs:130, `::text` cast
# basic_integration.rs:150)
# --------------------------------------------------------------------------
@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS disc_price,
           CASE WHEN l_quantity > 25 THEN 'big'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS qty_class,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           l_quantity + 1 AS qty_plus
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column arithmetic, CASE WHEN, int→string cast — the computed-column
    surface the reference pushes through its SQL string."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        # round at scale 4 = the exact decimal scale of a 2-dec × 2-dec
        # product: no true half-way ties exist, so Spark and DuckDB round
        # identically (scale 2 WOULD tie on half-cents and diverge)
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("disc_price"),
        F.when(F.col("l_quantity") > 25, "big")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        (F.col("l_quantity") + 1).alias("qty_plus"),
    )


# --------------------------------------------------------------------------
# Q4 inner equi join (fact→dim) + aggregate
# --------------------------------------------------------------------------
@query(
    "join_inner",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS segment_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("segment_total"),
        )
    )


# --------------------------------------------------------------------------
# Q5 left outer join + aggregate (null-preserving side)
# --------------------------------------------------------------------------
@query(
    "join_outer",
    oracle="""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_big_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS big_total
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey AND o_totalprice > 150000
    GROUP BY c_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a join-side filter so some customers keep zero
    matches; COUNT(col) skips the nulls the outer join introduces."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("big_total"),
        )
    )


# --------------------------------------------------------------------------
# Q5b full outer join with nulls on both sides
# --------------------------------------------------------------------------
@query(
    "join_full_outer",
    oracle="""
    SELECT big.k AS big_key, rich.k AS rich_key
    FROM (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 250000) big
    FULL JOIN (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000) rich
      ON big.k = rich.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("k")).distinct()
    rich = c.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    return big.join(rich, big.k == rich.k, "full").select(
        big.k.alias("big_key"), rich.k.alias("rich_key")
    )


# --------------------------------------------------------------------------
# Q6 semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------
@query(
    "join_semi_anti",
    oracle="""
    SELECT 'semi' AS tag, c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    UNION ALL
    SELECT 'anti' AS tag, c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("tag"), "c_custkey")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("tag"), "c_custkey")
    )
    return semi.unionAll(anti)


# --------------------------------------------------------------------------
# Q7 broadcast join: star-schema dim chain broadcast to the fact scan
# --------------------------------------------------------------------------
@query(
    "join_broadcast",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim chain (supplier⋈nation⋈region) broadcast so the lineitem fact
    never shuffles for the join — the 100 TB-scale plan: one shuffle total
    (the final groupBy), all joins map-side."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dims = s.join(n, s.s_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q8 non-equi (range/theta) join condition alongside the equi key
# --------------------------------------------------------------------------
@query(
    "join_range_theta",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual: Catalyst keeps the equi part as the join
    key (sort-merge/shuffled-hash scales) and evaluates the range predicate
    as a post-join filter — the scalable shape for temporal-range joins."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return o.join(li, cond).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late"))


# --------------------------------------------------------------------------
# Q9 hash aggregate: sum/avg/min/max/count (partial+final built in)
# --------------------------------------------------------------------------
@query(
    "agg_hash",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q10 COUNT(DISTINCT) — expand+two-phase distinct aggregation
# --------------------------------------------------------------------------
@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# approx_count_distinct is HLL++-based; the raw estimate is engine-specific
# (DuckDB's sketch differs), so — like the DataSketches trio
# (pipeline.py:agg_sketch_distinct_theta) — the driver-checked output
# carries the EXACT count plus a within_bound flag: the estimate must land
# within 5% of exact (rsd=0.02 ⇒ ~2% at 1σ; HLL++ is exact below its sparse
# threshold, so 5% is deterministic headroom).  A drifting sketch turns the
# driver row red.  tests/test_queries.py additionally bounds the error.
@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supp,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the scale path when exact distinct's
    expand-shuffle is too expensive at 100 TB.  Oracle contract (r7): exact
    count hash-compared, estimate asserted within its published bound."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("exact_supp"),
        (
            F.abs(
                F.approx_count_distinct("l_suppkey", rsd=0.02)
                - F.countDistinct("l_suppkey")
            )
            <= 0.05 * F.countDistinct("l_suppkey")
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# Q11 rollup / cube / grouping sets
# --------------------------------------------------------------------------
@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q12 ranking window functions
# --------------------------------------------------------------------------
@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
             CAST(ROW_NUMBER() OVER w_uniq AS BIGINT) AS rn,
             CAST(RANK() OVER w_qty AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w_qty AS BIGINT) AS drnk,
             CAST(NTILE(4) OVER w_uniq AS BIGINT) AS quartile
      FROM lineitem
      WINDOW w_uniq AS (PARTITION BY l_returnflag
                        ORDER BY l_quantity DESC, l_orderkey, l_linenumber),
             w_qty  AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
    ) WHERE rn <= 20
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/ntile over a fully tie-broken order (deterministic);
    rank/dense_rank over the non-unique quantity order (ties share ranks,
    also deterministic).

    Decomposed (r16, guide §2.5): the literal 4-window form partitions by
    ``l_returnflag`` — THREE distinct values, so the whole fact sorts in 3
    tasks regardless of cluster width (task-metrics: 1.22s task time vs
    1.56s wall on 32 cores — serial; at 100 TB a 3-partition full sort is
    the query).  Every output column is recoverable from the tiny
    (flag, quantity) histogram plus a within-(flag, quantity) tie
    row_number, whose window has |flags|·|distinct qty| ≈ 150 partitions:
    - rank  = 1 + Σ cnt of strictly-greater quantities (histogram cumsum);
    - dense_rank = position of the quantity among distinct ones;
    - row_number = (rank - 1) + tie row_number (ties broken by the
      globally-unique (l_orderkey, l_linenumber), so exact);
    - ntile(4) = closed-form tile arithmetic from the flag's row count
      (first n%4 tiles carry ⌈n/4⌉ rows, the rest ⌊n/4⌋).
    Identical rows to the window form (oracle-hash-checked at
    sf0.001/0.01/0.1); the histogram/tie decomposition is exact because
    rank ties are exactly quantity-equality classes."""
    li = _t(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_h = W.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    ranks = hist.select(
        "l_returnflag",
        "l_quantity",
        (
            F.coalesce(
                F.sum("cnt").over(w_h.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            )
            + 1
        ).alias("rnk"),
        F.row_number().over(w_h).cast("bigint").alias("drnk"),
        F.sum("cnt").over(W.partitionBy("l_returnflag")).alias("n_f"),
    )
    w_tie = W.partitionBy("l_returnflag", "l_quantity").orderBy(
        "l_orderkey", "l_linenumber"
    )
    rn = F.col("rnk") - 1 + F.col("tie")
    tiles = F.floor(F.col("n_f") / 4)
    rem = F.col("n_f") % 4
    bound = lambda t: F.lit(t) * tiles + F.least(F.lit(t), rem)  # noqa: E731
    quartile = (
        F.when(rn <= bound(1), 1)
        .when(rn <= bound(2), 2)
        .when(rn <= bound(3), 3)
        .otherwise(4)
    )
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("tie", F.row_number().over(w_tie))
        .join(F.broadcast(ranks), ["l_returnflag", "l_quantity"])
        .filter(rn <= 20)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            rn.cast("bigint").alias("rn"),
            F.col("rnk").cast("bigint").alias("rnk"),
            "drnk",
            quartile.cast("bigint").alias("quartile"),
        )
    )


# --------------------------------------------------------------------------
# Q13 analytic window functions: lag/lead + running frame sums
# --------------------------------------------------------------------------
@query(
    "window_analytic",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           LAG(l_quantity)  OVER w AS prev_qty,
           LEAD(l_quantity) OVER w AS next_qty,
           ROUND(SUM(l_extendedprice) OVER
                 (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_price,
           ROUND(AVG(l_extendedprice) OVER
                 (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg3
    FROM lineitem
    WHERE l_suppkey <= 25
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 25)
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.round(F.sum("l_extendedprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_price"
        ),
        F.round(F.avg("l_extendedprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


# --------------------------------------------------------------------------
# Q14 global sort + limit → TakeOrderedAndProject (no full sort at scale)
# --------------------------------------------------------------------------
@query(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT compiles to TakeOrderedAndProject: per-partition
    top-k then a k-row merge on the driver — no global shuffle-sort."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q15 set operations
# --------------------------------------------------------------------------
@query(
    "set_ops",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nkey FROM customer WHERE c_acctbal > 8000),
         sn AS (SELECT DISTINCT s_nationkey AS nkey FROM supplier)
    SELECT 'union' AS tag, nkey FROM (SELECT nkey FROM cn UNION SELECT nkey FROM sn)
    UNION ALL
    SELECT 'intersect' AS tag, nkey FROM (SELECT nkey FROM cn INTERSECT SELECT nkey FROM sn)
    UNION ALL
    SELECT 'except' AS tag, nkey FROM (SELECT nkey FROM cn EXCEPT SELECT nkey FROM sn)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cn = c.filter(F.col("c_acctbal") > 8000).select(F.col("c_nationkey").alias("nkey")).distinct()
    sn = s.select(F.col("s_nationkey").alias("nkey")).distinct()
    return (
        cn.union(sn).distinct().select(F.lit("union").alias("tag"), "nkey")
        .unionAll(cn.intersect(sn).select(F.lit("intersect").alias("tag"), "nkey"))
        .unionAll(cn.exceptAll(sn).select(F.lit("except").alias("tag"), "nkey"))
    )


# --------------------------------------------------------------------------
# Q16 DISTINCT / dedup on a key subset (deterministic keep-first)
# --------------------------------------------------------------------------
@query(
    "distinct_dedup_keys",
    oracle="""
    SELECT c_mktsegment, c_nationkey, c_custkey AS first_custkey
    FROM (
      SELECT c_mktsegment, c_nationkey, c_custkey,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment, c_nationkey
                                ORDER BY c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
)
def distinct_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates keeps an arbitrary row, so the deterministic form is
    row_number()=1 over an explicit order — same shape dedup uses at scale."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment", "c_nationkey").orderBy("c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", "c_nationkey", F.col("c_custkey").alias("first_custkey"))
    )


# --------------------------------------------------------------------------
# Q17 string function family
# --------------------------------------------------------------------------
@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           p_brand || '#' || p_type AS brand_type,
           UPPER(p_name) AS uname,
           SUBSTRING(p_name, 1, 5) AS name5,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           TRIM('  ' || p_name || ' ') AS trimmed,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels,
           REPLACE(p_type, 'E', '3') AS leet
    FROM part
    WHERE p_name LIKE '%e%'
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%e%")).select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.replace(F.col("p_type"), F.lit("E"), F.lit("3")).alias("leet"),
    )


# --------------------------------------------------------------------------
# Q18 date/time function family
# --------------------------------------------------------------------------
@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
           CAST(ISODOW(o_orderdate) AS BIGINT) AS iso_dow,
           STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_day
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic matching the reference's timestamp fixtures
    (reference tests/postgres-init-scripts/init-pg-data.sql:42-44); outputs
    formatted as strings so both engines hash identically."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")).select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_dow"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_day"),
    )


# --------------------------------------------------------------------------
# Q19 math function family
# --------------------------------------------------------------------------
@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * 0.1, 3) AS price_tenth,
           ROUND(ABS(l_discount - 0.05), 4) AS disc_dev,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           l_orderkey % 7 AS okey_mod,
           l_quantity * l_quantity AS qty_sq,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        # price has 2 true decimals, so ROUND(price, 1) would tie on .X5
        # exactly; price*0.1 has 3 true decimals → scale-3 round is tie-free
        F.round(F.col("l_extendedprice") * 0.1, 3).alias("price_tenth"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_floor"),
        (F.col("l_orderkey") % 7).alias("okey_mod"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
    )


# --------------------------------------------------------------------------
# Q20 JSON extraction from a string column
# --------------------------------------------------------------------------
@query(
    "scalar_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("k_sum"),
        F.max(k).cast("bigint").alias("k_max"),
    )


# --------------------------------------------------------------------------
# Q21 array higher-order functions over embeddings
# --------------------------------------------------------------------------
@query(
    "array_map_ops",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS BIGINT) AS dim,
           embedding[1] AS first_elem,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vec_norm,
           CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS n_pos
    FROM embeddings
    """,
)
def array_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/aggregate/filter) — the
    JVM-side path for vector math, no Python UDF in the loop."""
    emb = _t(spark, sf_dir, "embeddings")
    x_d = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x_d(x)), 4
        ).alias("vec_sum"),
        F.round(
            F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x_d(x) * x_d(x))), 4
        ).alias("vec_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )


# --------------------------------------------------------------------------
# Q22 scalar + correlated subqueries (Catalyst decorrelates)
# --------------------------------------------------------------------------
_Q22_SQL = """
SELECT c.c_custkey, c.c_acctbal,
       (SELECT ROUND(AVG(c2.c_acctbal), 6)
        FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c3.c_acctbal) FROM customer c3)
"""


@query("subquery_scalar_correlated", oracle=_Q22_SQL)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical ANSI SQL on both engines; Catalyst rewrites the correlated
    scalar subquery into an aggregate+join (RewriteCorrelatedScalarSubquery)."""
    register_views(spark, sf_dir, only=["customer"])
    return spark.sql(_Q22_SQL)


# --------------------------------------------------------------------------
# Q23 flagship: TPC-H Q1-like pricing summary (entry() smoke query)
# --------------------------------------------------------------------------
@query(
    "tpch_q1_like",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter → hash agg (partial+final) → tiny sort.
    One shuffle of ~6 grouped rows per partition — scale-optimal."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # big money sums round at 2: at ~1e9 magnitude a double's ulp is
            # ~2e-7, so rounding at 4-6 decimals sits inside summation-order
            # noise between engines (caught by the sf0.1 oracle sweep)
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q24 flagship: TPC-H Q3-like 3-way join + agg + top-k
# --------------------------------------------------------------------------
@query(
    "tpch_q3_like",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority query: filtered dims broadcast into the fact scan,
    single agg shuffle, top-k via TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q11b explicit GROUPING SETS + GROUPING() marker
# --------------------------------------------------------------------------
_GS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("agg_grouping_sets_explicit", oracle=_GS_SQL)
def agg_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation — identical
    ANSI SQL on both engines."""
    register_views(spark, sf_dir, only=["lineitem"])
    return spark.sql(_GS_SQL)


# --------------------------------------------------------------------------
# Q9b pivot (wide aggregation)
# --------------------------------------------------------------------------
@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = grouped conditional aggregation; explicit value list keeps
    the plan single-pass (no distinct-value pre-scan) — required at scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_o", "F": "qty_f"})
    )


# --------------------------------------------------------------------------
# Q9c exact percentiles (interpolated), grouped
# --------------------------------------------------------------------------
@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_median,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation
    over the sorted group)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("qty_median"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("price_p90"),
    )


# --------------------------------------------------------------------------
# Q13b RANGE window frame (value-based; tie-inclusive ⇒ order-independent)
# --------------------------------------------------------------------------
@query(
    "window_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROUND(SUM(l_extendedprice) OVER
                 (PARTITION BY l_returnflag ORDER BY l_quantity
                  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS price_in_qty_band
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over quantity values: every row whose quantity is within
    5 of the current row's joins the frame — tie rows always included, so
    the result is deterministic without a unique ordering."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    w = (
        W.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-5, W.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("price_in_qty_band"),
    )


# --------------------------------------------------------------------------
# Q20b JSON → typed struct + map functions
# --------------------------------------------------------------------------
@query(
    "scalar_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0 AS k_even,
           array_to_string(json_keys(props), ',') AS prop_keys
    FROM events
    WHERE event_id % 25 = 0
    """,
)
def scalar_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct + field access + key listing — the
    schema-full JSON path (scalar_json covers the schemaless one)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    parsed = F.from_json("props", "k BIGINT")
    as_map = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        (parsed.getField("k") % 2 == 0).alias("k_even"),
        F.concat_ws(",", F.map_keys(as_map)).alias("prop_keys"),
    )


# --------------------------------------------------------------------------
# Q20c VARIANT: Spark 4's open semi-structured type
# --------------------------------------------------------------------------
@query(
    "scalar_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS BIGINT) AS missing_path,
           'BIGINT' AS k_type,
           FALSE AS k_is_null
    FROM events
    WHERE event_id % 31 = 0
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT — Spark 4's binary semi-structured type (the open-format
    answer to schemaless JSON columns): parse_json builds the variant
    once, then typed path extraction (variant_get), lenient extraction of
    a missing path (try_variant_get → NULL, never an error),
    schema_of_variant type introspection and is_variant_null.  Unlike
    from_json, the variant keeps the full value tree in a typed binary
    encoding, so repeated path reads skip re-parsing — the hot-path shape
    for JSON-heavy event tables at scale.  The oracle recomputes every
    extraction from the raw JSON text (DuckDB has no variant type — the
    ENCODING is engine-internal, the extraction SEMANTICS are not)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 31 == 0)
    v = F.parse_json("props")
    parsed = e.select("event_id", v.alias("v"))
    return parsed.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_val"),
        F.try_variant_get("v", "$.does_not_exist", "bigint").alias("missing_path"),
        F.schema_of_variant(F.variant_get("v", "$.k", "variant")).alias("k_type"),
        F.is_variant_null(F.variant_get("v", "$.k", "variant")).alias("k_is_null"),
    )


# --------------------------------------------------------------------------
# Q23b flagship: TPC-H Q6-like forecasting revenue change (pure scan-agg)
# --------------------------------------------------------------------------
@query(
    "tpch_q6_like",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue query: every predicate pushes into the scan;
    single-row global aggregate — the minimal-shuffle extreme."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q24b flagship: TPC-H Q5-like local-supplier revenue (5-way star join)
# --------------------------------------------------------------------------
@query(
    "tpch_q5_like",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume: the full 6-table star; every dim chain is
    broadcast so lineitem flows through map-side joins into one agg
    shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sdim = s.join(n, s.s_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q24c flagship: TPC-H Q10-like returned-item ranking
# --------------------------------------------------------------------------
@query(
    "tpch_q10_like",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report: join + agg + top-20 (TakeOrderedAndProject)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q9d ordered string aggregation + arg_min/arg_max + FILTER clause
# --------------------------------------------------------------------------
@query(
    "agg_ordered_collect",
    oracle="""
    SELECT o_orderpriority,
           string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big
    FROM orders
    WHERE o_orderkey <= 200
    GROUP BY o_orderpriority
    """,
)
def agg_ordered_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect (sort_array∘collect_list — deterministic where raw
    collect_list is not), min_by/max_by, and conditional-count FILTER."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderstatus")), ",").alias("statuses"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
    )


# --------------------------------------------------------------------------
# Q17b second string-function family
# --------------------------------------------------------------------------
@query(
    "scalar_string2",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, p_type) AS name_type_dist,
           translate(p_brand, '#B', '-b') AS brand_tr,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           reverse(p_name) AS rname,
           CAST(instr(p_name, 'e') AS BIGINT) AS first_e,
           repeat(left(p_type, 2), 2) AS type2x,
           right(p_name, 3) AS name_tail,
           p_name LIKE '%bolt%' AS is_bolt,
           starts_with(p_type, 'ECO') AS is_eco
    FROM part
    WHERE p_partkey <= 500
    """,
)
def scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("name_type_dist"),
        F.translate("p_brand", "#B", "-b").alias("brand_tr"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse("p_name").alias("rname"),
        F.instr("p_name", "e").cast("bigint").alias("first_e"),
        F.repeat(F.substring("p_type", 1, 2), 2).alias("type2x"),
        F.substring("p_name", -3, 3).alias("name_tail"),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
        F.startswith(F.col("p_type"), F.lit("ECO")).alias("is_eco"),
    )


# --------------------------------------------------------------------------
# Q21b second array-function family over document tokens
# --------------------------------------------------------------------------
@query(
    "array_ops2",
    oracle=r"""
    SELECT doc_id,
           list_sort(list_distinct(string_split_regex(text, '\s+')))[1] AS first_token,
           CAST(list_position(string_split_regex(text, '\s+'), 'the') AS BIGINT) AS the_pos,
           array_to_string(list_slice(list_sort(list_distinct(string_split_regex(text, '\s+'))), 1, 3), '|')
             AS first3_sorted,
           CAST(len(flatten([string_split_regex(text, '\s+'), ['<eos>']])) AS BIGINT) AS n_plus_eos
    FROM documents
    WHERE doc_id < 100
    """,
)
def array_ops2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_array / array_position / slice / flatten over token arrays
    (both engines return 0 from array_position/list_position on a miss)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", r"\s+")
    sorted_distinct = F.sort_array(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.element_at(sorted_distinct, 1).alias("first_token"),
        F.array_position(toks, "the").cast("bigint").alias("the_pos"),
        F.array_join(F.slice(sorted_distinct, 1, 3), "|").alias("first3_sorted"),
        F.size(F.flatten(F.array(toks, F.array(F.lit("<eos>"))))).cast("bigint").alias(
            "n_plus_eos"
        ),
    )


# --------------------------------------------------------------------------
# Q19b null-handling + bitwise function families
# --------------------------------------------------------------------------
@query(
    "scalar_null_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           IFNULL(NULLIF(l_linestatus, l_linestatus), 'same') AS always_same,
           xor(l_orderkey, l_partkey) AS keys_xor,
           l_orderkey & 255 AS key_low_byte,
           l_orderkey | 1 AS key_odd,
           l_partkey << 2 AS pk_shl,
           l_partkey >> 1 AS pk_shr
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
)
def scalar_null_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_or_none"),
        F.ifnull(F.nullif("l_linestatus", "l_linestatus"), F.lit("same")).alias("always_same"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("keys_xor"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("key_low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(1)).alias("key_odd"),
        F.shiftleft(F.col("l_partkey"), 2).alias("pk_shl"),
        F.shiftright(F.col("l_partkey"), 1).alias("pk_shr"),
    )


# --------------------------------------------------------------------------
# Q1b unpivot / melt (wide → long)
# --------------------------------------------------------------------------
@query(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
          FROM lineitem WHERE l_orderkey <= 100)
    UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )


# --------------------------------------------------------------------------
# Arbitrary-SQL passthrough — the reference's ENTIRE query surface is a
# user-provided SQL string executed verbatim (src/lib.rs:39-40); this
# declared query runs the reference's own e2e test-query shapes
# (select-star-order-by basic_integration.rs:28, computed column :130,
# cast :150) natively.
# --------------------------------------------------------------------------
_PASSTHROUGH_SQL = """
SELECT l_orderkey + 1 AS okey_plus,
       CAST(l_orderkey AS STRING) AS okey_str,
       l_quantity, l_returnflag
FROM lineitem
WHERE l_linenumber = 1
ORDER BY l_orderkey
LIMIT 500
"""


@query("sql_passthrough", oracle=_PASSTHROUGH_SQL)
def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-SQL-string execution: identical ANSI SQL text runs on Spark SQL
    and the oracle — the native replacement for the reference's pushdown-
    everything-to-Postgres model."""
    register_views(spark, sf_dir, only=["lineitem"])
    return spark.sql(_PASSTHROUGH_SQL)


# --------------------------------------------------------------------------
# Q12b distribution window functions: percent_rank / cume_dist
# --------------------------------------------------------------------------
@query(
    "window_distribution",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(NTILE(10) OVER w AS BIGINT) AS decile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rank/n) are ratios of exact integer counts — single IEEE
    divisions, engine-bit-identical without rounding; fully tie-broken
    order makes the ranks themselves deterministic."""
    sup = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return sup.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )


# --------------------------------------------------------------------------
# TPC-H-flavored widening (round 5).  The reference's query surface is
# "whatever SQL the user pushes to Postgres" (src/lib.rs:39-40); TPC-H is
# the acknowledged benchmark TODO at src/lib.rs:203.  These five queries
# cover the decision shapes the earlier tpch_*_like set missed: EXISTS
# decorrelation (q4), a 6-way join with a symmetric nation-pair disjunct
# (q7), conditional-aggregate ratios (q12/q14), HAVING-driven semi-join
# back into the fact (q18), disjunctive mixed-table predicates (q19), and
# scalar-subquery + anti-join (q22).
# --------------------------------------------------------------------------
@query(
    "tpch_q4_like",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority count with an EXISTS subquery: Catalyst rewrites the
    correlated EXISTS into a left-semi hash join on l_orderkey; the date
    range prunes the orders scan before the join."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_like",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-shipping 6-way join: the two nation dims broadcast, the
    symmetric nation-pair disjunct survives as a post-join filter, and the
    fact flows through a single agg shuffle keyed on (nation, nation,
    year) — no shuffle on the raw fact beyond the orders/customer joins."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q12_like",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipmode-style conditional counts (adapted to l_returnflag — the
    testdata carries no l_shipmode): CASE-WHEN aggregates fold into the
    partial hash agg, so the only full-width shuffle is the orders join."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q14_like",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                   / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def tpch_q14_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-revenue ratio: part broadcasts into the pruned lineitem scan;
    both sums reduce map-side, and the final division is a single scalar —
    rounding at 4 sits far inside the ratio's summation-order noise."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q18_like",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: the HAVING subquery reduces to a small key
    set that semi-joins back into the fact (one extra agg shuffle on
    l_orderkey, AQE-broadcast for the semi side at this selectivity)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_like",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed-table predicates: per-table halves of each
    disjunct (brand+size / quantity) can't be pushed below the join as a
    whole, but Catalyst extracts the common-column OR-bounds; part
    broadcasts so the disjunction evaluates map-side."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q22_like",
    oracle="""
    SELECT cntry, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT SUBSTR(c_name, 16, 2) AS cntry, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
    ) rich
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntry
    ORDER BY cntry
    """,
)
def tpch_q22_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + anti-join (q22 adapted: cntrycode from the name
    suffix, 'no urgent order' for 'no order' — every testdata customer has
    orders): the AVG reduces to a one-row broadcast that cross-joins into
    the filter (kept lazy — no eager scalar collect at plan-build time),
    NOT EXISTS becomes a left-anti hash join on the pre-filtered urgent
    orders."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(F.substring("c_name", 16, 2).alias("cntry"), "c_acctbal")
        .groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
# each other — the semantics dimension the plain equi-join family above
# deliberately lacks (its NULL keys match nothing).
# --------------------------------------------------------------------------
@query(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE o_orderkey % 5 END AS k
      FROM orders WHERE o_orderkey <= 200),
    b AS (
      SELECT CASE WHEN v = 5 THEN NULL ELSE v END AS k,
             CONCAT('g', COALESCE(CAST(v AS VARCHAR), 'null')) AS tag
      FROM (SELECT unnest(range(0, 6)) AS v))
    SELECT a.o_orderkey, b.tag
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY a.o_orderkey, b.tag
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eqNullSafe join: rows whose derived key is NULL join the NULL-keyed
    dim row (a plain equi-join would drop them).  Catalyst still plans a
    hash join — NullSafeEqual is a valid equi-key, so no nested-loop
    fallback and the same one-shuffle shape at scale."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    a = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("o_orderkey") % 5)
        .alias("k"),
    )
    b = spark.range(0, 6).select(
        F.when(F.col("id") == 5, F.lit(None).cast("bigint")).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("g"), F.coalesce(F.col("id").cast("string"), F.lit("null"))).alias("tag"),
    )
    return (
        a.join(F.broadcast(b), a["k"].eqNullSafe(b["k"]))
        .select("o_orderkey", "tag")
        .orderBy("o_orderkey", "tag")
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4.1 WITH RECURSIVE): hierarchy rollup — ancestor
# closure over a deterministic binary-tree parent fn (parent(k)=(k-1) div 2
# over the 25 nations), then per-subtree supplier aggregation.  The classic
# org-chart/bill-of-materials shape no single-pass operator expresses.
# --------------------------------------------------------------------------
_RECURSIVE_SPARK_SQL = """
WITH RECURSIVE anc AS (
  SELECT CAST(n_nationkey AS BIGINT) AS node, CAST(n_nationkey AS BIGINT) AS anc
  FROM nation
  UNION ALL
  SELECT node, CAST((anc - 1) DIV 2 AS BIGINT) FROM anc WHERE anc > 0
)
SELECT CAST(anc AS BIGINT) AS subtree_root,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nations,
       CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers,
       ROUND(SUM(s_acctbal), 2) AS total_bal
FROM anc LEFT JOIN supplier ON s_nationkey = node
GROUP BY anc ORDER BY subtree_root
"""


@query(
    "recursive_hierarchy_rollup",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT n_nationkey AS node, n_nationkey AS anc FROM nation
      UNION ALL
      SELECT node, (anc - 1) // 2 FROM anc WHERE anc > 0
    )
    SELECT CAST(anc AS BIGINT) AS subtree_root,
           CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nations,
           CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM anc LEFT JOIN supplier ON s_nationkey = node
    GROUP BY anc ORDER BY subtree_root
    """,
)
def recursive_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE ancestor closure + subtree aggregation: every nation
    contributes its suppliers to each ancestor's rollup.  Recursion depth
    is the tree height (≈log₂ n — 5 levels here), each step one join on
    the frontier; the closure is |nodes|·height rows, never materialized
    quadratically.  Only SQL syntax differs from the oracle (DIV vs //
    integer division)."""
    register_views(spark, sf_dir, only=["nation", "supplier"])
    return spark.sql(_RECURSIVE_SPARK_SQL)


# --------------------------------------------------------------------------
# TPC-H flavored widening, round 5: q8/q9/q13/q15/q17/q21 shapes over the
# available tables (no partsupp/commitdate in the testdata — adaptations
# keep each query's defining plan shape and are noted per query).
# --------------------------------------------------------------------------
@query(
    "tpch_q8_like",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (q8): the fraction of AMERICA's PROMO-part
    import volume supplied by NATION_5, per order year.  Plan shape: every
    dim (part, supplier, both nation copies, region) broadcasts; the fact
    shuffles only for the orders/customer joins and once for the year agg;
    the share is a conditional-sum ratio folded into one hash aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_like",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (q9, adapted: the testdata has no partsupp, so
    profit is revenue without the supply-cost term).  part/supplier/nation
    broadcast; the fact takes one shuffle for orders and one agg shuffle
    keyed (nation, year)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "tpch_q13_like",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (q13): LEFT join keeps zero-order
    customers (count(o_orderkey) = 0 for the all-null group), double
    aggregation — per-customer counts, then the histogram.  The join
    predicate's non-key conjunct stays IN the join (filtering afterwards
    would wrongly drop the null-extended rows)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_like",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (q15): quarterly per-supplier revenue, then the rows
    matching the global max (the view + scalar-subquery shape).  Revenue
    rounds to 2 BEFORE the max comparison so the float equality is between
    identically-rounded values in both engines.  The scalar max broadcasts
    back as a one-row join, not a driver collect."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(F.broadcast(revenue), s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(top), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_like",
    oracle="""
    SELECT ROUND(SUM(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#23'
      AND l1.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def tpch_q17_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (q17): lineitems below 20% of their
    part's average quantity.  The correlated scalar subquery decorrelates
    to a per-part average join; quantities are integer-valued doubles, so
    the 0.2·avg threshold is bit-identical in both engines (exact integer
    sums, one division).  The brand filter broadcasts; the per-part
    average reuses the already-filtered fact — one agg + one join shuffle
    on l_partkey."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("q_thresh")
    )
    return (
        li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("q_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "tpch_q21_like",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waiting-supplier count (q21, adapted: no commit/receipt dates in the
    testdata, so "kept everyone waiting" becomes "shipped strictly last
    among the order's suppliers").  The defining shape survives: a
    multi-supplier EXISTS plus a correlated NOT EXISTS anti-join on the
    same fact.  Both correlations collapse to per-order aggregates instead
    of two self-joins: "no OTHER supplier shipped later than me" is
    l1.l_shipdate >= max-over-other-suppliers, derived from each order's
    top-two per-supplier ship maxima (one agg + one window on the order
    key); EXISTS-other-supplier is simply that a second supplier ranks."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    per_os = li.groupBy(
        F.col("l_orderkey").alias("po_key"), F.col("l_suppkey").alias("po_supp")
    ).agg(F.max("l_shipdate").alias("s_max"))
    w = Window.partitionBy("po_key").orderBy(F.col("s_max").desc(), F.col("po_supp"))
    ranked = per_os.withColumn("rn", F.row_number().over(w))
    per_order = (
        ranked.groupBy("po_key")
        .agg(
            F.count(F.lit(1)).alias("n_supps"),
            F.max(F.when(F.col("rn") == 1, F.col("s_max"))).alias("m1_max"),
            F.max(F.when(F.col("rn") == 1, F.col("po_supp"))).alias("m1_supp"),
            F.max(F.when(F.col("rn") == 2, F.col("s_max"))).alias("m2_max"),
        )
        .filter(F.col("n_supps") > 1)  # EXISTS another supplier
    )
    max_other = F.when(F.col("l_suppkey") == F.col("m1_supp"), F.col("m2_max")).otherwise(
        F.col("m1_max")
    )
    # SHUFFLE_HASH on the two shuffle joins (r16, guide §3.1 — the r15
    # GLOBAL preferSortMergeJoin switch lost its A/B; the targeted per-join
    # hint wins reproducibly: interleaved med 1.37→1.27s at sf0.1,
    # tools/probe_shj_hint_q21.py).  Build sides are per-orderkey frames
    # (filtered orders / the per-order aggregate) — strictly smaller than
    # lineitem per partition and skew-free by key construction, so the
    # hash build fits per partition at any scale; results are unchanged
    # (hints pick strategy, never semantics — probe asserts row parity).
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            per_order.hint("shuffle_hash"), F.col("l_orderkey") == F.col("po_key")
        )
        .filter(F.col("l_shipdate") >= max_other)  # NOT EXISTS a later other
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
    )


@query(
    "tpch_q2_like",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             ROUND(SUM(l_extendedprice) / SUM(l_quantity), 4) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2),
    eu AS (
      SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM supply JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM part JOIN eu ON p_partkey = ps_partkey
    WHERE p_size <= 5 AND p_type = 'STANDARD'
      AND ps_supplycost = (
        SELECT MIN(e2.ps_supplycost) FROM eu e2 WHERE e2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (q2, adapted: no partsupp in the testdata, so
    the supply relation derives from lineitem — per (part, supplier) unit
    cost = sum(price)/sum(qty), rounded to 4 BEFORE the min comparison so
    the equality is between identically-rounded values in both engines).
    The defining shape survives: a region-filtered supply view probed as
    the fact and under a correlated MIN — decorrelated here to a per-part
    window minimum so the supply subtree is built ONCE (the min-join form
    would scan/aggregate lineitem twice).  supplier/nation/region/part
    broadcast; the supply agg and the window share the l_partkey shuffle
    key, so the window adds a sort but no extra exchange."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD")
    )
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 4).alias("ps_supplycost")
    )
    eu = (
        supply.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    mc = F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    return (
        eu.withColumn("mc_min", mc)
        .filter(F.col("ps_supplycost") == F.col("mc_min"))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q11_like",
    oracle="""
    WITH value_by_part AS (
      SELECT l_partkey AS ps_partkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS part_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1)
    SELECT ps_partkey, part_value
    FROM value_by_part
    WHERE part_value > (SELECT SUM(part_value) * 0.0008 FROM value_by_part)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (q11, adapted: value = one nation's suppliers'
    revenue per part instead of partsupp qty*cost).  The defining shape is
    the HAVING-over-global-fraction: the same per-part value view feeds
    both the rows and the scalar threshold; the threshold comes back as a
    one-row broadcast join, never a driver collect.  Per-part values round
    to 2 first so both engines filter identical inputs; the 0.08% scalar
    itself is a sum of those exact 2-decimal values."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    vbp = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "part_value"
            )
        )
    )
    thresh = vbp.agg((F.sum("part_value") * F.lit(0.0008)).alias("vt"))
    return (
        vbp.join(F.broadcast(thresh), F.col("part_value") > F.col("vt"))
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "tpch_q16_like",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/supplier relationship (q16, adapted: the supply relation is
    lineitem's (part, supplier) pairs; the excluded-supplier NOT IN uses
    negative account balances in place of the complaints LIKE).  The
    defining shape survives: a NOT IN anti-join against a tiny exclude
    set (broadcast left-anti — keys are non-null so NOT IN ≡ anti-join),
    then COUNT(DISTINCT supplier) per part attribute triple.  The part
    filter broadcasts; one distinct-expand agg shuffle keyed by the
    (brand, type, size) triple."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 14, 23, 45))
    )
    excl = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(excl), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_like",
    oracle="""
    WITH bysupp AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty_total,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty97
      FROM lineitem GROUP BY 1, 2)
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM bysupp
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
        AND qty97 > 0 AND qty_total > 2 * qty97)
    AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
    ORDER BY s_suppkey
    """,
)
def tpch_q20_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-stock suppliers (q20, adapted: "availqty > half of shipped"
    becomes "lifetime supplied quantity more than 2x the 1997 demand" —
    stock proxied by total supply, demand by the dated window, both from
    lineitem since there is no partsupp).  The nested-IN pyramid survives:
    part-name IN (broadcast semi), the correlated quantity comparison
    (decorrelated into ONE conditional-sum aggregate instead of two scans
    of the fact), and the outer supplier IN (semi on the distinct
    qualifying suppliers).  Quantities are integer-valued doubles, so the
    2x comparison is exact in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    blue = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%")).select("p_partkey")
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    bysupp = (
        li.join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("qty_total"),
            F.sum(F.when(in97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty97"),
        )
        .filter((F.col("qty97") > 0) & (F.col("qty_total") > 2 * F.col("qty97")))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(bysupp), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
