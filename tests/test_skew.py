"""Salted aggregation/join must produce exactly the unsalted results —
only the shuffle layout differs."""

from __future__ import annotations

import pyspark.sql.functions as F

from lakehouse_loader_spark.operators.skew import salted_count_distinct, salted_join

from tests.conftest import SF_ORACLE


def test_salted_count_distinct_equals_plain(spark):
    from lakehouse_loader_spark.catalog import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")
    plain = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_suppkey").alias("n")).collect()
    }
    salted = {
        r.l_returnflag: r.n_distinct
        for r in salted_count_distinct(li, "l_returnflag", "l_suppkey").collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    from lakehouse_loader_spark.catalog import load_table

    o = load_table(spark, SF_ORACLE, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = load_table(spark, SF_ORACLE, "customer")
    plain = o.join(c, "c_custkey").count()
    salted = salted_join(o, c, "c_custkey").count()
    assert salted == plain
