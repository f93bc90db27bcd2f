"""Data-quality expectations: dbt-test-style rule evaluation over a table.

``expectations_report`` evaluates every boolean rule in ONE aggregate pass
(conditional counts — no per-rule scans), returning a tidy
(rule, violations, n_rows) report.  Referential rules (foreign-key
orphans) need a join and are provided separately by
``referential_violations``; callers union the two shapes.

Write-side enforcement lives in the Delta sink's CHECK constraints
(sinks/delta.py:add_check_constraint); this is the read-side audit over
data that already landed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate ``rules`` (name → boolean Column that is TRUE when the row
    VIOLATES the rule) in one aggregate pass over ``df``.  NULL rule
    results count as violations — an unevaluable expectation is a failed
    expectation, matching CHECK-constraint semantics."""
    if not rules:
        raise ValueError("no rules given")
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(
            F.when(F.coalesce(cond, F.lit(True)), F.lit(1)).otherwise(F.lit(0))
        ).alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into the tidy report shape
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(name).cast("bigint").alias("violations"),
            )
            for name in rules
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("p"), F.col("__rows").alias("n_rows"))
        .select("p.rule", "p.violations", F.col("n_rows").cast("bigint").alias("n_rows"))
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule_name: str,
) -> DataFrame:
    """Foreign-key orphan count: child rows whose key has no parent —
    a broadcast-friendly left-anti join when the parent key set is a
    dimension, shuffle-anti otherwise (Catalyst picks).  NULL child keys
    are not orphans (SQL FK semantics: NULL references nothing)."""
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    total = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return orphans.agg(
        F.lit(rule_name).alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("violations"),
    ).crossJoin(F.broadcast(total))
