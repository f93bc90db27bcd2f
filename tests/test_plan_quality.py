"""Plan-quality regression tests: the properties that make these plans hold
at 100 TB — predicate pushdown into the parquet scan, column pruning,
broadcast joins for dims, TakeOrderedAndProject for top-k, no cartesian
products — asserted on the actual physical plans."""

from __future__ import annotations

import pytest

from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded

from tests.conftest import SF_ORACLE

_ensure_loaded()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_ORACLE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _single_partition_consumers(plan: str) -> list[str]:
    """Node names that CONSUME a SinglePartition exchange, parsed from the
    formatted-mode plan.  Formatted mode prints the partitioning only in the
    node details ("Arguments: SinglePartition"), never in the tree — a
    literal grep for 'Exchange SinglePartition' (simple-mode spelling) can
    never match, so an assertion on it is vacuous.  The tree (indented
    ``+- Node (id)`` lines) gives each exchange's parent; the detail
    sections give which exchange ids are single-partition."""
    import re

    lines = plan.splitlines()
    # ids of Exchange nodes whose detail block says SinglePartition
    sp_ids = set()
    cur = None
    for ln in lines:
        m = re.match(r"^\((\d+)\) (\w+)", ln)
        if m:
            cur = (int(m.group(1)), m.group(2))
        elif cur and cur[1] == "Exchange" and "SinglePartition" in ln:
            sp_ids.add(cur[0])
    # tree: depth -> parent node name
    consumers = []
    stack: list[tuple[int, str, int]] = []  # (depth, name, id)
    for ln in lines:
        m = re.match(r"^([ +:-]*)(\*?\(?\d*\)? ?)?(\w[\w ]*?) \((\d+)\)\s*$", ln)
        if not m:
            continue
        depth = len(m.group(1))
        name, nid = m.group(3), int(m.group(4))
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if nid in sp_ids and stack:
            consumers.append(stack[-1][1])
        stack.append((depth, name, nid))
    return consumers


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_pred")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(o_totalprice,50000.0)" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "scan_project")
    # only the 4 projected columns may be read
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read and "l_extendedprice" in read
    assert "l_quantity" not in read and "l_shipdate" not in read


@pytest.mark.parametrize("name", ["join_broadcast", "tpch_q3_like", "join_inner"])
def test_dim_joins_are_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_flagship_is_two_stage_agg(spark):
    """tpch_q1: partial then final HashAggregate around one small shuffle."""
    plan = _plan(spark, "tpch_q1_like")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_pack_sequences_no_global_window(spark):
    """The distributed prefix sum must never plan a single-partition window:
    every Window sits over a keyed Exchange (hashpartitioning on the range
    bucket), and the only SinglePartition exchange allowed is the broadcast
    of the tiny per-bucket offset table."""
    plan = _plan(spark, "pack_sequences")
    assert "Window" in plan  # the bucket-local running sum is still a window
    assert not _single_partition_consumers(plan), "single-partition funnel"
    assert "BroadcastExchange" in plan  # offsets ride a broadcast, not a shuffle


@pytest.mark.slow  # full-registry plan sweep (~40s) — slow tier (r16)
def test_no_array_or_map_output_columns(spark):
    """The driver's correctness canonicalizer sorts every output column in
    pandas before hashing; list-valued cells raise `unhashable type: 'list'`
    (r04: embedding_pca_project, multimodal_resize).  Declared queries must
    summarize array outputs into scalar columns (the embedding_quantize_int8
    pattern) — full vectors stay available on the underlying operators."""
    from pyspark.sql import types as T

    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, SF_ORACLE)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, (T.ArrayType, T.MapType)), (
                f"{name}.{f.name}: {f.dataType.simpleString()}"
            )


def test_single_partition_detector_catches_global_window(spark):
    """The funnel detector must actually fire: a global-order window (the
    anti-pattern every keyed prefix-sum in this repo exists to avoid)
    plans Exchange->Sort->Window on one partition, and the parser must
    report the non-aggregate consumer."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).withColumn(
        "rn", F.row_number().over(W.orderBy("id"))  # deliberately global
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    consumers = _single_partition_consumers(plan)
    assert consumers, "detector failed to see the single-partition exchange"
    assert any(c not in {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}
               for c in consumers)


@pytest.mark.slow  # full-registry plan sweep (~50s) — slow tier (r16)
def test_no_cartesian_anywhere(spark):
    """No declared query may plan a cartesian product (theta joins must ride
    an equi key or a broadcast) — and none may funnel DATA through a
    single-partition exchange (the single-task bottleneck that turns a
    100 TB job into one executor's problem; global order is expressed as
    TakeOrderedAndProject or a two-pass keyed plan instead).

    A SinglePartition exchange is allowed ONLY when its consumer is an
    aggregate: a global aggregate's final merge moves one constant-size
    partial row per upstream partition, not data.  A Sort/Window/anything
    else consuming one is a genuine funnel and fails.  (The previous
    literal grep for 'Exchange SinglePartition' was vacuous — formatted
    explain mode never prints that spelling; see
    _single_partition_consumers.)"""
    benign = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}
    for name in sorted(REGISTRY):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        funnels = [c for c in _single_partition_consumers(plan) if c not in benign]
        assert not funnels, f"{name}: SinglePartition exchange feeds {funnels}"


def test_split_leakage_component_broadcast_is_count_gated(spark, monkeypatch):
    """split_leakage_safe's component-frame broadcast must be gated on the
    component row count (COMPONENT_BROADCAST_MAX): components are
    O(duplicate docs), which on heavy-dup web corpora is O(corpus), so a
    forced broadcast would OOM exactly where leakage-safe splitting
    matters.  Over the gate the hint must vanish from the logical plan
    (AQE then picks the strategy); under it the hint is present.  Asserted
    on the OPTIMIZED LOGICAL plan — the physical plan may legitimately
    broadcast either way at sf0.01 via AQE, so a physical assertion would
    be vacuous."""
    from lakehouse_loader_spark.queries import pipeline as P

    def join_hints(df) -> str:
        return df._jdf.queryExecution().optimizedPlan().toString()

    monkeypatch.setattr(P, "COMPONENT_BROADCAST_MAX", -1)
    over = P.split_leakage_safe(spark, SF_ORACLE)
    assert "broadcast" not in join_hints(over).lower(), (
        "component broadcast hint survived above the gate"
    )

    monkeypatch.setattr(P, "COMPONENT_BROADCAST_MAX", 4_000_000)
    under = P.split_leakage_safe(spark, SF_ORACLE)
    assert "broadcast" in join_hints(under).lower(), (
        "component broadcast hint missing below the gate"
    )
