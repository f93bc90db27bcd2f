"""Probe: read per-query executor task metrics from the always-on
AppStatusStore (VERDICT r15 item 6 — load-immune timing evidence).

Validates, before wiring into bench.py:
1. the py4j call shape for AppStatusStore.stageList(statuses, details,
   withSummaries, unsortedQuantiles, taskStatus);
2. that the returned Seq is ordered by ascending stageId (so a tail scan
   from the end finds exactly the stages newer than a watermark without
   iterating the full retained list);
3. that executorRunTime/executorCpuTime/jvmGcTime deltas attribute a known
   workload sensibly (a CPU-heavy query shows task_ms >> wall_ms x 1).

Run: python tools/probe_status_store.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from lakehouse_loader_spark import get_spark


def make_reader(spark):
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    jstore = jsc.statusStore()
    gw = sc._gateway
    empty_status = None  # AppStatusStore handles null (REST API passes null)
    empty_quant = gw.new_array(gw.jvm.double, 0)
    empty_task = None

    def stage_seq():
        return jstore.stageList(empty_status, False, False, empty_quant, empty_task)

    def drain():
        try:
            jsc.listenerBus().waitUntilEmpty()
        except Exception as exc:
            print(f"waitUntilEmpty failed: {exc}")

    return stage_seq, drain


def main() -> None:
    spark = get_spark("probe-status-store")
    stage_seq, drain = make_reader(spark)

    # workload 1: a shuffle + aggregate
    df = spark.range(0, 2_000_000, 1, 16)
    df.selectExpr("id % 1000 AS k", "id AS v").groupBy("k").count().write.format(
        "noop"
    ).mode("overwrite").save()
    drain()
    seq = stage_seq()
    n = seq.size()
    ids = [seq.apply(i).stageId() for i in range(n)]
    print(f"stages after workload 1: n={n} ids={ids}")
    print(f"ascending? {ids == sorted(ids)}")
    watermark = max(ids) if ids else -1

    # workload 2: CPU-heavy
    t0 = time.perf_counter()
    spark.range(0, 30_000_000, 1, 32).selectExpr(
        "sum(sqrt(id) * sin(id)) AS s"
    ).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    drain()
    seq = stage_seq()
    n = seq.size()
    run = cpu = gc = 0
    new_ids = []
    # seq is DESCENDING by stageId (newest first) — scan from the front
    for i in range(n):
        s = seq.apply(i)
        sid = s.stageId()
        if sid <= watermark:
            break
        new_ids.append(sid)
        run += s.executorRunTime()
        cpu += s.executorCpuTime()
        gc += s.jvmGcTime()
    print(
        f"workload 2: wall={wall:.3f}s new_stages={new_ids} "
        f"task_ms={run} cpu_ms={cpu / 1e6:.0f} gc_ms={gc}"
    )
    # py4j overhead of a tail scan
    t0 = time.perf_counter()
    seq = stage_seq()
    _ = [seq.apply(i).stageId() for i in range(max(0, seq.size() - 10), seq.size())]
    print(f"tail-scan of 10 stages: {time.perf_counter() - t0:.4f}s")
    spark.stop()


if __name__ == "__main__":
    main()
