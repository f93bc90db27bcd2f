"""A/B the Python-stateful streaming parities (applyInPandasWithState) and
the stream-stream join at state widths 8/16/32 under the bounded-run confs
(minBatchesToRetain=1, maintenance parked).  Scratch tool."""
from __future__ import annotations

import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_loader_spark import get_spark  # noqa: E402
from lakehouse_loader_spark.queries import _ensure_loaded  # noqa: E402
from lakehouse_loader_spark.queries.extensions import _staged_event_files  # noqa: E402
from lakehouse_loader_spark.streaming.events import (  # noqa: E402
    read_event_stream,
    stateful_type_histogram_fallback,
    stateful_user_totals,
    stream_stream_interval_join,
)

SF = "/root/testdata/sf0.1"


def timed(child, staged, builder, mode, label):
    best = None
    for _ in range(2):
        sink = f"w_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            builder(read_event_stream(child, staged, 2))
            .writeStream.trigger(availableNow=True)
            .outputMode(mode)
            .format("memory")
            .queryName(sink)
            .start()
        )
        q.awaitTermination(300)
        child.table(sink).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label}: {best:.2f}s", flush=True)
    return best


def join_builder(child, staged):
    def b(_stream):
        clicks = read_event_stream(child, staged, 2).filter(
            F.col("event_type") == "click"
        )
        purchases = read_event_stream(child, staged, 2).filter(
            F.col("event_type") == "purchase"
        )
        return stream_stream_interval_join(clicks, purchases)

    return b


def main():
    _ensure_loaded()
    spark = get_spark("probe-width")
    staged = _staged_event_files(spark, SF, "stateful", lambda ev: ev.repartition(4))
    for width in (8, 16, 32):
        child = spark.newSession()
        child.conf.set("spark.sql.shuffle.partitions", str(width))
        child.conf.set("spark.sql.streaming.minBatchesToRetain", "1")
        child.conf.set(
            "spark.sql.streaming.stateStore.maintenanceInterval", "3600s"
        )
        print(f"== width {width}")
        timed(child, staged, stateful_user_totals, "update", "stateful(user)")
        timed(
            child, staged, stateful_type_histogram_fallback, "update",
            "stateful_v2(user,type)",
        )
        timed(child, staged, join_builder(child, staged), "append", "ss-join")


if __name__ == "__main__":
    main()
