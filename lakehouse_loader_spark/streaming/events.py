"""Streaming event pipelines: watermarked tumbling-window aggregation and
custom stateful per-user counting.

Batch/stream parity: ``windowed_event_agg`` is the incremental form of the
``events_window_agg`` declared query — same grouping expressions, same
output schema — so results converge to the batch answer once all input is
consumed (verified in tests/test_streaming.py).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # LTZ, not NTZ: Spark watermarks only accept TIMESTAMP; the session
        # runs in UTC so values match the batch NTZ reads.
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream: each parquet file in ``path`` is one micro-batch
    (bounded re-batching is the closest reference artifact — R2,
    src/pg_arrow_source.rs:249-273 — here made genuinely unbounded)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_agg(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling 10-minute windows with late-data watermark; same logical
    shape as the batch events_window_agg query."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", "10 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "event_type",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "total_value",
        )
    )


_USER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running per-user
    event count/value total, updated every micro-batch — the extension
    mechanism for operators Spark's built-in aggregations can't express.

    The input is pruned to (user_id, value) BEFORE the stateful op:
    Catalyst cannot see into the Python UDF, so without the explicit
    select every event column — including the props JSON blob — would
    cross Arrow into Python for every group, every batch."""
    stream = stream.select("user_id", "value")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_USER_STATE_SCHEMA,
        stateStructType="n_events BIGINT, total_value DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_type_histogram(stream: DataFrame) -> DataFrame:
    """Per-user event-type histogram via ``transformWithStateInPandas`` —
    the Spark 4 arbitrary-state API that supersedes applyInPandasWithState:
    MULTIPLE typed state variables per key (ValueState/ListState/MapState,
    each queryable/updatable entry-wise against the RocksDB state store),
    plus timers and per-state TTL.  Here each user's state is a MapState
    keyed by event_type, so a micro-batch touches ONLY the entries its
    rows hit — with applyInPandasWithState the whole per-user state blob
    would round-trip every batch.  At scale state size is
    O(users x live types) in the store, but per-batch IO is O(touched
    entries) — the point of entry-wise state.

    Emits the RUNNING (n_events, total_value) per (user, type) seen in
    each batch (update mode): counts grow monotonically, so the emission
    with the highest count per pair IS the converged total (the parity
    contract streaming_transformwithstate_parity hash-checks).

    Runtime requirements: the RocksDB state-store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider — transformWithState is not
    implemented on the default HDFS-backed store) AND the ``protobuf``
    package (the transformWithState state-server protocol; NOT shipped in
    this container, so the parity test is dependency-gated like the live
    Postgres/MinIO suite — tests/test_streaming.py).  The operator itself
    is complete; it is not registered as a driver query because the gate
    environment cannot execute it.

    Input pruned to (user_id, event_type, value) before the stateful op —
    column pruning cannot pass through the Python UDF boundary (see
    stateful_user_totals)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    stream = stream.select("user_id", "event_type", "value")

    class TypeHistogram(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._hist = handle.getMapState(
                "hist", "event_type string", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            batch: dict[str, list] = {}
            for pdf in rows:
                # dropna=False: a NULL event_type is a real group (the
                # batch GROUP BY keeps it); sentinel-encoded for MapState
                for et, grp in pdf.groupby("event_type", dropna=False):
                    acc = batch.setdefault(_type_key(et), [0, 0.0])
                    acc[0] += len(grp)
                    acc[1] += float(grp["value"].sum())
            types, ns, totals = [], [], []
            for et in sorted(batch):
                dn, dv = batch[et]
                prior = self._hist.getValue((et,)) if self._hist.containsKey((et,)) else None
                n = (prior[0] if prior else 0) + dn
                tv = (prior[1] if prior else 0.0) + dv
                self._hist.updateValue((et,), (n, tv))
                types.append(et)
                ns.append(n)
                totals.append(tv)
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(types),
                    "event_type": [
                        None if t == _NULL_TYPE else t for t in types
                    ],
                    "n_events": ns,
                    "total_value": totals,
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeHistogram(),
        outputStructType="user_id BIGINT, event_type STRING, n_events BIGINT, total_value DOUBLE",
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 days",
) -> DataFrame:
    """Stream-stream INNER join with an event-time range condition: each
    purchase matches the same user's clicks in [click_ts, click_ts+gap] —
    the attribution-join shape (ad click → conversion).

    Both sides carry watermarks and the join condition bounds event time,
    which is exactly what lets Spark EVICT join state: a buffered click
    older than (watermark horizon − gap) can never match a future
    purchase and is dropped from the state store, so state is bounded by
    the horizon × input rate, not the stream length — the 100 TB
    requirement for an unbounded join.  ``watermark`` trades state size
    against tolerated disorder; the parity query passes a horizon wider
    than the bounded test stream's total span so eviction never races
    file-arrival order and the result equals the batch join exactly."""
    l = clicks.select(
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    r = purchases.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (l["l_user"] == r["r_user"])
        & (r["purchase_ts"] >= l["click_ts"])
        & (r["purchase_ts"] <= l["click_ts"] + F.expr(f"INTERVAL {gap}"))
    )
    return (
        l.join(r, cond, "inner")
        .select(
            F.col("l_user").alias("user_id"),
            "click_id",
            "purchase_id",
            "purchase_value",
        )
    )


def stateful_type_histogram_fallback(stream: DataFrame) -> DataFrame:
    """The applyInPandasWithState twin of ``stateful_type_histogram`` —
    SAME computation (running per-(user, event_type) count/value totals,
    update mode, only the types a batch touches are emitted), expressed on
    the Spark 3-era arbitrary-state API so the semantics are executable
    where transformWithStateInPandas's runtime dependencies (protobuf
    state-server protocol + RocksDB provider) are absent.

    State is keyed per USER with the histogram as parallel arrays (the
    pre-MapState encoding of a map state): the v2 operator's per-entry
    batch IO within a user key is traded for one user-sized state blob per
    round-trip — bounded by |live event types|, a handful of entries.  The
    coarser key is also the throughput lever for THIS api: Python-side
    cost is dominated by the per-group fixed overhead (one state
    round-trip + one yielded pd.DataFrame is ~150µs regardless of rows),
    so grouping by (user, type) pays |users| x |types| fixed costs per
    batch where this pays |users| — measured 1.9s vs 0.8s per 50k-row
    micro-batch at sf0.1.  The driver query streaming_stateful_v2_parity
    runs whichever of the two the environment supports; both converge to
    the batch GROUP BY.

    Input pruned to (user_id, event_type, value) before the stateful op —
    column pruning cannot pass through the Python UDF boundary (see
    stateful_user_totals)."""
    stream = stream.select("user_id", "event_type", "value")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            types, ns, totals = state.get
            hist = {t: [n, v] for t, n, v in zip(types, ns, totals)}
        else:
            hist = {}
        touched: dict[str, list] = {}
        for pdf in pdfs:
            # dropna=False + sentinel: see _NULL_TYPE
            for et, grp in pdf.groupby("event_type", dropna=False):
                k = _type_key(et)
                acc = hist.setdefault(k, [0, 0.0])
                acc[0] += len(grp)
                acc[1] += float(grp["value"].sum())
                touched[k] = acc
        state.update(
            (
                list(hist.keys()),
                [v[0] for v in hist.values()],
                [v[1] for v in hist.values()],
            )
        )
        out_types = sorted(touched)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_types),
                "event_type": [
                    None if t == _NULL_TYPE else t for t in out_types
                ],
                "n_events": [touched[t][0] for t in out_types],
                "total_value": [touched[t][1] for t in out_types],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id BIGINT, event_type STRING, n_events BIGINT, total_value DOUBLE"
        ),
        stateStructType=(
            "types ARRAY<STRING>, ns ARRAY<BIGINT>, totals ARRAY<DOUBLE>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transformwithstate_runtime_available() -> bool:
    """True iff this environment can EXECUTE transformWithStateInPandas:
    the operator's state-server protocol needs the protobuf package (not
    shipped everywhere; the RocksDB provider rides with Spark 4)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def session_window_agg(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based session windows on the unbounded stream — the incremental
    form of the events_session_window_native batch query (identical
    grouping: same session_window gap, same output columns).  A session
    emits once the watermark passes its close (append mode); state per
    open session only, bounded by the watermark horizon."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup — the incremental form of the dedup_exact
    operator: keep the first occurrence of each key, dropping later
    duplicates that arrive within the watermark horizon
    (dropDuplicatesWithinWatermark).

    The watermark is what makes this viable on an unbounded stream: state
    for a key is retained only until event time passes its horizon, so the
    state store holds ~(distinct keys per horizon), not all history — the
    same bounded-state discipline as the windowed aggregations.  An
    ingestion pipeline composes this in front of stream_to_delta so
    replayed/duplicated source events (at-least-once sources!) never reach
    the table."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


# NULL event_type sentinel for the stateful histogram operators: state
# array entries / MapState keys cannot hold None, and pandas groupby drops
# NaN groups by default — either would silently lose NULL-typed rows'
# value mass while the batch GROUP BY oracle keeps NULL as a group.  The
# \x00 prefix cannot collide with real event types and sorts first.
_NULL_TYPE = "\x00null"


def _type_key(et) -> str:
    """Group label -> state key: NULL/NaN -> sentinel, else the string."""
    if et is None or (isinstance(et, float) and et != et):
        return _NULL_TYPE
    return str(et)


def _latest_per_key(batch_df: DataFrame, key: str, latest_by: str) -> DataFrame:
    """One row per key: the batch's row with the greatest ``latest_by``
    (ties broken arbitrarily by row_number) — the within-batch reduction
    both streaming upsert sinks apply before touching the table."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.col(latest_by).desc())
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def resolve_stream_app_id(checkpoint_dir: str) -> str:
    """Exactly-once identity for a stream's Delta ``txn`` actions.

    The appId must follow the checkpoint CONTENTS, not its path: a
    relocated/remounted checkpoint dir would silently mint a new appId and
    defeat duplicate-batch detection on replay.  For local checkpoint
    locations (bare paths and ``file://`` URIs) the id is persisted in a
    marker file inside the checkpoint dir on first use; an empty/damaged
    marker is never accepted ('' would collide across streams and wrongly
    skip batches) — it is re-minted and rewritten.  For non-local URI
    locations (s3://, hdfs://; Spark accepts them as checkpointLocation)
    the marker scheme's local-fs calls would write a bogus local directory
    that shadows the real checkpoint, so the id falls back to a
    path-derived hash of the URI itself."""
    import hashlib
    import re

    def path_hash(key: str) -> str:
        return "stream_to_delta-" + hashlib.md5(key.encode()).hexdigest()[:16]

    local_ckpt = checkpoint_dir
    if checkpoint_dir.startswith("file:"):
        # BOTH file:// and the single-slash file:/path form Spark/Hadoop
        # accept — the '://' regex alone would treat the latter as a bare
        # relative path and write the marker into a literal './file:...'
        # dir next to CWD while Spark checkpoints elsewhere (appId would
        # then follow the CWD, not the checkpoint)
        from lakehouse_loader_spark.sinks.staging import local_path

        local_ckpt = local_path(checkpoint_dir)
    elif re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", checkpoint_dir):
        return path_hash(checkpoint_dir)
    os.makedirs(local_ckpt, exist_ok=True)
    marker = os.path.join(local_ckpt, "_lhl_app_id")
    app_id = ""
    if os.path.exists(marker):
        with open(marker) as fh:
            app_id = fh.read().strip()
    if not app_id.startswith("stream_to_delta-"):
        app_id = path_hash(os.path.abspath(local_ckpt))
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(app_id)
        os.replace(tmp, marker)
    return app_id


def stream_to_delta(stream: DataFrame, table_path: str, checkpoint_dir: str):
    """Continuous ingestion into the Delta sink: each micro-batch appends
    through the same transactional commit path as batch writes (exactly the
    reference's loader pipeline, made incremental).  foreachBatch hands the
    micro-batch DataFrame to write_delta, so mode semantics, alignment
    checks, stats collection, and optimistic commits all apply per batch.

    Exactly-once: each batch commit is stamped with a Delta ``txn`` action
    (appId derived from the checkpoint location, version = batch_id).  A
    micro-batch replayed after a failure between table-commit and
    checkpoint-advance is detected via last_txn_version and skipped instead
    of appended twice."""
    from lakehouse_loader_spark.sinks.delta import (
        last_txn_version,
        table_exists,
        write_delta,
    )

    app_id = resolve_stream_app_id(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= last_txn_version(table_path, app_id):
            return  # already committed; checkpoint replay after crash
        write_delta(
            batch_df,
            table_path,
            append=table_exists(table_path),
            txn=(app_id, batch_id),
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert_to_delta(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key: str,
    latest_by: str | None = None,
):
    """Streaming UPSERT (CDC apply): each micro-batch MERGEs on ``key``
    into the Delta table — matched keys rewritten with the batch's values,
    new keys appended — maintaining a latest-state table from an event
    stream (the change-capture consumption pattern, vs stream_to_delta's
    append-only event log).

    ``latest_by`` names an ordering column (e.g. the event timestamp):
    within each micro-batch only the last row per key by that order is
    merged (ties broken arbitrarily but deterministically by row_number);
    without it, batches must already be unique per key — merge_delta
    raises otherwise.

    Exactly-once: the same (appId from checkpoint contents, version =
    batch_id) txn handshake as stream_to_delta, stamped through
    merge_delta's commit.  Skipping replayed batches matters MORE here
    than for appends: re-merging an old batch after later batches advanced
    the same keys would regress them."""
    from lakehouse_loader_spark.sinks.delta import (
        last_txn_version,
        merge_delta,
        table_exists,
        write_delta,
    )

    app_id = resolve_stream_app_id(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= last_txn_version(table_path, app_id):
            return  # already committed; checkpoint replay after crash
        if latest_by is not None:
            batch_df = _latest_per_key(batch_df, key, latest_by)
        if not table_exists(table_path):
            write_delta(batch_df, table_path, txn=(app_id, batch_id))
        else:
            merge_delta(
                batch_df.sparkSession, table_path, batch_df, key,
                txn=(app_id, batch_id),
            )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_to_iceberg(stream: DataFrame, table_path: str, checkpoint_dir: str):
    """Continuous ingestion into the Iceberg sink — the Iceberg twin of
    ``stream_to_delta``.  Each micro-batch appends through the same
    transactional commit path as batch writes (manifest merge, optimistic
    retry), so one snapshot lands per non-empty batch.

    Exactly-once: each commit stamps a snapshot summary property
    ``lhl-stream-<appId> = batch_id`` (appId from the checkpoint contents,
    exactly like the Delta path).  A micro-batch replayed after a failure
    between table-commit and checkpoint-advance is detected via
    ``last_committed_batch`` and skipped instead of appended twice."""
    from lakehouse_loader_spark.sinks.iceberg import (
        _stream_summary_key,
        last_committed_batch,
        table_exists,
        write_iceberg,
    )

    app_id = resolve_stream_app_id(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= last_committed_batch(table_path, app_id):
            return  # already committed; checkpoint replay after crash
        write_iceberg(
            batch_df,
            table_path,
            append=table_exists(table_path),
            snapshot_props={_stream_summary_key(app_id): str(batch_id)},
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert_to_iceberg(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key: str,
    latest_by: str | None = None,
):
    """Streaming UPSERT into the Iceberg sink via EQUALITY DELETES — the
    write shape Flink's Iceberg upsert sink uses: each micro-batch first
    commits an equality-delete file of the batch's keys (O(keys), no table
    scan — nothing is rewritten), then appends the batch's rows.  The
    sequence-aware read drops every older row for those keys, so the table
    always reads as the latest state per key, and compaction
    (``optimize_iceberg``) materializes it physically whenever convenient.

    Contrast with ``stream_upsert_to_delta``: the Delta path pays a MERGE
    (read + rewrite of every matched file) per batch; this path's per-batch
    cost is independent of table size — the difference that matters when a
    small hot-key stream updates a 100 TB table.

    ``latest_by`` keeps only each key's last row per batch, as in the Delta
    twin.  Exactly-once: the append commit stamps the ``lhl-stream-<appId>``
    batch marker; a replayed batch is skipped whole.  A crash between the
    delete and the append replays the batch — the duplicate equality delete
    is semantically idempotent and the append then lands, so the visible
    state converges (the only anomaly is a transient window where the
    batch's keys read as absent)."""
    from lakehouse_loader_spark.sinks.iceberg import (
        _stream_summary_key,
        equality_delete_iceberg,
        last_committed_batch,
        table_exists,
        write_iceberg,
    )

    app_id = resolve_stream_app_id(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= last_committed_batch(table_path, app_id):
            return  # already committed; checkpoint replay after crash
        if latest_by is not None:
            batch_df = _latest_per_key(batch_df, key, latest_by)
        else:
            # same contract as the Delta twin (merge_delta raises): two
            # rows per key in one batch would BOTH survive the equality
            # delete (same sequence number) — the table would silently
            # read two rows for a "latest state per key" key
            dup = (
                batch_df.groupBy(key).count().filter("count > 1").limit(1).count()
            )
            if dup:
                raise ValueError(
                    f"micro-batch has duplicate values in key column {key!r}; "
                    "pass latest_by to reduce within-batch, or dedupe upstream"
                )
        props = {_stream_summary_key(app_id): str(batch_id)}
        if not table_exists(table_path):
            write_iceberg(batch_df, table_path, snapshot_props=props)
            return
        equality_delete_iceberg(
            batch_df.sparkSession, table_path, batch_df.select(key), key_cols=[key]
        )
        write_iceberg(batch_df, table_path, append=True, snapshot_props=props)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Stream-stream inner join: purchases attributed to a prior click by
    the same user within ``within``.  Both sides are watermarked so the
    state store can expire rows; the time-bound predicate is what makes an
    unbounded-stream join finite (Spark buffers only the watermark window).

    ``watermark_delay`` (default: ``within``) is the event-time disorder
    tolerance — rows older than the watermark are dropped as late, so size
    it to the source's actual out-of-orderness, independently of the join
    bound."""
    wm = watermark_delay or within
    c = (
        clicks.withWatermark("ts", wm)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", wm)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select("c_user", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value")


def enrich_stream_with_dimension(
    stream: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment: broadcast-join a dimension snapshot onto
    every micro-batch — the streaming form of the fact⋈dim pattern (user
    profiles, model-version routing tables, feature lookups).

    The static side re-resolves per micro-batch, so a dimension backed by
    a lakehouse table picks up slowly-changing updates between batches
    without restarting the query; broadcast keeps the join map-side (no
    shuffle of the unbounded stream side).  LEFT join: events without a
    dimension row pass through with nulls rather than silently dropping
    (an inner join would make dimension lag look like data loss)."""
    return stream.join(F.broadcast(dim), on, "left")


def _pg_app_has_committed(conn_url: str, table: str, app_id: str) -> bool:
    """True iff the exactly-once ledger records ANY committed batch from
    ``app_id`` into ``table`` — the stream-attach test stream_to_postgres
    keys its overwrite-vs-append decision on.  A missing ledger table
    means nothing has ever committed."""
    from lakehouse_loader_spark.sources.pgwire import (
        PgError,
        iter_copy_batches,
        parse_libpq_url,
    )

    if not all(part.isidentifier() for part in table.split(".")):
        raise ValueError(f"unsafe table name {table!r}")
    if not app_id.replace("-", "_").replace(".", "_").isidentifier():
        raise ValueError(f"unsafe app id {app_id!r}")
    params = parse_libpq_url(conn_url)
    try:
        batch = next(
            iter_copy_batches(
                params,
                f"SELECT count(*)::int8 AS n FROM __lhl_txn WHERE "
                f"app_id = '{app_id}' AND tbl = '{table}'",
                [("n", 20, -1)],
                2,
            )
        )
        return int(batch["n"][0]) > 0
    except PgError as exc:
        # ONLY a missing ledger table means "nothing committed".  Any
        # other PgError (connection reset mid-message, auth failure,
        # permission denied) must propagate: swallowing it here would
        # flip the sink to mode='overwrite' and silently replace the
        # target table with one micro-batch if the subsequent write
        # succeeds.  Server errors carry their sqlstate in the message
        # (_error_text's trailing parens); 42P01 = undefined_table.  A
        # bare "does not exist" match would be too broad — a missing
        # DATABASE (3D000) says that too and must propagate.
        if "42P01" in str(exc):
            return False  # no ledger table yet -> nothing committed
        raise


def stream_to_postgres(
    stream: DataFrame, conn_url: str, table: str, checkpoint_dir: str
):
    """Continuous ingestion into PostgreSQL over the wire-protocol sink —
    the serving-database twin of stream_to_delta/stream_to_iceberg.

    Exactly-once: each micro-batch publishes through
    ``write_postgres_wire``'s transactional staged append with
    ``txn=(app_id, batch_id)`` — the ledger row commits IN the publish
    transaction, so a batch replayed after a failure between
    table-commit and checkpoint-advance publishes zero rows the second
    time (the same guarantee the lakehouse sinks get from their txn
    actions, enforced server-side here)."""
    from lakehouse_loader_spark.sources.pgwire import write_postgres_wire

    app_id = resolve_stream_app_id(checkpoint_dir)
    committed = False  # latched: once True it can never become False

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal committed
        if batch_df.isEmpty():
            return
        # first PUBLISHED batch overwrites (stream attach replaces the
        # table), later ones append — decided by the LEDGER, not batch_id:
        # an empty batch 0 publishes nothing, so keying the mode on
        # batch_id would make batch 1 append onto a nonexistent (or
        # stale pre-existing) table.  The probe result is latched so the
        # stream pays the extra round-trip at most until first publish.
        if not committed:
            committed = _pg_app_has_committed(conn_url, table, app_id)
        write_postgres_wire(
            batch_df,
            conn_url,
            table,
            mode="append" if committed else "overwrite",
            txn=(app_id, batch_id),
        )
        committed = True

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
