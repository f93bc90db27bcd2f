"""Training-data export: JSONL round-trip and WebDataset tar shards."""

from __future__ import annotations

import pytest

import glob
import json
import os
import tarfile

from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks.export import export_jsonl, export_webdataset
from lakehouse_loader_spark.sources.readers import read_jsonl_source


def test_export_jsonl_roundtrip(spark, tmpdir):
    df = spark.range(0, 500).select(
        "id", F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    path = os.path.join(tmpdir, "out")
    n_parts = export_jsonl(df, path, max_records_per_file=200)
    assert n_parts >= 3  # 500 rows / 200-per-file bound
    assert glob.glob(os.path.join(path, "part-*.gz"))  # compressed parts
    back = read_jsonl_source(spark, path, schema="id long, text string")
    assert back.count() == 500
    assert sorted(r.id for r in back.collect()) == list(range(500))


def test_export_webdataset_shards(spark, tmpdir):
    """Every sample lands exactly once as a (bin, json) member pair, shards
    respect shard_rows, the manifest matches the bytes on disk, and
    payloads/metadata round-trip byte-exactly."""
    from lakehouse_loader_spark.operators.multimodal import with_binary_payload

    docs = (
        spark.createDataFrame(
            [(i, f"text {i}", f"src{i % 3}") for i in range(100)],
            "doc_id long, text string, source string",
        )
        .repartition(2)
    )
    docs = with_binary_payload(docs)
    out = os.path.join(tmpdir, "wds")
    manifest = export_webdataset(
        docs,
        out,
        key_col="doc_id",
        payload_col="payload",
        meta_cols=["source"],
        shard_rows=30,
    ).collect()

    assert sum(m.n_entries for m in manifest) == 100
    assert all(m.n_entries <= 30 for m in manifest)
    seen = {}
    for m in manifest:
        full = os.path.join(out, m.shard)
        assert os.path.getsize(full) == m.n_bytes
        with tarfile.open(full) as tf:
            names = tf.getnames()
            bins = {n[: -len(".bin")] for n in names if n.endswith(".bin")}
            jsons = {n[: -len(".json")] for n in names if n.endswith(".json")}
            assert bins == jsons and len(bins) == m.n_entries
            for key in sorted(bins):
                payload = tf.extractfile(f"{key}.bin").read()
                meta = json.loads(tf.extractfile(f"{key}.json").read())
                seen[key] = (payload, meta["source"])
    assert len(seen) == 100  # unique keys across all shards
    expect = {
        str(r.doc_id): (bytes(r.payload), r.source)
        for r in docs.select("doc_id", "payload", "source").collect()
    }
    assert seen == expect


def test_export_webdataset_null_payload(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b"xy"))], "doc_id long, payload binary"
    )
    out = os.path.join(tmpdir, "wds0")
    man = export_webdataset(df, out, key_col="doc_id", payload_col="payload").collect()
    assert sum(m.n_entries for m in man) == 2
    got = {}
    for m in man:
        with tarfile.open(os.path.join(out, m.shard)) as tf:
            for n in tf.getnames():
                if n.endswith(".bin"):
                    got[n] = tf.extractfile(n).read()
    assert got == {"1.bin": b"", "2.bin": b"xy"}


def test_cli_export_subcommands(spark, tmpdir):
    from lakehouse_loader_spark.cli import do_main
    from lakehouse_loader_spark.sinks.delta import write_delta

    dpath = os.path.join(tmpdir, "dl")
    df = spark.range(0, 50).select(
        "id", F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    write_delta(df, dpath)
    jpath = os.path.join(tmpdir, "jl")
    do_main(["delta-to-jsonl", dpath, jpath])
    back = read_jsonl_source(spark, jpath, schema="id long, text string")
    assert back.count() == 50

    wpath = os.path.join(tmpdir, "wd")
    do_main(
        ["export-webdataset", f"delta:{dpath}", wpath,
         "--key-col", "id", "--payload-col", "text",
         "--meta-cols", "text", "--shard-rows", "20"]
    )
    shards = glob.glob(os.path.join(wpath, "shard-*.tar"))
    assert shards
    total = 0
    for s in shards:
        with tarfile.open(s) as tf:
            total += sum(1 for n in tf.getnames() if n.endswith(".bin"))
    assert total == 50


def test_avro_export_roundtrips_through_the_reader(spark, tmpdir):
    """export_avro -> read_avro_source is lossless over the full supported
    type set (incl. NULLs, date/timestamp logical types, binary), written
    executor-side in rows_per_file-bounded OCF parts."""
    from pyspark.sql import functions as F

    from lakehouse_loader_spark.sinks.export import export_avro
    from lakehouse_loader_spark.sources.readers import read_avro_source

    df = (
        spark.range(0, 3000)
        .select(
            "id",
            (F.col("id") % 2 == 0).alias("flag"),
            (F.col("id") * 0.5).alias("v"),
            F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
            F.to_date(F.lit("2024-01-01")).alias("d"),
            F.lit("2024-06-01 12:00:00").cast("timestamp_ntz").alias("ts"),
            F.when(F.col("id") % 10 == 0, None)
            .otherwise(F.col("id").cast("string"))
            .cast("binary")
            .alias("b"),
        )
        .repartition(3)
    )
    target = os.path.join(tmpdir, "avro_out")
    manifest = export_avro(df, target, rows_per_file=500).collect()
    assert sum(r.rows for r in manifest) == 3000
    assert len(manifest) >= 6  # 3 partitions x 1000 rows / 500-row files
    back = read_avro_source(spark, target)
    # nullable unions on every field -> compare types, not nullability
    assert back.schema.simpleString() == df.schema.simpleString()
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_avro_export_refuses_unmappable_types(spark, tmpdir):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lakehouse_loader_spark.sinks.export import export_avro

    df = spark.range(1).select(F.create_map(F.lit("k"), F.lit(1)).alias("m"))
    with _pytest.raises(ValueError, match="no Avro mapping"):
        export_avro(df, os.path.join(tmpdir, "x"))


def test_csv_export_roundtrips_through_the_reader(spark, tmpdir):
    from pyspark.sql import functions as F

    from lakehouse_loader_spark.sinks.export import export_csv
    from lakehouse_loader_spark.sources.readers import read_csv_source

    df = spark.range(0, 500).select(
        "id",
        (F.col("id") * 0.5).alias("v"),
        F.concat(F.lit("s,with,commas "), F.col("id").cast("string")).alias("s"),
    )
    target = os.path.join(tmpdir, "csv_out")
    n_parts = export_csv(df, target)
    assert n_parts >= 1
    back = read_csv_source(spark, target, schema="id BIGINT, v DOUBLE, s STRING")
    assert back.count() == 500
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_orc_export_roundtrips_through_the_reader(spark, tmpdir):
    """ORC round-trip (typed columnar twin of the csv/avro tests): values,
    decimals, timestamps, and arrays survive bit-exact; the reader's scan
    supports pushdown like parquet (plan asserted)."""
    from pyspark.sql import functions as F

    from lakehouse_loader_spark.sinks.export import export_orc
    from lakehouse_loader_spark.sources.readers import read_orc_source

    df = spark.range(0, 500).select(
        "id",
        (F.col("id") * 0.5).alias("v"),
        F.col("id").cast("decimal(8,3)").alias("d"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
    )
    target = os.path.join(tmpdir, "orc_out")
    n_parts = export_orc(df, target)
    assert n_parts >= 1
    back = read_orc_source(spark, target)
    # ORC (like parquet) reads everything back nullable — including nested
    # element nullability — so compare names + type names only
    assert [(f.name, f.dataType.typeName()) for f in back.schema.fields] == [
        (f.name, f.dataType.typeName()) for f in df.schema.fields
    ]
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    plan = back.filter(F.col("id") == 7).select("id")._jdf.queryExecution().executedPlan().toString()
    assert "id" in plan  # pushdown shape: scan exists with the filter column


@pytest.mark.slow  # subprocess CLI e2e (~45s) — slow tier (r16)
def test_cli_orc_to_delta_and_back(spark, tmpdir):
    """orc-to-delta ingest + delta-to-orc export through the CLI."""
    import subprocess
    import sys

    from lakehouse_loader_spark.sinks.delta import read_delta
    from lakehouse_loader_spark.sources.readers import read_orc_source

    src = os.path.join(tmpdir, "src_orc")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").write.orc(src)
    delta_t = os.path.join(tmpdir, "delta_t")
    res = subprocess.run(
        [sys.executable, "-m", "lakehouse_loader_spark.cli", "orc-to-delta", src, delta_t],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert read_delta(spark, delta_t).count() == 100
    out_orc = os.path.join(tmpdir, "out_orc")
    res = subprocess.run(
        [sys.executable, "-m", "lakehouse_loader_spark.cli", "delta-to-orc", delta_t, out_orc],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    back = read_orc_source(spark, out_orc)
    assert sorted((r.id, r.v) for r in back.collect()) == [(i, i * 2) for i in range(100)]
