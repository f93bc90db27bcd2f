"""CLI mirroring the reference's four subcommands (src/lib.rs:26-80):

    lhl parquet-to-delta   SOURCE TARGET [-o] [--batch-size N]
    lhl pg-to-delta     -q QUERY SOURCE TARGET [-o] [--batch-size N]
    lhl parquet-to-iceberg SOURCE TARGET [-o] [-a]
    lhl pg-to-iceberg   -q QUERY SOURCE TARGET [-o] [-a]

plus the loader-surface extensions for training-data interchange formats:

    lhl csv-to-delta / csv-to-iceberg     SOURCE TARGET [-o] [-a] [--schema DDL] [--delimiter C]
    lhl jsonl-to-delta / jsonl-to-iceberg SOURCE TARGET [-o] [-a] [--schema DDL]
    lhl avro-to-delta / avro-to-iceberg   SOURCE TARGET [-o] [-a]
    lhl orc-to-delta / orc-to-iceberg     SOURCE TARGET [-o] [-a]
    lhl delta-to-orc / iceberg-to-orc / parquet-to-orc  SOURCE TARGET [--compression C]

and table-maintenance subcommands (engine extensions; a production lake
runs these on a schedule next to the loader):

    lhl optimize-delta / optimize-iceberg  TARGET [--target-partitions N] [--zorder-by COLS]
    lhl vacuum-delta      TARGET
    lhl expire-snapshots  TARGET [--keep-last N]
    lhl refresh-agg       SOURCE TARGET --group-by COLS --agg OUT:FN:COL ...
    lhl convert-delta-to-iceberg SOURCE TARGET
    lhl convert-iceberg-to-delta SOURCE TARGET
    lhl delta-to-jsonl / iceberg-to-jsonl  SOURCE TARGET   (training export)
    lhl export-webdataset SOURCE TARGET --key-col K --payload-col P
        [--meta-cols a,b] [--shard-rows N]   (sharded tar export)
    lhl delete-delta / delete-iceberg  TARGET --where "SQL predicate"
    lhl merge-delta / merge-iceberg    TARGET --source P --key a,b
        [--delete-col C] (keyed upsert; merge-delta also takes
        --mode copy-on-write|merge-on-read)
    lhl update-delta / update-iceberg  TARGET --where "SQL" --set COL=EXPR ...
    lhl changes-delta SOURCE TARGET --since N [--end M]   (change-feed export)
    lhl build-ann-index SOURCE TARGET [--kind ivf|lsh] [--fmt delta|iceberg]
        [--n-centroids N | --n-tables N --planes-per-table N]
        (train + persist an ANN index as lakehouse tables)

All loader subcommands take -a (append; engine extension on delta) and
--evolve-schema (with -a: by-name add-column evolution instead of the
reference's positional alignment).

Usage: python -m lakehouse_loader_spark.cli <subcommand> ...
"""

from __future__ import annotations

import argparse
import os
import sys

from lakehouse_loader_spark.session import get_spark
from lakehouse_loader_spark.sinks.modes import TargetExistsError
from lakehouse_loader_spark.sources.readers import (
    DEFAULT_BATCH_SIZE,
    read_csv_source,
    read_jsonl_source,
    read_parquet_source,
    read_postgres_query,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lhl-spark")
    sub = p.add_subparsers(dest="command", required=True)
    formats = ("parquet", "pg", "csv", "jsonl", "avro", "orc")
    for fmt in formats:
        for sink in ("delta", "iceberg"):
            name = f"{fmt}-to-{sink}"
            sp = sub.add_parser(name)
            sp.add_argument("source")
            sp.add_argument("target")
            sp.add_argument("-o", "--overwrite", action="store_true")
            # the reference exposes -a only on iceberg (src/lib.rs:57-62);
            # delta append + by-name evolution are engine extensions
            sp.add_argument("-a", "--append", action="store_true")
            sp.add_argument(
                "--evolve-schema",
                action="store_true",
                help="with -a: merge new columns by name instead of "
                "requiring positional alignment",
            )
            sp.add_argument(
                "--bloom-filter",
                default=None,
                metavar="COLS",
                help="comma-separated columns to write parquet bloom filters for",
            )
            sp.add_argument(
                "--sort-by",
                default=None,
                metavar="COLS",
                help="comma-separated columns to cluster rows by before writing",
            )
            if sink == "delta":
                sp.add_argument(
                    "--generated",
                    action="append",
                    default=None,
                    metavar="COL=EXPR",
                    help="generated column (table creation only, repeatable): "
                    "omitted on later writes it is computed, provided it "
                    "must equal EXPR",
                )
            if fmt == "pg":
                sp.add_argument("-q", "--query", required=True)
                sp.add_argument("--batch-size", type=int, default=DEFAULT_BATCH_SIZE)
                # parallel partitioned ingest (all four required together):
                # -q becomes the "(subquery) alias" dbtable form when
                # --partition-column is set
                sp.add_argument("--partition-column", default=None)
                sp.add_argument("--num-partitions", type=int, default=None)
                sp.add_argument("--lower-bound", type=int, default=None)
                sp.add_argument("--upper-bound", type=int, default=None)
                sp.add_argument(
                    "--pg-driver",
                    choices=("auto", "jdbc", "wire"),
                    default="auto",
                    help="transport: Spark JDBC (needs the pgJDBC jar) or "
                    "the pure-Python wire protocol; auto picks by "
                    "classpath probe",
                )
            if fmt in ("csv", "jsonl"):
                sp.add_argument("--schema", default=None, help="DDL schema string (skips inference)")
            if fmt == "csv":
                sp.add_argument("--delimiter", default=",")
    for name in ("optimize-delta", "optimize-iceberg"):
        opt = sub.add_parser(name)
        opt.add_argument("target")
        opt.add_argument("--target-partitions", type=int, default=1)
        opt.add_argument("--zorder-by", default=None, help="comma-separated columns")
        opt.add_argument(
            "--small-file-threshold",
            type=int,
            default=None,
            help="bytes: bin-packing mode — rewrite only files below this size",
        )
        opt.add_argument(
            "--pred",
            action="append",
            default=None,
            metavar="'COL OP VALUE'",
            help="OPTIMIZE WHERE: scope the rewrite to files this "
            "AND-ed predicate can touch (scan-* grammar incl. "
            "'|' OR-groups); others carry over untouched",
        )
    vac = sub.add_parser("vacuum-delta")
    vac.add_argument("target")
    vac.add_argument(
        "--retain-versions",
        type=int,
        default=0,
        help="keep files referenced by the last N versions (time travel "
        "inside the window keeps working)",
    )
    exp = sub.add_parser("expire-snapshots")
    exp.add_argument("target")
    exp.add_argument("--keep-last", type=int, default=1)
    rman = sub.add_parser("rewrite-manifests")
    rman.add_argument("target")
    rman.add_argument(
        "--min-count",
        type=int,
        default=2,
        help="consolidate only when the snapshot has at least this many manifests",
    )
    orph = sub.add_parser("remove-orphans")
    orph.add_argument("target")
    orph.add_argument(
        "--older-than-hours",
        type=float,
        default=24.0,
        help="only delete unreferenced files older than this (grace period)",
    )
    ragg = sub.add_parser("refresh-agg")
    ragg.add_argument("source")
    ragg.add_argument("target")
    ragg.add_argument("--group-by", required=True, help="comma-separated group columns")
    ragg.add_argument(
        "--agg",
        action="append",
        required=True,
        metavar="OUT:FN:COL",
        help="aggregate spec, repeatable; FN in {sum,count,min,max}, COL '*' for COUNT(*)",
    )
    ragg.add_argument("--app-id", default="delta-agg-maintenance")
    ragg.add_argument("--source-format", choices=("delta", "iceberg"), default="delta")
    ragg.add_argument(
        "--on-rewrite",
        choices=("fail", "rebuild", "cdf"),
        default="fail",
        help="when source history was rewritten by DML: fail (default), "
        "full rebuild, or fold the row-level change feed (sum/count only)",
    )
    bai = sub.add_parser(
        "build-ann-index",
        help="train + persist an ANN index over a vector table as "
        "lakehouse tables (sinks/ann_index.py)",
    )
    bai.add_argument("source", help="vector table (parquet dir, delta, or iceberg)")
    bai.add_argument("target", help="index root directory")
    bai.add_argument("--kind", choices=("ivf", "lsh"), default="ivf")
    bai.add_argument("--fmt", choices=("delta", "iceberg"), default="delta")
    bai.add_argument(
        "--source-format", choices=("parquet", "delta", "iceberg"), default="parquet"
    )
    bai.add_argument("--id-col", default="vec_id")
    bai.add_argument("--vec-col", default="embedding")
    bai.add_argument("--n-centroids", type=int, default=16, help="ivf only")
    bai.add_argument("--dim", type=int, default=64, help="lsh only")
    bai.add_argument("--n-tables", type=int, default=8, help="lsh only")
    bai.add_argument("--planes-per-table", type=int, default=4, help="lsh only")
    cid = sub.add_parser("convert-iceberg-to-delta")
    cid.add_argument("source")
    cid.add_argument("target")
    for name in ("delta-to-jsonl", "iceberg-to-jsonl"):
        ej = sub.add_parser(name)
        ej.add_argument("source")
        ej.add_argument("target")
        ej.add_argument("--max-records-per-file", type=int, default=100_000)
    for name in ("delta-to-avro", "iceberg-to-avro", "parquet-to-avro"):
        ea = sub.add_parser(
            name, help="typed Avro OCF export (round-trips avro-to-*)"
        )
        ea.add_argument("source")
        ea.add_argument("target")
        ea.add_argument("--rows-per-file", type=int, default=100_000)
    for name in ("delta-to-orc", "iceberg-to-orc", "parquet-to-orc"):
        eo = sub.add_parser(name, help="ORC export (round-trips orc-to-*)")
        eo.add_argument("source")
        eo.add_argument("target")
        eo.add_argument("--compression", default="zstd")
    wds = sub.add_parser("export-webdataset")
    wds.add_argument("source", help="parquet path, or delta:/iceberg: prefixed table")
    wds.add_argument("target")
    wds.add_argument("--key-col", required=True)
    wds.add_argument("--payload-col", required=True)
    wds.add_argument("--meta-cols", default=None, help="comma-separated metadata columns")
    wds.add_argument("--shard-rows", type=int, default=1000)
    cr = sub.add_parser("tag-iceberg")
    cr.add_argument("target")
    cr.add_argument("name")
    cr.add_argument("--snapshot-id", type=int, default=None)
    cr.add_argument("--branch", action="store_true", help="movable branch instead of a tag")
    dr = sub.add_parser("drop-ref-iceberg")
    dr.add_argument("target")
    dr.add_argument("name")
    eqd = sub.add_parser("eqdelete-iceberg")
    eqd.add_argument("target")
    eqd.add_argument(
        "--keys-from", required=True, help="parquet path holding the key values"
    )
    eqd.add_argument(
        "--key-cols", required=True, help="comma-separated equality columns"
    )
    for name in ("merge-delta", "merge-iceberg"):
        mg = sub.add_parser(
            name,
            help="keyed MERGE (upsert, optional tombstones) from a parquet "
            "source — composite keys supported",
        )
        mg.add_argument("target")
        mg.add_argument("--source", required=True, help="parquet path of the merge source rows")
        mg.add_argument("--key", required=True, help="key column(s), comma-separated")
        mg.add_argument(
            "--delete-col",
            default=None,
            help="boolean tombstone column: flagged rows DELETE their key "
            "(merge_postgres_wire's CDC-apply shape)",
        )
        if name == "merge-delta":
            mg.add_argument(
                "--mode",
                choices=["copy-on-write", "merge-on-read"],
                default="copy-on-write",
            )
    cdi = sub.add_parser("convert-delta-to-iceberg")
    cdi.add_argument("source")
    cdi.add_argument("target")
    addc = sub.add_parser("add-constraint")
    addc.add_argument("target")
    addc.add_argument("--name", required=True)
    addc.add_argument("--check", required=True, help="SQL expression every row must satisfy")
    dropc = sub.add_parser("drop-constraint")
    dropc.add_argument("target")
    dropc.add_argument("--name", required=True)
    chd = sub.add_parser("changes-delta")
    chd.add_argument("source", help="delta table to read the change feed from")
    chd.add_argument("target", help="parquet directory for the exported change rows")
    chd.add_argument("--since", type=int, required=True, help="exclusive version floor")
    chd.add_argument("--end", type=int, default=None, help="inclusive ceiling (default latest)")
    for name in ("delete-delta", "delete-iceberg"):
        dd = sub.add_parser(name)
        dd.add_argument("target")
        dd.add_argument(
            "--where", required=True, help="SQL predicate; matching rows are deleted"
        )
        if name == "delete-iceberg":
            dd.add_argument(
                "--strategy",
                choices=("copy-on-write", "merge-on-read", "merge-on-read-dv"),
                default="copy-on-write",
                help="copy-on-write rewrites matched files; merge-on-read "
                "commits position-delete files (spec v2) applied at read "
                "time; merge-on-read-dv commits Puffin deletion vectors "
                "(spec v3, one superseding bitmap per target file)",
            )
        else:
            dd.add_argument(
                "--mode",
                choices=("copy-on-write", "merge-on-read"),
                default="copy-on-write",
                help="copy-on-write rewrites matched files; merge-on-read "
                "commits roaring-bitmap deletion vectors applied at read time",
            )
    for src in ("parquet", "delta", "iceberg"):
        ep = sub.add_parser(f"{src}-to-pg")
        ep.add_argument("source")
        ep.add_argument("target", help="libpq URL of the destination server")
        ep.add_argument("--table", required=True, help="destination table name")
        ep.add_argument(
            "--mode",
            choices=("error", "overwrite", "append"),
            default="error",
            help="error: create, fail if the table exists; overwrite: "
            "replace contents; append — all publish atomically via a "
            "job-scoped staging table",
        )
    rp = sub.add_parser(
        "replicate-to-pg",
        help="incremental lakehouse→Postgres replication: each invocation "
        "publishes everything appended since the checkpointed cursor, "
        "exactly-once via the txn ledger (streaming/tail.py)",
    )
    rp.add_argument("source", help="delta or iceberg table (auto-detected)")
    rp.add_argument("target", help="libpq URL of the destination server")
    rp.add_argument("--table", required=True, help="destination table name")
    rp.add_argument(
        "--checkpoint",
        required=True,
        help="cursor directory; run 0 snapshots the table, later runs "
        "append only the fresh window",
    )
    rp.add_argument(
        "--key",
        action="append",
        default=None,
        help="repeatable key column: switches to the row-level change "
        "feed, replicating source DML as keyed upserts/deletes instead "
        "of refusing non-append history",
    )
    mi = sub.add_parser(
        "mirror",
        help="incremental lakehouse→lakehouse replication (cross-format): "
        "each invocation mirrors everything committed since the "
        "checkpointed cursor, exactly-once via the destination's txn/"
        "summary watermark (streaming/tail.py mirror_table)",
    )
    mi.add_argument("source", help="delta or iceberg table (auto-detected)")
    mi.add_argument("target", help="destination table path")
    mi.add_argument(
        "--checkpoint",
        required=True,
        help="cursor directory; run 0 snapshots the table, later runs "
        "mirror only the fresh window",
    )
    mi.add_argument(
        "--to",
        choices=["delta", "iceberg"],
        default=None,
        help="destination format (default: same as the source)",
    )
    mi.add_argument(
        "--key",
        default=None,
        help="key column(s), comma-separated: switches to the row-level "
        "change feed, applying source DML as one keyed merge (upserts + "
        "tombstones) per window",
    )
    mi.add_argument(
        "--on-schema-change",
        choices=["refuse", "evolve"],
        default="refuse",
        help="source gained a column: refuse (default, names the columns "
        "and remedies) or evolve (nullable ADD COLUMN on the destination); "
        "a DROPPED source column refuses either way",
    )
    for name in ("sync-iceberg-metadata", "sync-delta-metadata"):
        sy = sub.add_parser(
            name,
            help="generate the other format's metadata over this table's "
            "current snapshot (UniForm/XTable-style mirror; refuses live "
            "deletes and partitioned tables)",
        )
        sy.add_argument("target")
    for name in ("scan-delta", "scan-iceberg"):
        sc = sub.add_parser(name)
        sc.add_argument("source", help="table to scan")
        sc.add_argument("target", help="parquet directory for the result rows")
        sc.add_argument(
            "--pred",
            action="append",
            required=True,
            metavar="'COL OP VALUE'",
            help="repeatable AND-ed predicate: 'col = v', 'col >= v', "
            "'col between lo hi', 'col in v1,v2,...'; ' | '-separated "
            "atoms inside one --pred form an OR-group — planned via "
            "partition pruning + file stats before any data is read",
        )
        sc.add_argument("--columns", default=None, help="comma-separated projection")
    dsc = sub.add_parser(
        "describe", help="one-row table summary (either format, auto-detected)"
    )
    dsc.add_argument("target")
    anz = sub.add_parser(
        "analyze-iceberg",
        help="ANALYZE TABLE: per-column NDV theta sketches -> Puffin statistics",
    )
    anz.add_argument("target")
    anz.add_argument("--columns", default=None, help="comma-separated (default: all primitive)")
    for name, h in (
        ("enable-cdf", "enable Change Data Feed (DML persists _change_data + cdc)"),
        ("enable-ict", "enable in-commit timestamps (mtime-proof time travel)"),
        ("enable-v2-checkpoints", "checkpoints in the v2 manifest+sidecar layout"),
        ("enable-column-mapping", "name-mode column mapping (metadata-only ALTERs)"),
    ):
        en = sub.add_parser(name, help=h)
        en.add_argument("target")
    ert = sub.add_parser(
        "enable-row-tracking",
        help="row ids + commit versions per row (backfills live files)",
    )
    ert.add_argument("target")
    cby = sub.add_parser(
        "cluster-by", help="declare liquid-clustering columns (OPTIMIZE re-clusters)"
    )
    cby.add_argument("target")
    cby.add_argument("columns", help="comma-separated")
    sdm = sub.add_parser("set-domain", help="set user domain metadata (atomic, replayed)")
    sdm.add_argument("target"); sdm.add_argument("domain"); sdm.add_argument("config")
    rdm = sub.add_parser("remove-domain", help="tombstone a user metadata domain")
    rdm.add_argument("target"); rdm.add_argument("domain")
    rn = sub.add_parser("rename-column", help="ALTER ... RENAME COLUMN (mapped tables)")
    rn.add_argument("target"); rn.add_argument("old"); rn.add_argument("new")
    dc = sub.add_parser("drop-column", help="ALTER ... DROP COLUMN (mapped tables)")
    dc.add_argument("target"); dc.add_argument("column")
    erl = sub.add_parser(
        "enable-row-lineage-iceberg",
        help="spec-v3 row lineage (backfills first_row_id ranges)",
    )
    erl.add_argument("target")
    soi = sub.add_parser(
        "sort-order-iceberg",
        help="declare the default sort order (writes + OPTIMIZE cluster by it)",
    )
    soi.add_argument("target")
    soi.add_argument(
        "fields",
        help="comma-separated 'col [asc|desc] [nulls first|last]' specs; "
        "empty string resets to unsorted",
    )
    for name, h in (
        ("push-table", "sync a local Delta/Iceberg table to an object store "
         "(data files multipart, commits conditional-created in version "
         "order; incremental re-push skips existing objects)"),
        ("pull-table", "materialize a pushed table back to a local directory"),
    ):
        ps = sub.add_parser(name, help=h)
        ps.add_argument("target", help="local table dir (push) / dest dir (pull)")
        ps.add_argument("bucket")
        ps.add_argument("prefix")
        ps.add_argument("--store", choices=("s3", "gcs", "azure"), required=True)
        ps.add_argument(
            "--endpoint", required=True,
            help="http endpoint; credentials from the scheme-keyed "
            "AWS_*/GOOGLE_*/AZURE_* environment",
        )
    rni = sub.add_parser("rename-column-iceberg", help="Iceberg metadata-only RENAME")
    rni.add_argument("target"); rni.add_argument("old"); rni.add_argument("new")
    dci = sub.add_parser("drop-column-iceberg", help="Iceberg metadata-only DROP")
    dci.add_argument("target"); dci.add_argument("column")
    ac = sub.add_parser(
        "add-column",
        help="ALTER ... ADD COLUMN (nullable; mapped or unmapped tables)",
    )
    ac.add_argument("target"); ac.add_argument("column"); ac.add_argument("dtype")
    for name in ("snapshots-iceberg", "files-iceberg", "manifests-iceberg",
                 "refs-iceberg", "files-delta", "history-delta"):
        ins = sub.add_parser(name, help="metadata inspection table (prints rows)")
        ins.add_argument("target")
    for name in ("update-delta", "update-iceberg"):
        ud = sub.add_parser(name)
        ud.add_argument("target")
        ud.add_argument(
            "--where", required=True, help="SQL predicate; matching rows are updated"
        )
        ud.add_argument(
            "--set",
            action="append",
            required=True,
            metavar="COL=EXPR",
            help="column assignment, repeatable; EXPR is SQL over the row",
        )
        ud.add_argument(
            "--mode",
            choices=("copy-on-write", "merge-on-read"),
            default="copy-on-write",
            help="copy-on-write rewrites matched files; merge-on-read masks "
            "them and appends updated copies (write cost ∝ matched rows)",
        )
    return p


def _split_key_cols(raw: str) -> list[str]:
    """Comma-separated key list → clean column names: strip whitespace and
    refuse empty segments up front — ``--key 'region, id'`` or a trailing
    comma would otherwise reach the merge as the bogus column ``' id'``/
    ``''`` and die deep inside Spark analysis instead of argparse."""
    cols = [c.strip() for c in raw.split(",")]
    if any(not c for c in cols):
        raise SystemExit(
            f"--key: empty column name in {raw!r} (check for doubled or "
            "trailing commas)"
        )
    return cols


def _parse_preds(raws: list[str]) -> list:
    """CLI predicate mini-grammar shared by scan-* and optimize-iceberg:
    each string is 'col op value' / 'col between lo hi' / 'col in a,b,c';
    ' | '-separated atoms in one string form an OR-group."""

    def _parse_value(s: str):
        for cast in (int, float):
            try:
                return cast(s)
            except ValueError:
                pass
        return s

    def _parse_atom(raw: str):
        toks = raw.split()
        if len(toks) == 3 and toks[1].lower() == "in":
            return (toks[0], "in", [_parse_value(v) for v in toks[2].split(",")])
        if len(toks) == 4 and toks[1].lower() == "between":
            return (toks[0], "between", _parse_value(toks[2]), _parse_value(toks[3]))
        if len(toks) == 3:
            return (toks[0], toks[1], _parse_value(toks[2]))
        print(f"bad --pred {raw!r}", file=sys.stderr)
        sys.exit(2)

    preds = []
    for raw in raws:
        atoms = [_parse_atom(a.strip()) for a in raw.split("|")]
        preds.append(atoms[0] if len(atoms) == 1 else atoms)
    return preds


def _object_store_client(kind: str, endpoint: str):
    if kind == "s3":
        from lakehouse_loader_spark.sinks.s3http import S3Client

        return S3Client.from_env(endpoint)
    if kind == "gcs":
        from lakehouse_loader_spark.sinks.s3http import GcsXmlClient

        return GcsXmlClient.from_env(endpoint)
    from lakehouse_loader_spark.sinks.azureblob import AzureBlobClient

    return AzureBlobClient.from_env(endpoint)


def do_main(argv: list[str]) -> None:
    args = build_parser().parse_args(argv)
    if args.command in ("push-table", "pull-table"):
        # pure-IO table<->object-store sync: no SparkSession needed
        from lakehouse_loader_spark.sinks import object_sync as SY

        store = _object_store_client(args.store, args.endpoint)
        if args.command == "push-table":
            res = SY.sync_table(args.target, store, args.bucket, args.prefix)
            print(
                f"pushed {args.target} -> {args.bucket}/{args.prefix}: "
                f"{res['uploaded']} uploaded, {res['commits']} commits, "
                f"{res['skipped']} skipped"
            )
        else:
            n = SY.fetch_table(store, args.bucket, args.prefix, args.target)
            print(f"pulled {args.bucket}/{args.prefix} -> {args.target}: {n} objects")
        return
    spark = get_spark("lhl-spark-cli")
    # cloud targets: apply scheme-keyed credentials + multipart policy to the
    # Hadoop conf, mirroring the reference's CompatObjectStore env pickup
    # (delta_destination.rs:244-250); no-op for local/file:// targets
    from lakehouse_loader_spark.sinks.object_store import apply_object_store_conf

    try:
        # pg targets are server URLs, not object-store paths
        if not args.command.endswith("-to-pg"):
            apply_object_store_conf(spark, args.target)
    except ValueError as exc:
        print(str(exc), file=sys.stderr)
        sys.exit(2)
    if args.command in ("optimize-delta", "optimize-iceberg"):
        if args.command == "optimize-delta":
            from lakehouse_loader_spark.sinks.delta import optimize_delta as _opt
        else:
            from lakehouse_loader_spark.sinks.iceberg import optimize_iceberg as _opt

        zorder = args.zorder_by.split(",") if args.zorder_by else None
        kwargs = {}
        if getattr(args, "pred", None):
            kwargs["where"] = _parse_preds(args.pred)
        _opt(
            spark, args.target,
            target_partitions=args.target_partitions, zorder_by=zorder,
            small_file_threshold=args.small_file_threshold,
            **kwargs,
        )
        return
    if args.command == "vacuum-delta":
        from lakehouse_loader_spark.sinks.delta import vacuum_delta

        removed = vacuum_delta(args.target, retain_versions=args.retain_versions)
        print(f"removed {len(removed)} unreferenced files", file=sys.stderr)
        return
    if args.command == "expire-snapshots":
        from lakehouse_loader_spark.sinks.iceberg import expire_snapshots

        deleted = expire_snapshots(args.target, keep_last=args.keep_last)
        print(f"deleted {len(deleted)} expired files", file=sys.stderr)
        return
    if args.command == "rewrite-manifests":
        from lakehouse_loader_spark.sinks.iceberg import rewrite_manifests

        res = rewrite_manifests(args.target, min_count=args.min_count)
        print(
            f"manifests {res['manifests_before']} -> {res['manifests_after']}",
            file=sys.stderr,
        )
        return
    if args.command == "remove-orphans":
        from lakehouse_loader_spark.sinks.iceberg import remove_orphan_files

        removed = remove_orphan_files(args.target, older_than_s=args.older_than_hours * 3600)
        print(f"removed {len(removed)} orphan files", file=sys.stderr)
        return
    if args.command == "build-ann-index":
        from pyspark.sql import functions as F

        if args.source_format == "parquet":
            emb = spark.read.parquet(args.source)
        elif args.source_format == "delta":
            from lakehouse_loader_spark.sinks.delta import read_delta

            emb = read_delta(spark, args.source)
        else:
            from lakehouse_loader_spark.sinks.iceberg import read_iceberg

            emb = read_iceberg(spark, args.source)
        if args.kind == "ivf":
            from lakehouse_loader_spark.operators.similarity import (
                assign_ivf_cells,
                train_ivf_centroids_sampled,
            )
            from lakehouse_loader_spark.sinks.ann_index import save_ivf_index

            cents = train_ivf_centroids_sampled(
                emb,
                n_centroids=args.n_centroids,
                id_col=args.id_col,
                vec_col=args.vec_col,
            )
            inv = assign_ivf_cells(
                emb, cents, id_col=args.id_col, vec_col=args.vec_col
            )
            save_ivf_index(spark, inv, cents, args.target, fmt=args.fmt)
            print(
                f"built ivf index ({args.n_centroids} centroids, "
                f"{args.fmt}) at {args.target}",
                file=sys.stderr,
            )
        else:
            from lakehouse_loader_spark.operators import spread
            from lakehouse_loader_spark.operators.similarity import (
                with_lsh_buckets,
            )
            from lakehouse_loader_spark.sinks.ann_index import save_lsh_index

            idx = with_lsh_buckets(
                spread(emb),
                args.dim,
                args.n_tables,
                args.planes_per_table,
                args.vec_col,
            ).select(
                F.col(args.id_col).alias("n_id"),
                F.col(args.vec_col).alias("n_vec"),
                "lsh_key",
            )
            save_lsh_index(
                spark,
                idx,
                args.dim,
                args.n_tables,
                args.planes_per_table,
                args.target,
                fmt=args.fmt,
            )
            print(
                f"built lsh index ({args.n_tables}x{args.planes_per_table} "
                f"planes, {args.fmt}) at {args.target}",
                file=sys.stderr,
            )
        return
    if args.command == "refresh-agg":
        from lakehouse_loader_spark.sinks.incremental import refresh_aggregate

        aggs: dict[str, tuple[str, str]] = {}
        for spec in args.agg:
            try:
                out, fn, col = spec.split(":", 2)
            except ValueError:
                print(f"bad --agg spec {spec!r}, want OUT:FN:COL", file=sys.stderr)
                sys.exit(2)
            aggs[out] = (fn, col)
        res = refresh_aggregate(
            spark, args.source, args.target,
            group_by=args.group_by.split(","), aggs=aggs, app_id=args.app_id,
            source_format=args.source_format, on_rewrite=args.on_rewrite,
        )
        print(
            f"folded versions {res['since']}..{res['through']} "
            f"({res['delta_rows']} delta rows, refreshed={res['refreshed']})",
            file=sys.stderr,
        )
        return
    if args.command in ("delete-delta", "delete-iceberg"):
        if args.command == "delete-delta":
            from lakehouse_loader_spark.sinks.delta import delete_from_delta as _delete

            res = _delete(spark, args.target, args.where, mode=args.mode)
        else:
            from lakehouse_loader_spark.sinks.iceberg import delete_from_iceberg as _delete

            res = _delete(spark, args.target, args.where, strategy=args.strategy)
        if "delete_files" in res:  # iceberg merge-on-read result shape
            print(
                f"deleted {res['deleted_rows']} rows "
                f"(wrote {res['delete_files']} position-delete files, "
                f"{res['data_files']} data files untouched)",
                file=sys.stderr,
            )
        elif "dv_files" in res:  # delta merge-on-read result shape
            print(
                f"deleted {res['deleted_rows']} rows "
                f"(deletion vectors on {res['dv_files']} files, "
                f"{res['removed_files']} fully-dead files dropped)",
                file=sys.stderr,
            )
        else:
            print(
                f"deleted {res['deleted_rows']} rows "
                f"(rewrote {res['rewritten_files']} files, kept {res['kept_files']})",
                file=sys.stderr,
            )
        return
    if args.command in ("update-delta", "update-iceberg"):
        if args.command == "update-delta":
            from lakehouse_loader_spark.sinks.delta import update_delta as _update
        else:
            from lakehouse_loader_spark.sinks.iceberg import update_iceberg as _update

        set_exprs: dict[str, str] = {}
        for spec in args.set:
            if "=" not in spec:
                print(f"bad --set spec {spec!r}, want COL=EXPR", file=sys.stderr)
                sys.exit(2)
            col, expr = spec.split("=", 1)
            set_exprs[col.strip()] = expr
        if args.command == "update-delta":
            res = _update(spark, args.target, args.where, set_exprs, mode=args.mode)
        else:
            res = _update(
                spark, args.target, args.where, set_exprs, strategy=args.mode
            )
        detail = (
            f"rewrote {res['rewritten_files']} files, kept {res['kept_files']}"
            if "rewritten_files" in res
            else f"masked into {res.get('dv_files', res.get('delete_files', 0))} "
            f"delete structures, {res['new_files']} new files"
        )
        print(f"updated {res['updated_rows']} rows ({detail})", file=sys.stderr)
        return
    if args.command == "add-constraint":
        from lakehouse_loader_spark.sinks.delta import (
            add_check_constraint,
            check_table_constraints,
        )

        add_check_constraint(args.target, args.name, args.check)
        # fail loudly if EXISTING rows already violate the new constraint
        check_table_constraints(spark, args.target)
        print(f"added CHECK constraint {args.name}", file=sys.stderr)
        return
    if args.command == "drop-constraint":
        from lakehouse_loader_spark.sinks.delta import drop_check_constraint

        drop_check_constraint(args.target, args.name)
        print(f"dropped CHECK constraint {args.name}", file=sys.stderr)
        return
    if args.command in ("scan-delta", "scan-iceberg"):
        preds = _parse_preds(args.pred)
        cols = args.columns.split(",") if args.columns else None
        if args.command == "scan-delta":
            from lakehouse_loader_spark.sinks.delta import scan_delta_with_plan as _scan
        else:
            from lakehouse_loader_spark.sinks.iceberg import (
                scan_iceberg_with_plan as _scan,
            )
        out, plan = _scan(spark, args.source, preds, cols)
        out.write.mode("errorifexists").parquet(args.target)
        print(
            f"scanned {len(plan['files'])}/{plan['total']} files "
            f"(partition-pruned {plan['excluded_by_partition']}, "
            f"stats-pruned {plan['excluded_by_stats']}) -> {args.target}",
            file=sys.stderr,
        )
        return
    if args.command == "changes-delta":
        from lakehouse_loader_spark.sinks.delta import read_delta_changes

        changes = read_delta_changes(spark, args.source, args.since, args.end)
        changes.write.mode("errorifexists").parquet(args.target)
        print(
            f"exported {changes.count()} change rows "
            f"(since v{args.since}) to {args.target}",
            file=sys.stderr,
        )
        return
    if args.command == "convert-delta-to-iceberg":
        from lakehouse_loader_spark.sinks.iceberg import convert_delta_to_iceberg

        res = convert_delta_to_iceberg(args.source, args.target)
        print(
            f"converted {res['files']} files / {res['rows']} rows "
            f"(snapshot {res['snapshot_id']})",
            file=sys.stderr,
        )
        return
    if args.command == "convert-iceberg-to-delta":
        from lakehouse_loader_spark.sinks.delta import convert_iceberg_to_delta

        res = convert_iceberg_to_delta(args.source, args.target)
        print(
            f"converted {res['files']} files / {res['rows']} rows",
            file=sys.stderr,
        )
        return
    if args.command in ("delta-to-avro", "iceberg-to-avro", "parquet-to-avro"):
        from lakehouse_loader_spark.sinks.export import export_avro

        fmt = args.command.split("-to-")[0]
        if fmt == "delta":
            from lakehouse_loader_spark.sinks.delta import read_delta as _ra

            src_df = _ra(spark, args.source)
        elif fmt == "iceberg":
            from lakehouse_loader_spark.sinks.iceberg import read_iceberg as _ra

            src_df = _ra(spark, args.source)
        else:
            src_df = read_parquet_source(spark, args.source)
        manifest = export_avro(
            src_df, args.target, rows_per_file=args.rows_per_file
        ).collect()
        print(
            f"exported {sum(m.rows for m in manifest)} rows in "
            f"{len(manifest)} avro parts to {args.target}",
            file=sys.stderr,
        )
        return
    if args.command in (
        "enable-cdf", "enable-ict", "enable-v2-checkpoints",
        "enable-column-mapping", "rename-column", "drop-column", "add-column",
        "enable-row-tracking", "cluster-by", "set-domain", "remove-domain",
    ):
        from lakehouse_loader_spark.sinks import delta as _dl

        if args.command == "enable-row-tracking":
            _dl.enable_row_tracking(args.target)
        elif args.command == "cluster-by":
            _dl.enable_clustering(args.target, args.columns.split(","))
        elif args.command == "set-domain":
            _dl.set_domain_metadata(args.target, args.domain, args.config)
        elif args.command == "remove-domain":
            _dl.remove_domain_metadata(args.target, args.domain)
        elif args.command == "enable-cdf":
            _dl.enable_change_data_feed(args.target)
        elif args.command == "enable-ict":
            _dl.enable_in_commit_timestamps(args.target)
        elif args.command == "enable-v2-checkpoints":
            _dl.enable_v2_checkpoints(args.target)
        elif args.command == "enable-column-mapping":
            _dl.enable_column_mapping(args.target)
        elif args.command == "rename-column":
            _dl.rename_column(args.target, args.old, args.new)
        elif args.command == "drop-column":
            _dl.drop_column(args.target, args.column)
        else:
            _dl.add_column(args.target, args.column, args.dtype)
        print(f"{args.command} done on {args.target}", file=sys.stderr)
        return
    if args.command in (
        "rename-column-iceberg", "drop-column-iceberg",
        "enable-row-lineage-iceberg", "sort-order-iceberg",
    ):
        from lakehouse_loader_spark.sinks import iceberg as _ic

        if args.command == "rename-column-iceberg":
            _ic.rename_column_iceberg(args.target, args.old, args.new)
        elif args.command == "enable-row-lineage-iceberg":
            _ic.enable_row_lineage_iceberg(args.target)
        elif args.command == "sort-order-iceberg":
            specs = [s.strip() for s in args.fields.split(",") if s.strip()]
            _ic.set_sort_order_iceberg(args.target, specs)
        else:
            _ic.drop_column_iceberg(args.target, args.column)
        print(f"{args.command} done on {args.target}", file=sys.stderr)
        return
    if args.command == "analyze-iceberg":
        from lakehouse_loader_spark.sinks.iceberg import analyze_iceberg

        cols = args.columns.split(",") if args.columns else None
        ndvs = analyze_iceberg(spark, args.target, columns=cols)
        for c, n in sorted(ndvs.items()):
            print(f"{c}\tndv={n}", file=sys.stderr)
        return
    _inspect_cmds = {
        "describe", "snapshots-iceberg", "files-iceberg", "manifests-iceberg",
        "refs-iceberg", "files-delta", "history-delta",
    }
    if args.command in _inspect_cmds:
        from lakehouse_loader_spark.sinks import inspect as INS

        fn = {
            "describe": INS.describe_detail,
            "snapshots-iceberg": INS.iceberg_snapshots,
            "files-iceberg": INS.iceberg_files,
            "manifests-iceberg": INS.iceberg_manifests,
            "refs-iceberg": INS.iceberg_refs,
            "files-delta": INS.delta_files,
            "history-delta": INS.delta_history,
        }[args.command]
        fn(spark, args.target).show(1000, truncate=False)
        return
    if args.command in ("delta-to-orc", "iceberg-to-orc", "parquet-to-orc"):
        from lakehouse_loader_spark.sinks.export import export_orc

        fmt = args.command.split("-to-")[0]
        if fmt == "delta":
            from lakehouse_loader_spark.sinks.delta import read_delta as _ro

            src_df = _ro(spark, args.source)
        elif fmt == "iceberg":
            from lakehouse_loader_spark.sinks.iceberg import read_iceberg as _ro

            src_df = _ro(spark, args.source)
        else:
            src_df = read_parquet_source(spark, args.source)
        parts = export_orc(src_df, args.target, compression=args.compression)
        print(f"exported {parts} orc parts to {args.target}", file=sys.stderr)
        return
    if args.command in ("delta-to-jsonl", "iceberg-to-jsonl"):
        from lakehouse_loader_spark.sinks.export import export_jsonl

        if args.command == "delta-to-jsonl":
            from lakehouse_loader_spark.sinks.delta import read_delta as _rd
        else:
            from lakehouse_loader_spark.sinks.iceberg import read_iceberg as _rd
        n = export_jsonl(
            _rd(spark, args.source),
            args.target,
            max_records_per_file=args.max_records_per_file,
        )
        print(f"exported {n} jsonl parts to {args.target}", file=sys.stderr)
        return
    if args.command == "tag-iceberg":
        from lakehouse_loader_spark.sinks.iceberg import create_ref, resolve_ref

        create_ref(
            args.target,
            args.name,
            snapshot_id=args.snapshot_id,
            ref_type="branch" if args.branch else "tag",
        )
        print(
            f"{'branch' if args.branch else 'tag'} {args.name} -> "
            f"{resolve_ref(args.target, args.name)}",
            file=sys.stderr,
        )
        return
    if args.command == "drop-ref-iceberg":
        from lakehouse_loader_spark.sinks.iceberg import drop_ref

        drop_ref(args.target, args.name)
        print(f"dropped ref {args.name}", file=sys.stderr)
        return
    if args.command in ("merge-delta", "merge-iceberg"):
        src = spark.read.parquet(args.source)
        keys = _split_key_cols(args.key)
        if args.command == "merge-delta":
            from lakehouse_loader_spark.sinks.delta import merge_delta

            res = merge_delta(
                spark, args.target, src, keys,
                mode=args.mode, delete_col=args.delete_col,
            )
        else:
            from lakehouse_loader_spark.sinks.iceberg import merge_iceberg

            res = merge_iceberg(
                spark, args.target, src, keys, delete_col=args.delete_col
            )
        deleted = f", {res['deleted']} deleted" if "deleted" in res else ""
        print(
            f"merged: {res['updated']} updated, {res['inserted']} inserted"
            f"{deleted}",
            file=sys.stderr,
        )
        return
    if args.command == "eqdelete-iceberg":
        from lakehouse_loader_spark.sinks.iceberg import equality_delete_iceberg

        cols = args.key_cols.split(",")
        res = equality_delete_iceberg(
            spark,
            args.target,
            spark.read.parquet(args.keys_from).select(*cols),
            key_cols=cols,
        )
        print(
            f"committed {res['key_rows']} delete keys "
            f"({res['delete_files']} equality-delete files)",
            file=sys.stderr,
        )
        return
    if args.command == "export-webdataset":
        from lakehouse_loader_spark.sinks.export import export_webdataset

        src = args.source
        if src.startswith("delta:"):
            from lakehouse_loader_spark.sinks.delta import read_delta

            df = read_delta(spark, src[len("delta:") :])
        elif src.startswith("iceberg:"):
            from lakehouse_loader_spark.sinks.iceberg import read_iceberg

            df = read_iceberg(spark, src[len("iceberg:") :])
        else:
            df = spark.read.parquet(src)
        meta_cols = args.meta_cols.split(",") if args.meta_cols else []
        manifest = export_webdataset(
            df,
            args.target,
            key_col=args.key_col,
            payload_col=args.payload_col,
            meta_cols=meta_cols,
            shard_rows=args.shard_rows,
        ).collect()
        print(
            f"wrote {len(manifest)} shards / "
            f"{sum(m.n_entries for m in manifest)} samples to {args.target}",
            file=sys.stderr,
        )
        return
    if args.command.startswith("sync-"):
        from lakehouse_loader_spark.sinks.interop import (
            sync_delta_from_iceberg,
            sync_iceberg_from_delta,
        )

        fn = (
            sync_iceberg_from_delta
            if args.command == "sync-iceberg-metadata"
            else sync_delta_from_iceberg
        )
        print(fn(args.target), file=sys.stderr)
        return
    if args.command == "mirror":
        from lakehouse_loader_spark.streaming.tail import mirror_table

        res = mirror_table(
            spark,
            args.source,
            args.target,
            args.checkpoint,
            key_cols=_split_key_cols(args.key) if args.key else None,
            dst_fmt=args.to,
            on_schema_change=args.on_schema_change,
        )
        if res["empty"]:
            print("no new commits since the cursor", file=sys.stderr)
        else:
            print(
                f"run {res['run']}: mirrored {res['rows']} rows to "
                f"{args.target} [{res['dst_fmt']}] (cursor -> {res['cursor']})",
                file=sys.stderr,
            )
        return
    if args.command == "replicate-to-pg":
        from lakehouse_loader_spark.streaming.tail import (
            replicate_appends_to_postgres,
            replicate_changes_to_postgres,
        )

        if args.key:
            res = replicate_changes_to_postgres(
                spark,
                args.source,
                args.target,
                args.table,
                args.checkpoint,
                key_cols=args.key,
            )
        else:
            res = replicate_appends_to_postgres(
                spark, args.source, args.target, args.table, args.checkpoint
            )
        if res["empty"]:
            print("no new commits since the cursor", file=sys.stderr)
        else:
            print(
                f"run {res['run']}: published {res['rows']} rows to "
                f"{args.table} (cursor -> {res['cursor']})",
                file=sys.stderr,
            )
        return
    if args.command.endswith("-to-pg"):
        from lakehouse_loader_spark.sources.pgwire import write_postgres_wire

        src_fmt = args.command.split("-to-")[0]
        if src_fmt == "delta":
            from lakehouse_loader_spark.sinks.delta import read_delta

            src_df = read_delta(spark, args.source)
        elif src_fmt == "iceberg":
            from lakehouse_loader_spark.sinks.iceberg import read_iceberg

            src_df = read_iceberg(spark, args.source)
        else:
            src_df = read_parquet_source(spark, args.source)
        n = write_postgres_wire(
            src_df,
            args.target,
            args.table,
            mode=args.mode,
            password=os.environ.get("PGPASSWORD"),
        )
        print(f"wrote {n} rows to {args.table}", file=sys.stderr)
        return
    fmt = args.command.split("-to-")[0]
    if fmt == "pg":
        part_args = (
            args.partition_column,
            args.num_partitions,
            args.lower_bound,
            args.upper_bound,
        )
        if any(a is not None for a in part_args):
            if any(a is None for a in part_args):
                raise SystemExit(
                    "--partition-column, --num-partitions, --lower-bound and "
                    "--upper-bound must be given together"
                )
            from lakehouse_loader_spark.sources.readers import (
                read_postgres_table_parallel,
            )

            df = read_postgres_table_parallel(
                spark,
                args.source,
                table=f"({args.query}) lhl_src",
                partition_column=args.partition_column,
                lower_bound=args.lower_bound,
                upper_bound=args.upper_bound,
                num_partitions=args.num_partitions,
                batch_size=args.batch_size,
                password=os.environ.get("PGPASSWORD"),
                driver=args.pg_driver,
            )
        else:
            df = read_postgres_query(
                spark,
                args.source,
                args.query,
                batch_size=args.batch_size,
                password=os.environ.get("PGPASSWORD"),
                driver=args.pg_driver,
            )
    elif fmt == "csv":
        df = read_csv_source(spark, args.source, schema=args.schema, delimiter=args.delimiter)
    elif fmt == "jsonl":
        df = read_jsonl_source(spark, args.source, schema=args.schema)
    elif fmt == "avro":
        from lakehouse_loader_spark.sources.readers import read_avro_source

        df = read_avro_source(spark, args.source)
    elif fmt == "orc":
        from lakehouse_loader_spark.sources.readers import read_orc_source

        df = read_orc_source(spark, args.source)
    else:
        df = read_parquet_source(spark, args.source)
    append = getattr(args, "append", False)
    evolve = getattr(args, "evolve_schema", False)
    if evolve and not append:
        print("--evolve-schema only applies to appends (-a)", file=sys.stderr)
        sys.exit(2)
    bloom = args.bloom_filter.split(",") if getattr(args, "bloom_filter", None) else None
    sort_by = args.sort_by.split(",") if getattr(args, "sort_by", None) else None
    try:
        if args.command.endswith("delta"):
            from lakehouse_loader_spark.sinks.delta import write_delta

            gen = None
            if getattr(args, "generated", None):
                gen = dict(g.split("=", 1) for g in args.generated)
            write_delta(
                df, args.target, overwrite=args.overwrite, append=append,
                merge_schema=evolve, bloom_filter_columns=bloom, sort_by=sort_by,
                generated_columns=gen,
            )
        else:
            from lakehouse_loader_spark.sinks.iceberg import write_iceberg

            write_iceberg(
                df, args.target, overwrite=args.overwrite, append=append,
                evolve_schema=evolve, bloom_filter_columns=bloom, sort_by=sort_by,
            )
    except TargetExistsError:
        # Reference message (src/delta_destination.rs:421-427), but exit
        # nonzero — a silent no-op success hides data-loss-shaped mistakes
        # from scripted pipelines (deviation documented in write_delta).
        print(
            f"{args.target} already contains data, pass --overwrite to overwrite",
            file=sys.stderr,
        )
        sys.exit(1)
    except ValueError as exc:
        # e.g. a cloud URI target: the conf contract is applied above, but
        # executing the write needs the connector jar on the classpath
        print(str(exc), file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    do_main(sys.argv[1:])
