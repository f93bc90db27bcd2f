"""CLI mirroring the reference's four subcommands (src/lib.rs:26-80):

    lhl parquet-to-delta   SOURCE TARGET [-o] [--batch-size N]
    lhl pg-to-delta     -q QUERY SOURCE TARGET [-o] [--batch-size N]
    lhl parquet-to-iceberg SOURCE TARGET [-o] [-a]
    lhl pg-to-iceberg   -q QUERY SOURCE TARGET [-o] [-a]

Usage: python -m lakehouse_loader_spark.cli <subcommand> ...
"""

from __future__ import annotations

import argparse
import os
import sys

from lakehouse_loader_spark.session import get_spark
from lakehouse_loader_spark.sources.readers import (
    DEFAULT_BATCH_SIZE,
    read_parquet_source,
    read_postgres_query,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lhl-spark")
    sub = p.add_subparsers(dest="command", required=True)
    for name in ("parquet-to-delta", "pg-to-delta", "parquet-to-iceberg", "pg-to-iceberg"):
        sp = sub.add_parser(name)
        sp.add_argument("source")
        sp.add_argument("target")
        sp.add_argument("-o", "--overwrite", action="store_true")
        if name.endswith("iceberg"):
            sp.add_argument("-a", "--append", action="store_true")
        if name.startswith("pg"):
            sp.add_argument("-q", "--query", required=True)
            sp.add_argument("--batch-size", type=int, default=DEFAULT_BATCH_SIZE)
    return p


def do_main(argv: list[str]) -> None:
    args = build_parser().parse_args(argv)
    spark = get_spark("lhl-spark-cli")
    if args.command.startswith("pg"):
        df = read_postgres_query(
            spark,
            args.source,
            args.query,
            batch_size=args.batch_size,
            password=os.environ.get("PGPASSWORD"),
        )
    else:
        df = read_parquet_source(spark, args.source)
    append = getattr(args, "append", False)
    if args.command.endswith("delta"):
        from lakehouse_loader_spark.sinks.delta import write_delta

        write_delta(df, args.target, overwrite=args.overwrite, append=append)
    else:
        from lakehouse_loader_spark.sinks.iceberg import write_iceberg

        write_iceberg(df, args.target, overwrite=args.overwrite, append=append)


if __name__ == "__main__":
    do_main(sys.argv[1:])
