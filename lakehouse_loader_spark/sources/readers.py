"""Source readers.

Parquet (R6): the schema comes from the file footer, like the reference's
ParquetRecordBatchStreamBuilder (src/lib.rs:91-97); Spark's vectorized
reader replaces the async record-batch stream, and Catalyst pushes
predicates/projections into the scan.

Postgres (R1-R5): the reference prepares the user's SQL to learn the result
schema, then streams rows and pivots them into Arrow batches
(src/pg_arrow_source.rs:201-273).  Spark's JDBC source does all of that
natively: ``option("query", ...)`` prepares server-side for the schema,
``fetchsize`` bounds rows per round-trip (the analog of ``--batch-size``,
src/lib.rs:43-50), and the JDBC dialect performs the type mapping the
reference hand-rolls (NUMERIC→Decimal R4, epoch rebase R5 — both covered by
golden type tests in tests/test_types_roundtrip.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Reference default batch size (src/lib.rs:47)
DEFAULT_BATCH_SIZE = 10_000


def read_parquet_source(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv_source(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source (loader-surface extension beyond the reference's
    parquet/pg pair).  With no explicit ``schema`` the types are inferred
    from a sampling pass — fine interactively; production loads at scale
    should pass the DDL string so the scan is single-pass and the schema is
    frozen up front, the same inferred-then-frozen contract as the
    reference's prepare step (src/pg_arrow_source.rs:220-236).
    mode=FAILFAST surfaces malformed rows as load errors instead of
    silently nulling them (the reference panics on unsupported input,
    src/pg_arrow_source.rs:97)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jsonl_source(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines source — the lingua franca of document/training-data
    interchange.  One JSON object per line splits cleanly on newlines, so
    the scan parallelizes like any text file; nested objects surface as
    structs/arrays.  Same schema contract as CSV: pass DDL to freeze the
    schema and skip the inference pass; FAILFAST rejects malformed lines."""
    reader = spark.read.option("mode", "FAILFAST")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def postgres_jdbc_options(
    conn_url: str,
    query: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    user: str | None = None,
    password: str | None = None,
) -> dict[str, str]:
    """Assemble the Spark JDBC reader options for a Postgres query — the
    pure, connection-free half of the source, unit-testable without a
    driver jar.  Mirrors the reference's connection setup
    (src/pg_arrow_source.rs:201-248):

    - accepts libpq-style ``postgresql://user:pw@host:port/db`` URLs (and
      already-prefixed ``jdbc:`` forms); credentials embedded in the URL
      are lifted into JDBC options, since JDBC URLs carry no userinfo
    - ``PGPASSWORD`` overrides the connection string's password
      (pg_arrow_source.rs:206-209); an explicit ``password`` argument
      overrides both
    - ``fetchsize`` = ``batch_size``: rows per server round-trip, the
      analog of the reference's ``--batch-size`` (src/lib.rs:43-50) —
      Spark pivots each fetch into columnar batches (R2)
    - ``query`` is prepared server-side by the JDBC source to learn the
      result schema, exactly the reference's prepare step
      (pg_arrow_source.rs:220-236)
    - libpq query parameters (``?sslmode=require&connect_timeout=10``) are
      FORWARDED, not dropped: the reference connects with TLS support
      (pg_arrow_source.rs:211-218), so ``sslmode``/``sslrootcert``/
      ``sslcert``/``sslkey`` must survive the libpq→JDBC translation.
      pgJDBC natively understands the ssl* names; the few libpq spellings
      it doesn't (``connect_timeout``, ``application_name``) are renamed,
      and any remaining parameter rides the JDBC URL query string
      verbatim (pgJDBC ignores unknown keys rather than failing closed —
      dropping them silently would be worse: a lost ``sslmode=require``
      silently downgrades transport security)
    """
    import os
    from urllib.parse import parse_qsl, unquote, urlencode, urlparse

    body = conn_url[len("jdbc:") :] if conn_url.startswith("jdbc:") else conn_url
    parsed = urlparse(body)
    if parsed.scheme not in ("postgresql", "postgres"):
        raise ValueError(f"not a postgres connection url: {conn_url!r}")
    host = parsed.hostname or "localhost"
    port = parsed.port or 5432
    db = parsed.path or ""

    # libpq spelling → pgJDBC connection-property spelling, where they differ
    _LIBPQ_TO_JDBC = {
        "connect_timeout": "connectTimeout",  # both in seconds
        "application_name": "ApplicationName",
    }
    url_params: list[tuple[str, str]] = []
    param_user: str | None = None
    param_pw: str | None = None
    for key, val in parse_qsl(parsed.query, keep_blank_values=True):
        if key == "user":
            param_user = val
        elif key == "password":
            param_pw = val
        else:
            url_params.append((_LIBPQ_TO_JDBC.get(key, key), val))
    jdbc_url = f"jdbc:postgresql://{host}:{port}{db}"
    if url_params:
        jdbc_url += "?" + urlencode(url_params)

    opts = {
        "url": jdbc_url,
        "query": query,
        "fetchsize": str(batch_size),
        "driver": "org.postgresql.Driver",
    }
    resolved_user = (
        user or (unquote(parsed.username) if parsed.username else None) or param_user
    )
    resolved_pw = (
        password
        or os.environ.get("PGPASSWORD")
        or (unquote(parsed.password) if parsed.password else None)
        or param_pw
    )
    if resolved_user:
        opts["user"] = resolved_user
    if resolved_pw:
        opts["password"] = resolved_pw
    return opts


def read_postgres_query(
    spark: SparkSession,
    conn_url: str,
    query: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    password: str | None = None,
    user: str | None = None,
) -> DataFrame:
    """Run ``query`` on the Postgres server and stream the result — the
    reference's entire relational surface delegation (src/lib.rs:39-40),
    preserved for interop.  Option assembly is ``postgres_jdbc_options``
    (contract-tested offline); executing the read requires the Postgres
    JDBC driver jar on the Spark classpath, e.g.
    ``spark.jars.packages=org.postgresql:postgresql:42.7.3`` (none ships in
    this container, so only the contract is testable here)."""
    reader = spark.read.format("jdbc")
    for k, v in postgres_jdbc_options(
        conn_url, query, batch_size, user=user, password=password
    ).items():
        reader = reader.option(k, v)
    return reader.load()
