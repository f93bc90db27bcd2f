"""Deterministic sampling / splitting operators for training-data pipelines.

Sampling at 100 TB has two hard requirements the built-in ``df.sample`` RNG
path does not give you:

- **determinism across retries and backfills** — re-running the pipeline
  (or recomputing a lost partition!) must select the SAME rows, so the
  decision must be a pure function of the row key, never of RNG/task state;
- **no coordination** — the decision must be computable per-row, map-side,
  with no global pass (a 100 TB reservoir sample is a shuffle; a hash
  threshold is free).

Everything here keys off md5(salt || key) rather than xxhash64 so the
assignment is reproducible in ANY engine — the DuckDB oracles compute the
identical buckets bit-for-bit.  The first 15 hex digits (60 bits) are used
so the value stays inside a signed 64-bit integer in every SQL dialect.

The reference delegates all relational work to Postgres (SURVEY.md §2b);
sampling belongs to the [EXT] training-data surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bucket space for fraction thresholds: fraction f keeps bucket < f * SPACE.
# 1e6 buckets ⇒ fraction resolution 1e-6, plenty for split ratios.
BUCKET_SPACE = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, BUCKET_SPACE) from md5(salt||key).

    60 bits of the md5 hex go through base-16 → base-10 conversion (pure
    JVM expression); pmod folds them into the bucket space.  Changing
    ``salt`` yields an independent assignment — use distinct salts for
    independent sampling decisions (e.g. sampling vs. splitting)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(BUCKET_SPACE))


def hash_bucket_sql(key_sql: str, salt: str = "") -> str:
    """The DuckDB-equivalent expression for :func:`hash_bucket` (oracle
    helper): identical md5 → 60-bit int → mod pipeline."""
    return (
        f"(CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('{salt}', CAST({key_sql} AS VARCHAR))), 1, 15)) "
        f"AS BIGINT) % {BUCKET_SPACE})"
    )


def bucket_threshold(fraction: float) -> int:
    """The ONE bucket-threshold convention (rounded, not truncated) shared
    by every sampling API and interpolated into their oracles — int()
    truncation would drop bucket ⌊f·SPACE⌋ whenever f·SPACE lands just
    below an integer (0.3·10⁶ = 299999.99…)."""
    return int(round(fraction * BUCKET_SPACE))


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows: bucket(key) < f·SPACE.

    Pure map-side filter — pushes down to the scan, no shuffle, no RNG;
    the complement (bucket ≥ threshold) is exactly the held-out set.
    The threshold rounds (like with_split's bounds) so the same fraction
    selects the same bucket range through either API — int() truncation
    would drop bucket ⌊f·SPACE⌋ whenever f·SPACE lands just below an
    integer (0.3·10⁶ = 299999.99…)."""
    return df.filter(hash_bucket(F.col(key_col), salt) < bucket_threshold(fraction))


def with_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hash range.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any remainder
    falls into the LAST split, so (0.8, 0.1, 0.1) is exact).  Assignment is
    a pure function of the key: adding data later never moves an existing
    row between splits — the property train/test hygiene depends on."""
    bucket = hash_bucket(F.col(key_col), salt)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in weights.items():
        acc += w
        bounds.append((name, bucket_threshold(acc)))
    # first-match-wins CASE chain over the cumulative bounds; any remainder
    # beyond the last bound also lands in the last split
    expr = F.lit(bounds[-1][0])
    for name, hi in bounds[-2::-1]:
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def quota_per_group(
    df: DataFrame, group_col: str, key_col: str, n: int, salt: str = "quota"
) -> DataFrame:
    """Deterministic quota sampling: at most ``n`` rows per group, chosen by
    hash order (uniform within the group, stable across runs).

    One shuffle on the group key; Spark's WindowGroupLimit pre-prunes each
    map partition to its local top-n before the shuffle, so the exchanged
    volume is ≤ n·partitions per group, not the group size.  This is the
    scale shape for per-domain caps in corpus curation (e.g. "≤ 10k pages
    per registered domain")."""
    from pyspark.sql import Window as W

    bucket = hash_bucket(F.col(key_col), salt)
    w = W.partitionBy(group_col).orderBy(bucket.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= n)
    )


def importance_sample(
    df: DataFrame, key_col: str, weight_col: Column | str, salt: str = "imp"
) -> DataFrame:
    """Deterministic per-row Bernoulli: keep each row with probability
    min(weight, 1) — the quality/importance-weighted downsampling step of
    corpus curation ("keep high-quality docs, thin out the rest"), with the
    same retry/backfill stability guarantees as :func:`hash_sample` (the
    decision is a pure function of the key, never RNG).  Map-side filter,
    no shuffle.  The per-row threshold rounds like :func:`bucket_threshold`
    so a weight of exactly 0.3 keeps exactly the buckets < 300000."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    thresh = F.round(F.least(w, F.lit(1.0)) * BUCKET_SPACE, 0).cast("bigint")
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def weighted_priority(key: Column, weight: Column, salt: str = "wrs") -> Column:
    """Efraimidis–Spirakis priority for weighted sampling WITHOUT
    replacement: e = -ln(u)/w with u uniform in (0,1) — keeping the n
    SMALLEST e is exactly sampling n items with probability ∝ weight
    (A-Res, Efraimidis & Spirakis 2006).  u derives from the md5 bucket
    (never RNG), so the sample is retry/backfill-stable like every other
    decision in this module.  Rounded to 9 decimals so the ordering — and
    the oracle comparison — is independent of libm ulp differences."""
    u = (hash_bucket(key, salt) + F.lit(1)).cast("double") / F.lit(float(BUCKET_SPACE + 1))
    return F.round(-F.log(u) / weight, 9)


def weighted_priority_sql(key_sql: str, weight_sql: str, salt: str = "wrs") -> str:
    """DuckDB twin of :func:`weighted_priority` (oracle helper)."""
    return (
        f"ROUND(-LN(CAST({hash_bucket_sql(key_sql, salt)} + 1 AS DOUBLE)"
        f" / CAST({BUCKET_SPACE + 1} AS DOUBLE)) / ({weight_sql}), 9)"
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: Column | str, n: int, salt: str = "wrs"
) -> DataFrame:
    """n items sampled ∝ weight without replacement (quality-weighted
    corpus curation: "take 100k docs, preferring high-quality ones").
    Plan shape: the priority is map-side; orderBy(...).limit(n) compiles
    to TakeOrderedAndProject, so each partition ships only its local
    top-n — no global sort at any corpus size.  Rows with weight ≤ 0 are
    unsampleable and dropped."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    pri = weighted_priority(F.col(key_col), w, salt)
    return (
        df.filter(w > 0)
        .withColumn("priority", pri)
        .orderBy(F.col("priority").asc(), F.col(key_col).asc())
        .limit(n)
    )
