"""Similarity search over an embedding column (array<float>).

- brute-force top-k: exact baseline — broadcast the (small) query set
  against the full corpus; one pass, no shuffle of the corpus
- cosine near-dup pairs: exact all-pairs above a threshold (correctness
  baseline; quadratic — use the LSH variant at scale)
- random-hyperplane LSH ANN: the scale path — bucket by sign-pattern,
  search only within buckets

Vector math is double-precision higher-order folds (JVM-side); a
Pandas-UDF/numpy path would cross Arrow for every batch and is only worth it
for dims ≫ 10³.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def stack_batch(vs: pd.Series) -> np.ndarray:
    """One Arrow batch of fixed-dim vectors → a (batch, dim) float64 matrix.

    The hot path is a bare ``np.stack`` (no per-row checks); only when that
    fails — some vector is NULL or has the wrong dimension — do we scan the
    batch to name the offending row, instead of surfacing numpy's opaque
    "all input arrays must have the same shape".  These operators require
    non-null fixed-dimension vectors; filter/pad upstream."""
    arr = vs.to_numpy()
    try:
        return np.stack(arr).astype(np.float64)
    except ValueError:
        dim = None
        for i, v in enumerate(arr):
            if v is None:
                raise ValueError(
                    f"NULL embedding vector at batch row {i}: vectorized "
                    "index build requires non-null fixed-dimension vectors "
                    "(drop or impute NULLs upstream)"
                ) from None
            if dim is None:
                dim = len(v)
            elif len(v) != dim:
                raise ValueError(
                    f"ragged embedding at batch row {i}: dimension "
                    f"{len(v)} != {dim} seen earlier in the batch — "
                    "vectorized index build requires one fixed dimension"
                ) from None
        raise


def _dot(a, b) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set is broadcast; the corpus streams through map-side —
    the only shuffle is the per-query top-k window over k·|queries| rows
    (pre-pruned per partition by Spark's WindowGroupLimit).

    NOTE: queries must share the corpus id space — q_id == n_id is treated
    as "the query itself" and excluded.  For an external query set with its
    own ids, remap ids to be disjoint from the corpus first."""
    from lakehouse_loader_spark.operators import spread

    # Hoist the per-side norms below the join (r15): cosine_col recomputes
    # BOTH vector norms for every (query, corpus) pair — 3 folds per pair.
    # Each side's norm is a pure per-row value, so compute it once in the
    # side projection and divide the pair dot by the product: 1 fold per
    # pair, identical doubles (same sqrt-of-fold operands, same q·n order).
    # The projections sit below the join, so CollapseProject cannot merge
    # them into the pair-level select (plan-checked).
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_n"),
    )
    # spread the corpus to cluster width first: a single-file scan is one
    # partition, and the per-row cosine folds would run single-core
    c = spread(emb).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_n"),
    )
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id",
        "n_id",
        (
            _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_n") * F.col("n_n"))
        ).alias("cosine"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )


def cosine_neardup_pairs(
    emb: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via pairwise folds (reference
    implementation for tests; use ``cosine_neardup_pairs_blocked`` in
    production — same exact result, BLAS-speed)."""
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


EXACT_ALLPAIRS_MAX_ROWS = 1_000_000


def cosine_neardup_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    n_blocks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = EXACT_ALLPAIRS_MAX_ROWS,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a blocked matrix product.

    The 100 TB shape for exact similarity joins: vectors are grouped into
    n_blocks blocks; the n_blocks·(n_blocks+1)/2 block PAIRS fan out across
    executors, and each pair computes one numpy float64 matmul (BLAS) over
    its two blocks — O(n²·d) flops at memory bandwidth instead of
    interpreted per-element folds.  Work per task is (n/n_blocks)²·d; size
    n_blocks so a block pair fits executor memory.

    BLAS or not, the flop count is still O(n²·d): this is the exact
    VERIFICATION twin of the banded paths (lsh_ann_topk / semantic dedup),
    not the production path.  Above ``max_rows`` it REFUSES (the same
    guard-rail shape as clusters.LOCAL_CC_MAX_EDGES) so the one quadratic
    operator in the registry can't be pointed at a 100 TB corpus by
    accident; pass ``max_rows=None`` to force it on a cluster sized for
    the n² work."""
    if max_rows is not None:
        n = emb.count()
        if n > max_rows:
            raise ValueError(
                f"exact all-pairs cosine over {n:,} vectors is O(n²·d) — "
                f"refusing above {max_rows:,} rows; use lsh_ann_topk / "
                "semantic_dedup (banded) or pass max_rows=None if the "
                "cluster is sized for the quadratic work"
            )
    norms = _norm(F.col(vec_col))
    # The obvious ``transform(vec, x -> x / norm)`` nests the whole 64-element
    # norm FOLD inside the per-element lambda — Catalyst cannot hoist it (and
    # CollapseProject re-inlines a pre-projected norm column right back into
    # the lambda), so the fold re-runs once PER ELEMENT: O(d²) per row.
    # Passing the norm through ``array_repeat`` evaluates it ONCE per row (it
    # is an argument, not a lambda body) and zip_with divides element-wise —
    # identical doubles (same x/norm operands), measured 0.70s → 0.10s on the
    # sf0.1 unit projection (tools/probe in OPTIMIZATION_r15.md, §norm-hoist).
    unit = F.zip_with(
        F.col(vec_col),
        F.array_repeat(norms, F.size(F.col(vec_col))),
        lambda x, n: x.cast("double") / n,
    )
    blocks = (
        emb.select(F.col(id_col).alias("vid"), unit.alias("u"))
        .withColumn("block", F.pmod(F.col("vid"), F.lit(n_blocks)))
        .groupBy("block")
        .agg(F.collect_list(F.struct("vid", "u")).alias("rows"))
    )
    a = blocks.select(F.col("block").alias("block_a"), F.col("rows").alias("rows_a"))
    b = blocks.select(F.col("block").alias("block_b"), F.col("rows").alias("rows_b"))
    pairs = a.join(b, F.col("block_a") <= F.col("block_b")).select(
        "block_a", "block_b", "rows_a", "rows_b"
    )

    out_schema = "vec_a BIGINT, vec_b BIGINT, cosine DOUBLE"

    def block_matmul(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                diagonal = row["block_a"] == row["block_b"]
                ids_a = np.array([r["vid"] for r in row["rows_a"]], dtype=np.int64)
                mat_a = np.array([r["u"] for r in row["rows_a"]], dtype=np.float64)
                ids_b = np.array([r["vid"] for r in row["rows_b"]], dtype=np.int64)
                mat_b = np.array([r["u"] for r in row["rows_b"]], dtype=np.float64)
                sims = mat_a @ mat_b.T
                ia, ib = np.nonzero(sims >= threshold)
                va, vb, cs = ids_a[ia], ids_b[ib], sims[ia, ib]
                if diagonal:
                    # both orientations computed → keep one
                    keep = va < vb
                    va, vb, cs = va[keep], vb[keep], cs[keep]
                else:
                    # each unordered pair seen once → normalize orientation
                    keep = va != vb
                    va, vb, cs = va[keep], vb[keep], cs[keep]
                    lo = np.minimum(va, vb)
                    hi = np.maximum(va, vb)
                    va, vb = lo, hi
                yield pd.DataFrame(
                    {"vec_a": va, "vec_b": vb, "cosine": np.round(cs, 6)}
                )

    return pairs.mapInPandas(block_matmul, schema=out_schema)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (the ANN scale path)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via an LCG (no RNG state);
    components in [-1, 1)."""
    planes = []
    s = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((s / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def with_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    planes_per_table: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table sign-pattern buckets: one (table_id, bucket) row per hash
    table.  Multiple independent tables trade candidate volume for recall —
    P(candidate) = 1-(1-p^planes)^tables with p = 1-θ/π.

    All n_tables·planes_per_table projections run as ONE numpy matmul per
    Arrow batch (vs. 32 interpreted per-element folds per row)."""
    from pyspark.sql.functions import pandas_udf

    # plane j belongs to table j // planes_per_table with in-table weight
    # 1 << (j % planes_per_table) — table-major order, so the batched
    # sign matrix reshapes directly to (batch, n_tables, planes_per_table)
    planes = np.array(_hyperplanes(dim, n_tables * planes_per_table), dtype=np.float64).T

    @pandas_udf("array<struct<table_id:int,bucket:int>>")
    def bucket_udf(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        # the whole Arrow batch as ONE (batch × dim) matrix: a single BLAS
        # matmul against the plane matrix, then the per-table bucket ids as
        # a reshaped weighted sum — no interpreted per-row loop in the
        # corpus-wide index-build pass (kmeans_assign is the same shape)
        m = stack_batch(vs)
        signs = (m @ planes) > 0  # (batch, n_tables·planes_per_table)
        buckets = (
            signs.reshape(len(vs), n_tables, planes_per_table)
            * (1 << np.arange(planes_per_table))
        ).sum(axis=2)
        return pd.Series(
            [
                [{"table_id": int(t), "bucket": int(b)} for t, b in enumerate(row)]
                for row in buckets
            ]
        )

    return df.withColumn("lsh_key", F.explode(bucket_udf(F.col(vec_col))))


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_tables: int = 8,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    indexed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing ≥1 hash-table
    bucket with the query, then exact cosine ranking of candidates only.

    Scale shape: the corpus is exploded n_tables× and shuffled once by
    (table_id, bucket); each query probes its buckets via broadcast.  Work
    scales with Σ bucket occupancy, not |corpus|·|queries|.

    ``indexed``: an already-materialized (n_id, n_vec, lsh_key) bucketed
    corpus (queries/staging.py) — the LSH INDEX; real ANN deployments
    build it once per corpus and serve many query batches against it."""
    from lakehouse_loader_spark.operators import spread

    # per-side norm hoist (r15, same as brute_force_topk): 3 folds per
    # candidate pair → 1; identical doubles, norms evaluated once per row
    # below the join
    if indexed is not None:
        c = indexed.select(
            "n_id", "n_vec", "lsh_key", _norm(F.col("n_vec")).alias("n_n")
        )
    else:
        emb = spread(emb)  # single-file corpus = one partition otherwise
        c = with_lsh_buckets(emb, dim, n_tables, planes_per_table, vec_col).select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            "lsh_key",
            _norm(F.col(vec_col)).alias("n_n"),
        )
    q = with_lsh_buckets(queries, dim, n_tables, planes_per_table, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        "lsh_key",
        _norm(F.col(vec_col)).alias("q_n"),
    )
    cands = (
        c.join(F.broadcast(q), ["lsh_key"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "q_vec", "q_n", "n_id", "n_vec", "n_n")
        .dropDuplicates(["q_id", "n_id"])
    )
    scored = cands.select(
        "q_id",
        "n_id",
        (
            _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_n") * F.col("n_n"))
        ).alias("cosine"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means centroids → cluster-pruned search
# ---------------------------------------------------------------------------


def train_ivf_centroids_sampled(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    max_train: int = 16384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Coarse k-means on a bounded deterministic sample (the standard IVF
    training recipe — FAISS trains on ~256 vectors per centroid, not the
    corpus): ONE Spark job fetches ≤ ``max_train`` hash-ordered vectors
    (TakeOrdered — constant driver state, like the centroids themselves),
    then Lloyd iterations run as local numpy.  At 100 TB the sample is just
    as representative and training cost is independent of corpus size;
    ``train_ivf_centroids`` keeps the fully-distributed variant for
    anomalously large n_centroids·dim."""
    rows = (
        emb.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("__ord"),
        )
        .orderBy("__ord")
        .limit(max_train)
        .collect()
    )
    m = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = m.shape[1]
    cents = np.array(_hyperplanes(dim, n_centroids, seed=7), dtype=np.float64)
    for _ in range(n_iters):
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = d.argmin(axis=1)
        for c in range(n_centroids):
            mask = cid == c
            if mask.any():
                cents[c] = m[mask].mean(axis=0)
    return cents


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    vec_col: str = "embedding",
):
    """Deterministic coarse k-means (Lloyd iterations in Spark, seeded init):
    centroids come back to the driver — n_centroids·dim floats, a constant —
    while every assignment/update pass stays distributed.  Each Lloyd pass
    is a full Spark job; prefer ``train_ivf_centroids_sampled`` unless the
    training set must be the whole corpus."""
    dim = len(emb.select(vec_col).first()[0])
    # seeded init from the LCG hyperplane generator (no RNG state)
    cents = np.array(_hyperplanes(dim, n_centroids, seed=7), dtype=np.float64)

    to_np = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vecs = emb.select(to_np.alias("v")).persist()  # read once, 5 Lloyd passes
    for _ in range(n_iters):
        bc = cents.tolist()

        def assign(batches, bc=bc):
            import numpy as np
            import pandas as pd

            c = np.asarray(bc)
            for pdf in batches:
                m = np.array(pdf["v"].tolist(), dtype=np.float64)
                if len(m) == 0:
                    continue
                d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                cid = d.argmin(axis=1)
                out = pd.DataFrame({"cid": cid})
                for j in range(m.shape[1]):
                    out[f"x{j}"] = m[:, j]
                yield out

        schema = "cid INT, " + ", ".join(f"x{j} DOUBLE" for j in range(dim))
        assigned = vecs.mapInPandas(assign, schema=schema)
        sums = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(f"x{j}").alias(f"s{j}") for j in range(dim)],
        )
        rows = sums.collect()  # n_centroids rows — constant-size driver state
        for r in rows:
            if r["n"] > 0:
                cents[r["cid"]] = [r[f"s{j}"] / r["n"] for j in range(dim)]
    vecs.unpersist()  # all Lloyd passes done; release the cached working set
    return cents


def assign_ivf_cells(
    emb: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The corpus-wide IVF assignment pass — the expensive half of index
    build: every vector to its nearest centroid by cosine, one normalized
    BLAS matmul per Arrow batch (kmeans_assign's shape).  Returns the
    (n_id, n_vec, cid) inverted file staged_ivf_index caches and
    save_ivf_index persists.  All-zero vectors have no direction: norm 0
    would NaN the row (0/0) and argmax over NaN would file it under an
    ARBITRARY centroid — sims are forced to 0 so they deterministically
    land in centroid 0."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    cent_mat = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T

    @pandas_udf("int")
    def nearest1(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int32")
        m = stack_batch(vs)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m /= np.where(norms == 0.0, 1.0, norms)
        return pd.Series((m @ cent_mat).argmax(axis=1).astype("int32"))

    return emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        nearest1(F.col(vec_col)).alias("cid"),
    )


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    indexed: DataFrame | None = None,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF ANN: corpus bucketed by nearest centroid (inverted file); each
    query probes only its ``n_probe`` nearest clusters and ranks exactly
    within them.  Search cost ≈ (n_probe/n_centroids)·|corpus| per query.

    ``indexed``/``centroids``: an already-materialized (n_id, n_vec, cid)
    inverted file plus its trained centroid matrix (queries/staging.py) —
    the IVF INDEX; like FAISS deployments, train + assign once per corpus
    and serve many query batches.  Pass both or neither (queries must
    probe the SAME centroids the inverted file was assigned under)."""
    from pyspark.sql.functions import pandas_udf

    if (indexed is None) != (centroids is None):
        raise ValueError("pass indexed and centroids together, or neither")
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
    else:
        cents = train_ivf_centroids_sampled(
            emb, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    cent_mat = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T  # (dim, C)

    def nearest_udf(n: int):
        """Vectorized: cosine against ALL centroids as one matmul per batch,
        argsort for the n nearest cluster ids."""

        @pandas_udf("array<int>")
        def udf(vs: pd.Series) -> pd.Series:
            if not len(vs):
                return pd.Series([], dtype=object)
            m = stack_batch(vs)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m /= np.where(norms == 0.0, 1.0, norms)  # zero vectors: sims=0,
            # deterministic probe order instead of an all-NaN argsort
            sims = m @ cent_mat  # ONE matmul for the whole Arrow batch
            order = np.argsort(-sims, axis=1)[:, :n].astype("int32")
            return pd.Series([row.tolist() for row in order])

        return udf

    # per-side norm hoist (r15, same as brute_force_topk): 3 folds per
    # candidate pair → 1; identical doubles, norms evaluated once per row
    # below the join
    if indexed is not None:
        c = indexed.select(
            "n_id", "n_vec", "cid", _norm(F.col("n_vec")).alias("n_n")
        )
    else:
        c = emb.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            F.element_at(nearest_udf(1)(F.col(vec_col)), 1).alias("cid"),
            _norm(F.col(vec_col)).alias("n_n"),
        )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(nearest_udf(n_probe)(F.col(vec_col))).alias("cid"),
        _norm(F.col(vec_col)).alias("q_n"),
    )
    scored = (
        c.join(F.broadcast(q), ["cid"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_n") * F.col("n_n"))
            ).alias("cosine"),
        )
        .dropDuplicates(["q_id", "n_id"])
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )


# ---------------------------------------------------------------------------
# PCA projection (embedding dimensionality reduction / whitening prep)
# ---------------------------------------------------------------------------


def train_pca(emb: DataFrame, vec_col: str = "embedding"):
    """Mean vector + top eigenvectors of the covariance, computed with ONE
    distributed pass: each partition accumulates (count, Σx, ΣxxT) in numpy
    and emits a single partial row — the driver combines ~num_partitions
    constant-size partials (d + d² doubles each) and eigendecomposes the
    d×d covariance locally.  Nothing driver-side scales with row count;
    this is the textbook scale shape for moments-based estimators.

    Eigenvector sign is fixed (largest-|component| made positive) so the
    projection is deterministic up to float summation order."""
    import pandas as pd

    first = emb.select(vec_col).first()
    dim = len(first[0])

    def partials(batches):
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]})

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, schema="n LONG, s ARRAY<DOUBLE>, g ARRAY<DOUBLE>")
        .collect()
    )  # one row per partition — constant size, not data size
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    g = np.sum([np.array(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals)
    evals, evecs = evals[order], evecs[:, order]
    # deterministic sign: largest-|component| of each eigenvector positive
    for j in range(evecs.shape[1]):
        i = np.argmax(np.abs(evecs[:, j]))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    return mean, evals, evecs


def pca_project(
    emb: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    whiten: bool = False,
    model=None,
    keep_vec: bool = False,
) -> DataFrame:
    """Project embeddings onto the top-``k`` principal components
    (optionally whitened to unit variance) — the dimensionality-reduction /
    decorrelation step before clustering or coarse ANN.  Training is one
    pass (train_pca); projection is one numpy matmul per Arrow batch with
    the (d, k) component matrix broadcast in the UDF closure.

    ``model`` (a ``train_pca`` result) skips retraining; ``keep_vec``
    carries the raw vector through for downstream invariant checks."""
    from pyspark.sql.functions import pandas_udf

    mean, evals, evecs = model if model is not None else train_pca(emb, vec_col)
    comps = evecs[:, :k]  # (d, k)
    if whiten:
        comps = comps / np.sqrt(np.maximum(evals[:k], 1e-12))

    @pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)
        out = (m - mean) @ comps
        return pd.Series(list(out))

    cols = [F.col(id_col), project(F.col(vec_col)).alias("pca")]
    if keep_vec:
        cols.append(F.col(vec_col))
    return emb.select(*cols)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): near-duplicate pruning
# WITHIN precomputed clusters
# ---------------------------------------------------------------------------


def semantic_dedup(
    emb: DataFrame,
    threshold: float,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: keep one representative of every semantic-duplicate set,
    comparing only WITHIN clusters (``group_col`` — a k-means assignment,
    an IVF cell, or any precomputed partition).

    Per cluster, an Arrow-batched applyInPandas task builds the unit-norm
    float64 matrix and one BLAS matmul yields all pairwise cosines; a row
    is a duplicate iff some LOWER-id member sits at cosine ≥ threshold,
    and ``dup_of`` is the smallest such partner (so representatives are
    exactly the ids no lower id shadows — deterministic, order-free).

    100 TB shape: candidate volume is Σ mᵢ² over cluster sizes mᵢ — the
    clustering bounds mᵢ, so total work is linear in corpus size times the
    (constant) cluster width, parallelized one task per cluster; nothing
    all-pairs, nothing driver-side.  Output: (id, group, dup_of, keep).
    ``group_col`` may be any scalar type (k-means id, IVF cell, language
    tag, …) — the output schema mirrors the input's."""
    group_dt = emb.schema[group_col].dataType.simpleString()
    out_schema = f"{id_col} BIGINT, {group_col} {group_dt}, dup_of BIGINT, keep BOOLEAN"

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(list(pdf[vec_col].to_numpy()[order]), dtype=np.float64)
        # dot-then-divide (matches the SQL-oracle operation order)
        dots = mat @ mat.T
        norms = np.sqrt(np.diag(dots))
        sims = dots / np.outer(norms, norms)
        n = len(ids)
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in range(1, n):
            hits = np.nonzero(sims[i, :i] >= threshold)[0]
            if hits.size:
                dup_of[i] = ids[hits[0]]  # ids sorted → first hit is smallest
        return pd.DataFrame(
            {
                id_col: ids,
                group_col: [pdf[group_col].iloc[0]] * n,
                "dup_of": dup_of,
                "keep": dup_of < 0,
            }
        )

    out = emb.select(id_col, group_col, vec_col).groupBy(group_col).applyInPandas(
        per_cluster, schema=out_schema
    )
    return out.withColumn(
        "dup_of", F.when(F.col("dup_of") >= 0, F.col("dup_of"))
    )  # -1 sentinel → NULL


def kmeans_assign(
    emb: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared L2): one
    Arrow-batched pass, each batch a single numpy distance matrix against
    the broadcast (n_centroids × dim) array — the cluster-assignment half
    of k-means document clustering / topic bucketing.  Output:
    (id, cluster, dist)."""
    import pandas as pd

    bc = [list(map(float, c)) for c in centroids]
    out_schema = f"{id_col} BIGINT, cluster INT, dist DOUBLE"

    def assign(batches):
        c = np.asarray(bc, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf["__v"].tolist(), dtype=np.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            cid = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "cluster": cid.astype(np.int32),
                    "dist": np.sqrt(d[np.arange(len(cid)), cid]),
                }
            )

    vecs = emb.select(
        id_col, F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v")
    )
    return vecs.mapInPandas(assign, schema=out_schema)
