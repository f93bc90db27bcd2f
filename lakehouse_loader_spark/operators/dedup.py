"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Every variant is a composition of scale-out primitives:

- exact:          one shuffle on a uniform 128-bit content hash
- ngram jaccard:  shingle-explode → equi-join on shingle → pair aggregate
                  (only pairs sharing ≥1 shingle are ever materialized)
- minhash LSH:    signature → band-explode → bucket equi-join → exact verify
                  (candidate generation is linear in Σ bucket_size², bounded
                  by banding; the O(n²) all-pairs compare never happens)
- simhash:        64-bit weighted bit-vote → band equi-join on 16-bit chunks
                  → hamming verify (any pair within distance d shares ≥1 of
                  4 chunks by pigeonhole)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------


def with_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per document (JVM-side transform)."""
    toks = F.split(F.col(text_col), r"\s+")
    kgram = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    # sequence(1, n) DESCENDS for n < 1 instead of yielding [], so guard
    # short documents explicitly
    return df.withColumn(
        "shingles",
        F.when(F.size(toks) >= k, F.array_distinct(kgram)).otherwise(
            F.array().cast("array<string>")
        ),
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by content hash; keep the lowest id as canonical."""
    return docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("content_hash")).agg(
        F.min(id_col).alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (the verification truth minhash approximates)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """All pairs with word-k-gram Jaccard ≥ threshold, via shingle-join.

    Scale shape: explode shingles (linear), equi-join on shingle (pairs
    sharing a shingle only), aggregate common-counts per pair, then one
    broadcast-join back to per-doc shingle counts.  Skew note: a shingle
    shared by m docs contributes m² pair rows — for web-scale corpora add
    a document-frequency cap on shingles before the self-join (drop
    shingles with df > limit; they carry no dedup signal)."""
    sh = with_shingles(docs, k=k).select(
        F.col(id_col).alias("doc"), F.col("shingles")
    )
    sizes = sh.select("doc", F.size("shingles").alias("n_sh"))
    exploded = sh.select("doc", F.explode("shingles").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

# Fixed-seed affine permutations over the 31-bit Mersenne prime:
# h_j(x) = (a_j*x + b_j) mod P.  31-bit operands keep every intermediate
# product < 2^62, inside int64 — no silent wraparound.
MINHASH_PRIME = (1 << 31) - 1


def _hash_params(num: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) parameter pairs via an LCG — no RNG state."""
    params = []
    s = seed
    for _ in range(num):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (s % (MINHASH_PRIME - 1)) + 1
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = s % MINHASH_PRIME
        params.append((a, b))
    return params


def with_minhash_signature(df: DataFrame, num_hashes: int = 128) -> DataFrame:
    """128-wide MinHash signature over the ``shingles`` column.

    Shingle → xxhash64 → pmod to the 31-bit prime field → for each of the
    128 affine permutations take the min — all as nested higher-order
    functions, one pass per row (pmod because xxhash64 can be negative)."""
    params = _hash_params(num_hashes)
    base = F.transform(F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_PRIME)))

    def perm_min(a: int, b: int):
        # closure factory: pyspark introspects lambda arity, so the affine
        # params must be captured, not passed as defaulted lambda args
        return F.array_min(F.transform(base, lambda h: (h * a + b) % MINHASH_PRIME))

    return df.withColumn("minhash_sig", F.array(*[perm_min(a, b) for (a, b) in params]))


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands, hash each band,
    equi-join on (band_id, band_hash).  32 bands × 4 rows ⇒ P(candidate) =
    1-(1-j⁴)³² — ≈1 for j ≥ 0.8, tiny for j ≤ 0.2.

    Returns distinct (doc_a, doc_b) candidate pairs, doc_a < doc_b."""
    rows_per_band = num_hashes // bands
    sig = with_minhash_signature(with_shingles(docs), num_hashes).select(
        F.col(id_col).alias("doc"), "minhash_sig"
    )
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda bnd: F.struct(
            bnd.alias("band_id"),
            F.xxhash64(F.concat_ws(",", F.slice("minhash_sig", bnd * rows_per_band + 1, rows_per_band)))
            .alias("band_hash"),
        ),
    )
    buckets = sig.select("doc", F.explode(band_arr).alias("b")).select(
        "doc", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame, threshold: float = 0.8, id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Near-dup pairs: LSH candidates, then EXACT jaccard verification of
    candidates only (join back to shingle sets, array_intersect sizes).
    Output matches exact all-pairs jaccard ≥ threshold whenever banding
    recall is 1 at the threshold (32×4 banding: P(miss | j=0.8) ≈ 1e-7)."""
    cands = minhash_candidate_pairs(docs, id_col=id_col)
    sh = with_shingles(docs, k=k).select(F.col(id_col).alias("doc"), "shingles")
    sa = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def with_simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens: each token votes its xxhash64
    bit pattern; the fingerprint's bit i is 1 iff the weighted vote is
    positive.  Pure higher-order functions, one pass."""
    toks = F.array_distinct(F.split(F.col(text_col), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # Per-bit masks as a literal array (shiftleft needs a Python-int shift,
    # so masks are precomputed; bit 63's mask is int64-min in two's
    # complement).
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(bits)]

    def bit_vote(mask: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )

    fp = F.lit(0).cast("bigint")
    for mask in masks:
        fp = fp + F.when(bit_vote(mask) > 0, F.lit(mask).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return df.withColumn("simhash", fp)


def simhash_near_duplicates(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Pairs within ``max_hamming`` bit flips, found scalably: split the
    64-bit fingerprint into 4 16-bit chunks; by pigeonhole any pair within
    hamming ≤ 3 agrees exactly on ≥1 chunk → equi-join per chunk, then
    verify with bit_count(xor)."""
    sh = with_simhash(docs).select(F.col(id_col).alias("doc"), "simhash")
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("chunk_val"),
            )
            for i in range(4)
        ]
    )
    keyed = sh.select("doc", "simhash", F.explode(chunks).alias("c")).select(
        "doc",
        "simhash",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_val").alias("chunk_val"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            hamming.cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
