"""Unit tests for the training-pipeline operators (sampling/splits, quality
signals, PII redaction, normalization) — the properties the SQL oracles
can't check: determinism, stability under data growth, redaction on planted
PII."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.operators import sampling as SA
from lakehouse_loader_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i} body text with words number {i % 7}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_hash_sample_is_deterministic_and_fractional(spark, docs):
    a = {r.doc_id for r in SA.hash_sample(docs, "doc_id", 0.3, "s").collect()}
    b = {r.doc_id for r in SA.hash_sample(docs, "doc_id", 0.3, "s").collect()}
    assert a == b  # pure function of the key — retry-stable
    assert 0.15 < len(a) / 200 < 0.45  # md5 uniformity at n=200
    # different salt ⇒ an independent draw, not the same subset
    c = {r.doc_id for r in SA.hash_sample(docs, "doc_id", 0.3, "other").collect()}
    assert c != a


def test_split_is_exhaustive_and_stable_under_growth(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r.doc_id: r.split for r in SA.with_split(docs, "doc_id", w).collect()}
    assert set(full.values()) == {"train", "val", "test"}
    # growing the corpus never reassigns an existing row
    half = docs.filter(F.col("doc_id") < 100)
    small = {r.doc_id: r.split for r in SA.with_split(half, "doc_id", w).collect()}
    assert all(full[k] == v for k, v in small.items())
    frac_train = sum(1 for v in full.values() if v == "train") / len(full)
    assert 0.65 < frac_train < 0.95


def test_quota_per_group_caps_and_orders(spark):
    rows = [(i, f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, grp STRING")
    out = SA.quota_per_group(df, "grp", "doc_id", 5).collect()
    per = {}
    for r in out:
        per.setdefault(r.grp, []).append(r.sample_rank)
    assert set(per) == {"g0", "g1", "g2"}
    for ranks in per.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_pii_redaction_on_planted_pii(spark):
    rows = [
        (1, "contact bob.smith+x@example.co.uk or call 555-123-4567 now"),
        (2, "server at 10.0.255.1 and 192.168.1.254 responded"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in T.with_pii_redaction(df).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert "<EMAIL>" in out[1].clean_text and "<PHONE>" in out[1].clean_text
    assert "example" not in out[1].clean_text
    assert out[2].n_ips == 2 and out[2].clean_text.count("<IP>") == 2
    assert out[3].clean_text == "no pii here at all"
    assert out[3].n_emails == out[3].n_phones == out[3].n_ips == 0


def test_normalized_dedup_catches_reformatted_copies(spark):
    rows = [
        (1, "Hello,   World!"),
        (2, "hello world"),
        (3, "HELLO ... world"),
        (4, "different entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    norm = df.select("doc_id", T.normalized_text_col(F.col("text")).alias("n"))
    vals = {r.doc_id: r.n for r in norm.collect()}
    assert vals[1] == vals[2] == vals[3] == "hello world"
    assert vals[4] != vals[1]


def test_repetition_signals_flag_repeats(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),
        (2, "all tokens here are fully distinct words"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in T.with_repetition_signals(df).collect()}
    assert out[1].dup_2gram_frac > 0.7
    assert out[2].dup_2gram_frac == 0.0 and out[2].dup_3gram_frac == 0.0


def test_gopher_signals_verdict(spark):
    good = " ".join(["the quick brown fox jumps over a lazy dog today"] * 3)  # 30 words, stopwords
    short = "tiny doc"
    bullet = "- " + " ".join(["the word list goes on and on for a while here now"] * 2)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, bullet)], "doc_id BIGINT, text STRING"
    )
    out = {r.doc_id: r for r in T.with_gopher_signals(df).collect()}
    assert out[1].gopher_keep is True
    assert out[2].gopher_keep is False  # too short
    assert out[3].gopher_keep is False  # bullet start


def test_multimodal_resize_fixed_shape(spark):
    from lakehouse_loader_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "abcdefgh" * 10), (2, "x"), (3, "")], "doc_id BIGINT, text STRING"
    )
    out = {r.doc_id: r.resized for r in M.resize_features(M.with_binary_payload(df)).collect()}
    assert all(len(v) == M.RESIZE_DIM for v in out.values())  # fixed tensor shape
    assert out[3] == [0.0] * M.RESIZE_DIM  # empty payload → zero vector
    # deterministic: same payload, same vector
    out2 = {r.doc_id: r.resized for r in M.resize_features(M.with_binary_payload(df)).collect()}
    assert out == out2


def test_multimodal_frame_sample_expands_rows(spark):
    from lakehouse_loader_spark.operators import multimodal as M

    # 256-byte payload → 8 frames of 32 → every 4th kept → frames 0 and 4
    df = spark.createDataFrame([(1, "ab" * 128)], "doc_id BIGINT, text STRING")
    rows = M.sample_frames(M.with_binary_payload(df)).collect()
    assert [(r.frame_idx, r.n_frames) for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        (0, 8),
        (4, 8),
    ]
    assert all(len(r.frame) == 32 for r in rows)


def test_asof_join_null_left_ts_matches_nothing(spark):
    """A NULL left timestamp yields NULL payload in BOTH directions —
    forward must not invent a match via an unbounded frame."""
    from lakehouse_loader_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00"), (2, None)], "id BIGINT, lts STRING"
    ).selectExpr("id", "CAST(lts AS TIMESTAMP) AS lts", "'k' AS key")
    right = spark.createDataFrame(
        [("2024-01-01 00:00:00", 10.0), ("2024-01-03 00:00:00", 30.0)], "rts STRING, val DOUBLE"
    ).selectExpr("CAST(rts AS TIMESTAMP) AS rts", "val", "'k' AS key")
    for direction, want in (("backward", 10.0), ("forward", 30.0)):
        out = {
            r.id: r.val
            for r in asof_join(
                left, right, key="key", left_ts="lts", right_ts="rts",
                value_cols=["val"], direction=direction,
            ).collect()
        }
        assert out[1] == want, direction
        assert out[2] is None, f"null ts matched in {direction}"
