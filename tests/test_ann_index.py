"""IVF-index-as-a-lakehouse-table roundtrip: save the staged index pair
as Delta/Iceberg tables, load it back, and serve IDENTICAL ANN results —
plus the pair-integrity refusals.  Also the first array-typed data
through both hand-rolled table writers."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.catalog import load_table
from lakehouse_loader_spark.operators.similarity import (
    ivf_ann_topk,
    train_ivf_centroids_sampled,
)
from lakehouse_loader_spark.sinks.ann_index import load_ivf_index, save_ivf_index

# slow: persisted-index roundtrip + subprocess CLI e2e (~2 min)
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_pair(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = train_ivf_centroids_sampled(emb, n_centroids=4)
    # assignment via the operator's own path: search once with the trained
    # centroids and no prebuilt file, then rebuild the file it used
    from lakehouse_loader_spark.queries.staging import staged_ivf_index

    inv, staged_cents = staged_ivf_index(spark, SF, n_centroids=4)
    return emb, inv, staged_cents


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_ivf_index_roundtrip_serves_identical_ann(spark, tmpdir, fmt, index_pair):
    emb, inv, cents = index_pair
    path = os.path.join(str(tmpdir), f"ivf_{fmt}")
    save_ivf_index(spark, inv, cents, path, fmt=fmt)
    inv2, cents2 = load_ivf_index(spark, path, fmt=fmt)

    assert np.array_equal(cents, cents2)
    a = {(r["n_id"], r["cid"]) for r in inv.select("n_id", "cid").collect()}
    b = {(r["n_id"], r["cid"]) for r in inv2.select("n_id", "cid").collect()}
    assert a == b

    q = emb.filter(F.col("vec_id") < 3)
    want = sorted(
        (r["q_id"], r["rank"], r["n_id"])
        for r in ivf_ann_topk(emb, q, k=5, indexed=inv, centroids=cents).collect()
    )
    got = sorted(
        (r["q_id"], r["rank"], r["n_id"])
        for r in ivf_ann_topk(emb, q, k=5, indexed=inv2, centroids=cents2).collect()
    )
    assert want == got and len(want) > 0


def test_ivf_index_partitions_prune_by_cluster(spark, tmpdir, index_pair):
    """The inverted file partitions on cid, so a single-cluster probe
    plans a strict subset of the table's files (the scan planner's
    partition pruning — the IVF n_probe/n_centroids cost model preserved
    through the storage layer)."""
    from lakehouse_loader_spark.sinks.delta import scan_delta_with_plan

    emb, inv, cents = index_pair
    path = os.path.join(str(tmpdir), "ivf_prune")
    save_ivf_index(spark, inv, cents, path, fmt="delta")
    one, plan = scan_delta_with_plan(
        spark, os.path.join(path, "inverted"), [("cid", "=", 0)]
    )
    assert plan["excluded_by_partition"] > 0
    assert 0 < len(plan["files"]) < plan["total"]
    assert one.count() == inv.filter(F.col("cid") == 0).count()


def test_ivf_index_pair_integrity_refusals(spark, tmpdir, index_pair):
    emb, inv, cents = index_pair
    with pytest.raises(ValueError, match="n_id, n_vec, cid"):
        save_ivf_index(
            spark, inv.select("n_id", "cid"), cents, str(tmpdir), fmt="delta"
        )
    with pytest.raises(ValueError, match="unknown index table format"):
        save_ivf_index(spark, inv, cents, str(tmpdir), fmt="orc")
    path = os.path.join(str(tmpdir), "ivf_dim")
    save_ivf_index(spark, inv, cents[:, :32], path, fmt="delta")
    with pytest.raises(ValueError, match="mismatched index pair"):
        load_ivf_index(spark, path, fmt="delta")


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_lsh_index_roundtrip_serves_identical_ann(spark, tmpdir, fmt):
    from lakehouse_loader_spark.operators.similarity import lsh_ann_topk
    from lakehouse_loader_spark.queries.staging import staged_lsh_index
    from lakehouse_loader_spark.sinks.ann_index import (
        load_lsh_index,
        save_lsh_index,
    )

    emb = load_table(spark, SF, "embeddings")
    idx = staged_lsh_index(spark, SF)  # dim=64, 8 tables, 4 planes
    path = os.path.join(str(tmpdir), f"lsh_{fmt}")
    save_lsh_index(spark, idx, 64, 8, 4, path, fmt=fmt)
    idx2, cfg = load_lsh_index(spark, path, fmt=fmt)
    assert cfg == {"dim": 64, "n_tables": 8, "planes_per_table": 4}

    q = emb.filter(F.col("vec_id") < 3)
    want = sorted(
        (r["q_id"], r["rank"], r["n_id"])
        for r in lsh_ann_topk(emb, q, dim=64, k=5, indexed=idx).collect()
    )
    got = sorted(
        (r["q_id"], r["rank"], r["n_id"])
        for r in lsh_ann_topk(
            emb,
            q,
            dim=cfg["dim"],
            k=5,
            n_tables=cfg["n_tables"],
            planes_per_table=cfg["planes_per_table"],
            indexed=idx2,
        ).collect()
    )
    assert want == got and len(want) > 0


def test_lsh_index_refuses_ambiguous_config(spark, tmpdir):
    from lakehouse_loader_spark.queries.staging import staged_lsh_index
    from lakehouse_loader_spark.sinks.ann_index import (
        load_lsh_index,
        save_lsh_index,
    )
    from lakehouse_loader_spark.sinks.delta import write_delta

    idx = staged_lsh_index(spark, SF)
    path = os.path.join(str(tmpdir), "lsh_bad")
    save_lsh_index(spark, idx, 64, 8, 4, path, fmt="delta")
    # a second config row makes the hashing contract ambiguous -> refuse
    extra = spark.createDataFrame(
        [(32, 4, 2)], "dim int, n_tables int, planes_per_table int"
    )
    write_delta(extra, os.path.join(path, "config"), append=True)
    with pytest.raises(ValueError, match="exactly one"):
        load_lsh_index(spark, path, fmt="delta")
    with pytest.raises(ValueError, match="n_id, n_vec, lsh_key"):
        save_lsh_index(
            spark, idx.select("n_id", "n_vec"), 64, 8, 4, path, fmt="delta"
        )


def test_cli_build_ann_index_subprocess(spark, tmpdir):
    """`lhl build-ann-index` as a separate OS process: builds a servable
    IVF index from the embeddings parquet; the loaded pair serves ANN."""
    import subprocess
    import sys as _sys

    out = os.path.join(str(tmpdir), "cliivf")
    r = subprocess.run(
        [
            _sys.executable, "-m", "lakehouse_loader_spark.cli",
            "build-ann-index", os.path.join(SF, "embeddings.parquet"), out,
            "--kind", "ivf", "--n-centroids", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "built ivf index" in r.stderr
    inv, cents = load_ivf_index(spark, out)
    assert cents.shape == (4, 64)
    emb = load_table(spark, SF, "embeddings")
    res = ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 2), k=3, indexed=inv, centroids=cents
    ).collect()
    assert len(res) == 6


def test_retrieval_served_from_persisted_index_matches_staged(spark, tmpdir):
    """End-to-end tie: the RAG retrieval shape (feature-hash chunk queries
    -> IVF ANN -> exact rerank) must produce IDENTICAL neighbors whether
    it probes the session-staged index or the lakehouse-persisted pair --
    the deploy-time swap a production pipeline makes."""
    from lakehouse_loader_spark.operators import text as T
    from lakehouse_loader_spark.queries.staging import staged_ivf_index

    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 4)
    chunks = T.chunk_token_arrays(docs, chunk_size=24, overlap=8)
    q = chunks.select(
        (F.lit(10_000_000) + F.col("doc_id") * 1000 + F.col("chunk_id"))
        .alias("vec_id"),
        F.expr(T.feature_hash_expr("toks")).alias("embedding"),
    )
    inv, cents = staged_ivf_index(spark, SF)
    path = os.path.join(str(tmpdir), "served")
    save_ivf_index(spark, inv, cents, path, fmt="delta")
    inv2, cents2 = load_ivf_index(spark, path)
    want = sorted(
        (r["q_id"], r["rank"], r["n_id"], r["cosine"])
        for r in ivf_ann_topk(emb, q, k=5, indexed=inv, centroids=cents).collect()
    )
    got = sorted(
        (r["q_id"], r["rank"], r["n_id"], r["cosine"])
        for r in ivf_ann_topk(emb, q, k=5, indexed=inv2, centroids=cents2).collect()
    )
    assert want == got and len(want) > 0
