"""Scale decomposition for the staged iterative-BPE trainer (r15): the
Heaps-bound claim is that corpus volume is paid ONCE (the vocab shuffle)
and the k training rounds are VOCAB-sized — so a 10× corpus should move
the vocab-build stage, not the per-round stage.

Runs the two stages separately at sf0.01 and sf0.1 (10× corpus) in fresh
scratch, stamps loadavg, and prints the per-stage split:
  A. vocab build + materialize     (the one corpus shuffle)
  B. k training rounds             (count -> argmax -> literal-merge fold)
Also times the bpe_encode_corpus consumer warm (staged table hit).
Scratch tool (probe_ivf_band.py shape)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lakehouse_loader_spark import get_spark  # noqa: E402

K = int(os.environ.get("BPE_K", "8"))


def main():
    spark = get_spark("probe-bpe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from lakehouse_loader_spark.catalog import load_table
    from lakehouse_loader_spark.operators import materialize_shared
    from lakehouse_loader_spark.operators.text import bpe_train_merges
    from lakehouse_loader_spark.queries.extensions import bpe_encode_corpus

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf, "documents")
        n_docs = docs.count()  # warm the parquet footer/file listing
        t0 = time.monotonic()
        vocab = (
            docs.select(
                F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
            )
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("wc"))
        )
        vocab = materialize_shared(vocab, f"probe-bpe-vocab-{n_docs}")
        n_vocab = vocab.count()
        t1 = time.monotonic()
        merges = bpe_train_merges(vocab, k=K)
        t2 = time.monotonic()
        print(
            f"{sf}: docs={n_docs} vocab={n_vocab} "
            f"A.vocab-build {t1 - t0:.2f}s  B.{K}-rounds {t2 - t1:.2f}s "
            f"({(t2 - t1) / max(len(merges), 1):.2f}s/round, "
            f"{len(merges)} merges) load={os.getloadavg()[0]:.1f}"
        )
        # consumer warm path: staged artifact hit + vocab-join encode
        bpe_encode_corpus(spark, sf).count()  # stages the table
        t3 = time.monotonic()
        n = bpe_encode_corpus(spark, sf).count()
        print(
            f"{sf}: encode warm {time.monotonic() - t3:.2f}s rows={n} "
            f"load={os.getloadavg()[0]:.1f}"
        )


if __name__ == "__main__":
    main()
