"""Validate the Jaccard posting-branch routing (prefix vs plain shuffle)
on corpora at the two ends of the df-skew spectrum. Reproduces the numbers
in SCALE.md §Measured multi-tier scaling.

Two synthetic 50k-doc corpora:
  zipf    — body words drawn from a wide power-law vocabulary; word BIGRAMS
            end up nearly all unique (low skew_ratio): the prefix filter has
            nothing to prune, the plain posting join is the right plan.
  boiler  — 40% of docs carry one of 20 shared 12-word boilerplate headers
            (the web-crawl shape: licenses, nav bars, templates); those
            bigrams have df≈1000 → Σdf² explodes (high skew_ratio): the
            prefix filter drops the boilerplate shingles from every doc's
            prefix and wins ~8×.
Both corpora plant 1000 exact near-dup pairs (id%50==1 duplicates its
predecessor's body); both plans must find exactly those pairs.

Usage: python tools/skew_experiment.py [outdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from snapshot_sender_spark.operators import dedup
from snapshot_sender_spark.session import get_spark

N_DOCS = 50_000
V = 200_000


def zipf_corpus(spark):
    return (
        spark.range(N_DOCS)
        .withColumn(
            "src_id",
            F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id")),
        )
        .withColumn(
            "words",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.floor(
                        F.lit(V)
                        * F.pow(
                            F.pmod(
                                F.xxhash64(F.concat_ws(":", F.col("src_id"), j)),
                                F.lit(1_000_000),
                            )
                            / 1_000_000.0,
                            F.lit(3.0),
                        )
                    ).cast("string"),
                ),
            ),
        )
        .withColumn(
            "tail",
            F.array(
                *[F.concat(F.lit("u"), F.col("src_id"), F.lit(c)) for c in "abcd"]
            ),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(F.concat("words", "tail"), " ").alias("text"),
        )
    )


def boiler_corpus(spark):
    boiler = F.concat(F.lit("boiler"), (F.col("src_id") % 20).cast("string"))
    return (
        spark.range(N_DOCS)
        .withColumn(
            "src_id",
            F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id")),
        )
        .withColumn(
            "header",
            F.when(
                F.col("id") % 5 < 2,
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(12)),
                        lambda j: F.concat(boiler, F.lit("w"), j.cast("string")),
                    ),
                    " ",
                ),
            ).otherwise(F.lit("")),
        )
        .withColumn(
            "body",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda j: F.concat(
                        F.lit("u"), F.col("src_id"), F.lit("t"), j.cast("string")
                    ),
                ),
                " ",
            ),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.trim(F.concat_ws(" ", "header", "body")).alias("text"),
        )
    )


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew_exp"
    spark = get_spark(app_name="skew_experiment")
    spark.sparkContext.setLogLevel("ERROR")
    for name, maker in [("zipf", zipf_corpus), ("boiler", boiler_corpus)]:
        path = f"{outdir}/{name}_docs.parquet"
        maker(spark).write.mode("overwrite").parquet(path)
        d = spark.read.parquet(path)
        sh = d.select(F.array_distinct(dedup.word_bigrams(F.col("text"))).alias("s"))
        st = (
            sh.select(F.explode("s").alias("g"))
            .groupBy("g")
            .agg(F.count("*").alias("df"))
            .agg(
                F.count("*").alias("vocab"),
                F.sum("df").alias("elems"),
                F.sum(F.col("df") * F.col("df")).alias("df2"),
            )
            .first()
        )
        ratio = st["df2"] / (st["elems"] ** 2 / st["vocab"])
        print(f"{name}: vocab={st['vocab']} elems={st['elems']} "
              f"sum_df2={st['df2']} skew_ratio={ratio:.1f}")
        for plan, fn in [
            ("prefix", dedup.ngram_jaccard_pairs_prefix),
            ("plain_shuffle", dedup.ngram_jaccard_pairs_shuffle),
        ]:
            fn(d, "text", "doc_id", 0.5).write.format("noop").mode(
                "overwrite"
            ).save()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(d, "text", "doc_id", 0.5).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            print(f"  {plan}: {best:.2f}s")
        n = dedup.ngram_jaccard_pairs_prefix(d, "text", "doc_id", 0.5).count()
        print(f"  pairs: {n} (planted: {N_DOCS // 50})")


if __name__ == "__main__":
    main()
