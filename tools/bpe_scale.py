"""BPE scale measurement (round 9): the tokenize design's claim is that the
PYTHON cost is O(distinct words), not O(corpus) — training collects only the
word-frequency table and encoding crosses Arrow once per distinct word, while
the corpus pays JVM explode/broadcast-join/window costs only.

Run over the key-offset tiers (tools/gen_scale.py: /tmp/scale/x10, x100):

    python tools/bpe_scale.py [tier_dir ...]

Per tier: corpus rows, distinct words, train seconds, tokenize-and-aggregate
seconds (count + token sum forced), tokens produced. If the distinct-word
count stays near-constant while the corpus grows 100x, train time should stay
near-flat and tokenize time should scale with the JVM reassembly, not with
Python. Results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F  # noqa: E402

from snapshot_sender_spark.operators import bpe  # noqa: E402
from snapshot_sender_spark.session import get_spark  # noqa: E402

DEFAULT_TIERS = ["/root/testdata/sf0.1", "/tmp/scale/x10", "/tmp/scale/x100"]


def main() -> None:
    tiers = sys.argv[1:] or DEFAULT_TIERS
    spark = get_spark(app_name="bpe_scale")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'tier':<28}{'docs':>9}{'words':>8}{'train_s':>9}"
          f"{'tok_s':>8}{'tokens':>12}")
    for tier in tiers:
        docs = spark.read.parquet(f"{tier}/documents.parquet")
        n_docs = docs.count()
        t0 = time.perf_counter()
        model = bpe.train_bpe(spark, docs, num_merges=60)
        train_s = time.perf_counter() - t0
        n_words = bpe.word_frequencies(docs).count()
        # warm lap pattern: one untimed run, then the timed one
        for lap in range(2):
            t0 = time.perf_counter()
            agg = (
                bpe.bpe_tokenize(spark, docs, model)
                .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("toks"))
                .first()
            )
            tok_s = time.perf_counter() - t0
        print(f"{os.path.basename(tier):<28}{n_docs:>9}{n_words:>8}"
              f"{train_s:>9.2f}{tok_s:>8.2f}{agg['toks']:>12}")


if __name__ == "__main__":
    main()
