"""BPE scale measurement (round 9): the tokenize design's claim is that the
PYTHON cost is O(distinct words), not O(corpus) — training collects only the
word-frequency table and encoding crosses Arrow once per distinct word, while
the corpus pays JVM explode/broadcast-join/window costs only.

Run over the key-offset tiers (tools/gen_scale.py: /tmp/scale/x10, x100):

    python tools/bpe_scale.py [tier_dir ...]

Per tier: corpus rows, distinct words, train seconds, tokenize-and-aggregate
seconds (count + token sum forced), tokens produced, and which physical join
form the word join chose (broadcast vs shuffle). If the distinct-word count
stays near-constant while the corpus grows 100x, train time should stay
near-flat and tokenize time should scale with the JVM reassembly, not with
Python. Results recorded in SCALE.md.

--highvocab (round-10 verdict #3): additionally synthesize a corpus with
~3e6 DISTINCT words — above BROADCAST_MAX_WORDS (2e6) — proving the
broadcast guard routes the word join to a keyed SHUFFLE (no
BroadcastExchange) and the shuffle path completes and performs. Real web
corpora have 1e8-1e9 distinct whitespace tokens; an unguarded broadcast of
the encoded word table is the scale-killer the guard exists for.
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


def _join_form(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "broadcast" if "BroadcastExchange" in plan else "shuffle"


def _measure(spark, docs, label: str) -> None:
    n_docs = docs.count()
    t0 = time.perf_counter()
    model = bpe.train_bpe(spark, docs, num_merges=60)
    train_s = time.perf_counter() - t0
    n_words = bpe.word_frequencies(docs).count()
    # warm lap pattern: one untimed run, then the timed one
    for lap in range(2):
        t0 = time.perf_counter()
        tok = bpe.bpe_tokenize(spark, docs, model)
        agg = tok.agg(F.count("*").alias("n"), F.sum("n_tokens").alias("toks")).first()
        tok_s = time.perf_counter() - t0
    print(f"{label:<28}{n_docs:>9}{n_words:>9}{train_s:>9.2f}"
          f"{tok_s:>8.2f}{agg['toks']:>13}{_join_form(tok):>11}")


def _highvocab_docs(spark, n_docs: int = 300_000, words_per_doc: int = 10):
    """~3e6 distinct words (every word unique per position): the URL/typo/
    number-heavy shape of a web corpus, where vocabulary grows with the
    corpus instead of saturating."""
    cols = [
        F.concat(F.lit("w"), ((F.col("id") * words_per_doc) + j).cast("string"))
        for j in range(words_per_doc)
    ]
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *cols).alias("text")
    )


def main() -> None:
    args = sys.argv[1:]
    highvocab = "--highvocab" in args
    if highvocab:
        args.remove("--highvocab")
    tiers = args or DEFAULT_TIERS
    spark = get_spark(app_name="bpe_scale")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'tier':<28}{'docs':>9}{'words':>9}{'train_s':>9}"
          f"{'tok_s':>8}{'tokens':>13}{'word_join':>11}")
    for tier in tiers:
        docs = spark.read.parquet(f"{tier}/documents.parquet")
        _measure(spark, docs, os.path.basename(tier))
    if highvocab:
        _measure(spark, _highvocab_docs(spark), "highvocab-3e6w")


if __name__ == "__main__":
    main()
