"""Measure ANN recall@k vs the exact brute-force baseline across scale tiers
(1× = sf0.1, 10× = /tmp/scale/sf1, 100× = /tmp/scale/sf10 — regenerate the
big tiers with tools/gen_scale.py). The approximate tier's QUALITY is
quantified, not just its wall-clock: for each tier we report mean recall@10
over a fixed query panel for

  - lsh   : single-query BucketedRandomProjectionLSH + exact re-rank
  - ivf   : k-means coarse quantizer, n_probe of n_centroids buckets probed
  - batch : one approxSimilarityJoin for the whole query panel

Every returned cosine is computed by the same quantized exact kernel as the
brute-force baseline, so recall is purely "did the candidate set contain the
true top-k" — approximation never changes scores, only candidate coverage.

Usage: python tools/ann_recall.py [tier ...]   (default: all available tiers)
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from snapshot_sender_spark.operators import similarity  # noqa: E402
from snapshot_sender_spark.session import get_spark  # noqa: E402

TIERS = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/scale/x10",
    "100x": "/tmp/scale/x100",
    # 2M vectors: 1000 key-offset copies of sf0.1 with IDENTICAL embeddings
    # per copy — every vector has a 1000-wide exact-duplicate tie class, the
    # hardest case for a fixed over-retrieve budget and exactly what the
    # auto budget (max(k·20, 200, n/1000)) must absorb. Round 7 extends the
    # tier to ALL THREE approximate APIs: ivf builds its coarse quantizer on
    # a 2% seeded sample (train_fraction — the FAISS practice; a full-corpus
    # k-means would dominate the build) and batch runs the one-join panel at
    # N_BATCH_1000X queries. A fixed-budget lsh row shows the failure the
    # auto dial prevents.
    "1000x": "/tmp/scale/sf100_emb",
}
K = 10
N_SINGLE = 8  # queries for the per-query APIs (each refits its model)
N_BATCH = 32  # queries for the one-join batch API


def load_emb(spark, tier_dir):
    return spark.read.parquet(f"{tier_dir}/embeddings.parquet")


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(TIERS)
    print("| tier | vectors | api | params | mean recall@10 | sec |")
    print("|---|---|---|---|---|---|")
    for name in names:
        tier = TIERS[name]
        emb = load_emb(spark, tier).cache()
        n = emb.count()
        # fixed deterministic panel: the N lowest vec_ids are the queries,
        # the rest of the corpus is searched
        panel_ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(N_BATCH).collect()]
        qvecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id").isin(panel_ids)).collect()
        }
        corpus = emb.filter(~F.col("vec_id").isin(panel_ids)).cache()
        corpus.count()

        # at the 1000x tier every API runs, but the batch panel shrinks to
        # the N_SINGLE ground-truthed queries — ground truth is the
        # expensive part (brute-force scans of a 2M-vector corpus), not the
        # approximate runs
        gt_ids = panel_ids[:N_SINGLE] if name == "1000x" else panel_ids
        exact = {}
        t0 = time.monotonic()
        for qid in gt_ids:
            exact[qid] = {
                r["vec_id"]
                for r in similarity.cosine_topk(
                    corpus, "embedding", "vec_id", qvecs[qid], k=K
                ).collect()
            }
        exact_sec = time.monotonic() - t0
        print(f"| {name} | {n} | exact | full scan ×{len(gt_ids)} | 1.000 (baseline) | {exact_sec:.1f} |")
        sys.stdout.flush()

        probes = []
        # IVF through the PERSISTED index (the scale path: cluster once,
        # partition-pruned probes per query). Centroid count grows with
        # the corpus (√n rule of thumb), probe fraction held at 1/4. At the
        # 2M tier the coarse quantizer trains on a 2% seeded sample
        # (train_fraction — the FAISS practice); every vector is still
        # assigned, so only quantizer QUALITY rides on the sample, and the
        # recall row measures exactly that.
        n_cent = max(16, 2 ** int(math.log2(max(16, int(math.sqrt(n))))))
        n_probe = max(4, n_cent // 4)
        train_frac = 0.02 if name == "1000x" else 1.0
        index_dir = f"/tmp/ann_recall_index_{name}"
        t0 = time.monotonic()
        similarity.build_ivf_index(
            corpus, "embedding", "vec_id", index_dir, n_centroids=n_cent,
            train_fraction=train_frac,
        )
        build_sec = time.monotonic() - t0
        train_note = f", train={train_frac:g}" if train_frac < 1.0 else ""
        print(f"| {name} | {n} | ivf-build | c={n_cent}{train_note}, once per corpus | — | {build_sec:.1f} |")
        sys.stdout.flush()
        probes.append(
            (
                "ivf",
                f"c={n_cent} probe={n_probe}{train_note}",
                lambda q: similarity.ivf_search_index(
                    spark, index_dir, q, k=K, n_probe=n_probe
                ),
            )
        )
        probes.append(
            (
                "lsh",
                f"tables=3 bl=2.0 cand=auto({max(200, n // 1000)})",
                lambda q: similarity.lsh_ann_topk(
                    corpus, "embedding", "vec_id", q, k=K,
                    corpus_count=n - N_BATCH,  # known → skip the sizing count
                ),
            )
        )
        if name == "1000x":
            # the counterfactual: the fixed budget that was right at 200k —
            # the 1000-wide exact-duplicate tie classes must defeat it
            probes.append(
                (
                    "lsh",
                    "tables=3 bl=2.0 cand=200 (FIXED, the r5 default)",
                    lambda q: similarity.lsh_ann_topk(
                        corpus, "embedding", "vec_id", q, k=K,
                        num_candidates=200,
                    ),
                )
            )
        for api, params, fn in probes:
            t0 = time.monotonic()
            hits = total = 0
            for qid in panel_ids[:N_SINGLE]:
                got = {r["id"] for r in fn(qvecs[qid]).collect()}
                hits += len(got & exact[qid])
                total += K
            sec = time.monotonic() - t0
            print(f"| {name} | {n} | {api} | {params} ×{N_SINGLE} | {hits / total:.3f} | {sec:.1f} |")
            sys.stdout.flush()

        # batch: one approxSimilarityJoin for the whole panel. At the 2M
        # tier the panel is the N_SINGLE ground-truthed queries (ground
        # truth is the expensive part — 2M-row brute-force scans — not the
        # join itself), and the join needs its DISTANCE dial: the default
        # max_distance=10.0 admits nearly every bucket collision — an 8×2M
        # candidate stream that GC-killed the local JVM. The 1000-wide
        # exact-duplicate tie classes sit at Euclidean distance 0, so a
        # tight cut (0.5) keeps every true neighbor while pruning the
        # stream BEFORE the shuffle — max_distance is the batch API's
        # recall/cost dial exactly as num_candidates is the single-query
        # API's.
        batch_ids = panel_ids[:N_SINGLE] if name == "1000x" else panel_ids
        max_dist = 0.5 if name == "1000x" else 10.0
        queries_df = emb.filter(F.col("vec_id").isin(batch_ids)).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        t0 = time.monotonic()
        batch = similarity.lsh_batch_topk(
            corpus, queries_df, "embedding", "vec_id", "query_id", k=K,
            max_distance=max_dist,
        ).collect()
        sec = time.monotonic() - t0
        by_q: dict = {}
        for r in batch:
            by_q.setdefault(r["query_id"], set()).add(r["id"])
        hits = sum(len(by_q.get(qid, set()) & exact[qid]) for qid in batch_ids)
        print(
            f"| {name} | {n} | batch | one join ×{len(batch_ids)}, d≤{max_dist:g} | {hits / (K * len(batch_ids)):.3f} | {sec:.1f} |"
        )
        sys.stdout.flush()
        emb.unpersist()
        corpus.unpersist()


if __name__ == "__main__":
    main()
