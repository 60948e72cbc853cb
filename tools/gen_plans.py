"""Regenerate PLANS.md: formatted physical plans of representative queries
with scale-property annotations. Usage: python tools/gen_plans.py [sf_dir]"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from snapshot_sender_spark.queries import all_queries  # noqa: E402
from snapshot_sender_spark.session import get_spark  # noqa: E402

PICKS = [
    ("q1_pricing_summary", "TPC-H Q1: scan→partial agg→exchange→final agg. The scan reads only the 7 touched columns (ReadSchema) and the date filter is pushed (PushedFilters); the aggregate is two-phase, so only 4-group partials cross the exchange."),
    ("join_broadcast_enrich", "Dimension enrichment: every join is a BroadcastHashJoin — no shuffle of the fact side at any size ratio like this."),
    ("join_asof_last_click", "As-of join as composition: the range condition rides the user_id equi-join, then one WindowGroupLimit keeps the latest click per purchase — no CartesianProduct anywhere."),
    ("sort_topk_global", "Global top-k: TakeOrderedAndProject (per-partition heaps merged on the driver), never a total sort."),
    ("dedup_exact", "Exact dedup: only (128-bit hash, id) pairs shuffle; document text stays in place."),
    ("curation_source_cap", "Per-source cap: WindowGroupLimit keeps K rows per source inside each shuffle partition before the filter — the corpus is never fully sorted."),
    ("decontam_ngram_overlap", "Benchmark decontamination: the bench-gram set broadcasts; corpus grams are probed map-side."),
    ("sample_weighted_hash", "Weighted sampling: the integer-hash predicate is evaluated in the scan stage — whole-stage codegen, no exchange before the group-by of the tiny survivor set."),
    ("dedup_simhash_pairs", "SimHash near-dup mining: signatures from the vectorized Arrow kernel, then the 16-bit-band self-join — candidate pairs share a band (shuffle keyed on the band value), never an all-pairs product; the hamming filter runs on the already-tiny candidate set. Exact for hamming ≤ 3 by pigeonhole (oracle-checked)."),
    ("dedup_substring_spans", "Exact substring dedup (round 6): the positional-shingle stream (one row per token) exchanges only (16-byte binary md5, id, pos) — document text never shuffles; the duplicated-window groupBy is two-phase partial agg (Exchange 14 carries post-HAVING hashes only), and the islands pass is one per-doc window (Exchange 21). At this tier the small dup-hash set and per-doc stats BROADCAST (joins 19/32); at corpus scale AQE falls back to the same joins shuffled on the 16-byte key — either way the probe side never re-shuffles text because the text column was pruned at the scan."),
    ("dedup_chunk_level", "C4-style line/chunk dedup (round 6): the winner window partitions on the 16-byte binary chunk hash and row_number picks the first (id, pos) occurrence — and Spark inserts WindowGroupLimit on BOTH sides of the exchange (7 before, 10 after), so each map task forwards at most one candidate per chunk hash and the shuffle carries survivors, not the corpus. Chunk text crosses that exchange and the per-doc reassembly groupBy — exactly two text-bearing exchanges, no driver state."),
    ("dedup_image_near", "Perceptual image dedup (round 6): the synth and decode+aHash MapInPandas stages stack back-to-back with NO exchange between them (plan nodes 3-4) — image bytes move worker-locally between the Python runners and never cross an exchange; after the hash stage only (id, 8-byte sig) rows exist, and the band explode, band-equality join, and hamming filter are all JVM. The same shape serves the audio and video fingerprint miners."),
]

HEADER = [
    "# PLANS — physical plans of representative queries",
    "",
    "Generated with `df.explain('formatted')` at sf0.001 (plan shapes are",
    "size-independent; AQE may re-plan exchanges at runtime). Regression",
    "tests in `tests/test_plans.py` pin the load-bearing properties; the",
    "whole-surface audit (`test_declared_surface_plan_audit`) pins Python",
    "crossings and nested-loop usage for every declared query.",
    "",
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gen_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = list(HEADER)
    for name, note in PICKS:
        df = qs[name].fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree.rstrip(), "```", ""]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md regenerated ({len(PICKS)} queries)")


if __name__ == "__main__":
    main()
