"""Generate a scaled-up copy of a testdata tier by key-offset replication.

``python tools/gen_scale.py <src_sf_dir> <out_dir> <replication>`` writes
``replication`` disjoint copies of every fact table with all join keys offset
per copy (foreign keys move together, so join cardinalities scale linearly);
dimension tables (region, nation) are shared, like real scale-out. Document
texts get a per-copy suffix token so copies are not near-duplicates of each
other (near-dup pair counts then scale linearly with the corpus instead of
quadratically with the replication factor — the realistic corpus shape).

Used for the SCALE.md sf0.1 → sf1 spot-run; outputs land outside the
read-only /root/testdata tree.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from snapshot_sender_spark.session import get_spark

# per-copy key offsets — far above any real key range in the source tier
OFF = {
    "orderkey": 10**9,
    "custkey": 10**8,
    "suppkey": 10**7,
    "partkey": 10**8,
    "event_id": 10**9,
    "user_id": 10**8,
    "doc_id": 10**7,
    "vec_id": 10**7,
}

FACT_KEYS = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
DIMS = ["region", "nation"]


def main() -> None:
    src, out, repl = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark(app_name="gen_scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t, keys in FACT_KEYS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(repl):
            c = base
            for col, off_name in keys.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * OFF[off_name]))
            if t == "documents" and i > 0:
                # Copies must NOT be near-duplicates of each other, or the
                # near-dup pair space grows quadratically in the replication
                # factor (a data artifact, not operator cost). Suffixing EVERY
                # word per copy makes cross-copy shingle overlap exactly zero
                # while preserving each copy's internal near-dup structure.
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"_{i}")),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text"))
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(max(4, repl)).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: x{repl}")
    spark.stop()


if __name__ == "__main__":
    main()
