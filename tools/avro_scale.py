"""Avro range-split scale measurement (round 9): one BIG container file must
fan out across tasks — the whole point of the sync-marker split algorithm
(sources/avro_pyds.py). Generates a single multi-hundred-MB-scale avro file
once (cached in /tmp), then times a full-scan aggregate at decreasing
split_bytes: a correct splitter shows near-linear speedup from 1 partition
to many on local[32], with identical results.

    python tools/avro_scale.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F  # noqa: E402

from snapshot_sender_spark.functions import avro_codec  # noqa: E402
from snapshot_sender_spark.session import get_spark  # noqa: E402
from snapshot_sender_spark.sources import avro_pyds  # noqa: E402

SCHEMA = {
    "type": "record",
    "name": "big",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "key", "type": "string"},
        {"name": "val", "type": "double"},
        {"name": "note", "type": ["null", "string"]},
    ],
}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    d = f"/tmp/scale/avro_{n_rows}"
    path = os.path.join(d, "big.avro")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        rows = (
            {
                "id": i,
                # low-redundancy payloads so deflate cannot collapse the file
                # into a handful of blocks (the scan-cost shape of real data)
                "key": f"{(i * 2654435761) & 0xFFFFFFFFFFFF:012x}",
                "val": (i % 9973) / 7.0,
                "note": None if i % 5 == 0 else f"{(i * 1099511628211) & 0xFFFFFFFFFF:010x}",
            }
            for i in range(n_rows)
        )  # generator: the streaming writer keeps memory at one block
        t0 = time.perf_counter()
        avro_codec.write_avro_file(path, SCHEMA, rows, codec="deflate",
                                   block_rows=10_000)
        print(f"wrote {os.path.getsize(path)/1e6:.1f} MB in "
              f"{time.perf_counter()-t0:.1f}s (driver-side fixture writer)")
    size = os.path.getsize(path)
    spark = get_spark(app_name="avro_scale")
    spark.sparkContext.setLogLevel("ERROR")
    avro_pyds.register(spark)
    expect = None
    print(f"file {size/1e6:.1f} MB; rows {n_rows}")
    print(f"{'split_bytes':>12}{'parts':>7}{'cold_s':>8}{'warm_s':>8}")
    for split in (size, 32 * 1024 * 1024, 8 * 1024 * 1024, 2 * 1024 * 1024):
        reader = avro_pyds.AvroFileReader({"path": d, "split_bytes": str(split)})
        parts = len(reader.partitions())
        laps = []
        for _ in range(2):
            t0 = time.perf_counter()
            got = (
                spark.read.format("avrofile")
                .option("split_bytes", split)
                .load(d)
                .agg(F.count("*").alias("n"), F.sum("id").alias("s"),
                     F.count("note").alias("nn"))
                .first()
            )
            laps.append(time.perf_counter() - t0)
        row = (got["n"], got["s"], got["nn"])
        if expect is None:
            expect = row
        assert row == expect, (split, row, expect)  # identical results per split
        print(f"{split:>12}{parts:>7}{laps[0]:>8.2f}{laps[1]:>8.2f}")
    assert expect[0] == n_rows


if __name__ == "__main__":
    main()
