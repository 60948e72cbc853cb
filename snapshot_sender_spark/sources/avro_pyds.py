"""Distributed Avro scan as a Python DataSource (round-9 verdict #3).

The image ships neither the spark-avro jar nor a Python avro package, so
the scan is built on the repo's pure-spec container codec
(functions/avro_codec.py) behind the Spark 4 Python DataSource API —
registered as ``avrofile``:

* the planner lists ``*.avro`` files under ``path`` and cuts each into
  byte-range InputPartitions of ``split_bytes`` (default 4 MiB) — the REAL
  Avro split algorithm: a range owns every block whose first byte follows
  a sync marker inside the range, so a 100 TB directory fans out to
  size-balanced tasks with no central index and no per-file skew from
  giant files (one file can feed many tasks);
* each task reads only its byte range (plus one 16-byte sync lookback),
  decoding blocks independently — I/O is O(range), not O(file);
* the Spark schema derives from the writer schema in the FIRST file's
  header (one tiny driver-side header read, like parquet footer sampling).

Write path: ``avro_codec.write_avro_file`` (driver-side, used by fixtures
and tests); a distributed writer would ride the repo's existing DSv2 sink
protocol (sources/pyds_sink.py) and is not needed by any query.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..functions import avro_codec

DEFAULT_SPLIT_BYTES = 4 * 1024 * 1024


def _spark_type(schema) -> str:
    schema = avro_codec._norm_schema(schema)
    if isinstance(schema, list):  # ["null", T]
        return _spark_type(schema[1])
    prim = {
        "boolean": "boolean",
        "int": "int",
        "long": "bigint",
        "float": "float",
        "double": "double",
        "bytes": "binary",
        "string": "string",
    }
    if isinstance(schema, str) and schema in prim:
        return prim[schema]
    if isinstance(schema, dict) and schema.get("type") == "array":
        return f"array<{_spark_type(schema['items'])}>"
    raise avro_codec.AvroUnsupported(f"no Spark mapping for {schema!r}")


def spark_ddl_for(avro_schema) -> tuple[str, list[str]]:
    """(DDL string, field-name order) for a record writer schema."""
    schema = avro_codec._norm_schema(avro_schema)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise avro_codec.AvroUnsupported("top-level schema must be a record")
    names = [f["name"] for f in schema["fields"]]
    ddl = ", ".join(
        f"{f['name']} {_spark_type(f['type'])}" for f in schema["fields"]
    )
    return ddl, names


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.avro")))
    return sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]


class _RangePartition(InputPartition):
    def __init__(self, path: str, lo: int, hi: int):
        self.path, self.lo, self.hi = path, lo, hi


class AvroFileReader(DataSourceReader):
    def __init__(self, options, spark_schema=None):
        self.path = options.get("path")
        if not self.path:
            raise avro_codec.AvroError("avrofile source needs a path")
        self.split_bytes = int(options.get("split_bytes", DEFAULT_SPLIT_BYTES))
        files = _list_files(self.path)
        if not files:
            raise avro_codec.AvroError(f"no .avro files under {self.path!r}")
        with open(files[0], "rb") as fh:
            schema, _, _, _ = avro_codec.read_header(fh)
        _, writer_order = spark_ddl_for(schema)
        # Spark binds yielded tuples to the READ schema positionally, so a
        # user-supplied .schema(...) must drive the projection BY NAME — a
        # rename/reorder that silently misbound columns would ship wrong
        # data with no diagnostic. Unknown names fail loudly instead.
        if spark_schema is not None:
            wanted = list(spark_schema.fieldNames())
            missing = [n for n in wanted if n not in writer_order]
            if missing:
                raise avro_codec.AvroUnsupported(
                    f"requested columns {missing} not in the Avro writer "
                    f"schema {writer_order} — the avrofile reader projects "
                    "by field name (no positional rebinding, no casts)"
                )
            self.field_order = wanted
        else:
            self.field_order = writer_order
        self.files = files

    def partitions(self):
        parts = []
        step = max(1, self.split_bytes)
        for f in self.files:
            size = os.path.getsize(f)
            lo = 0
            while lo < size:
                parts.append(_RangePartition(f, lo, min(lo + step, size)))
                lo += step
        return parts

    def read(self, part: _RangePartition):
        order = self.field_order
        for rec in avro_codec.iter_avro_range(part.path, part.lo, part.hi):
            yield tuple(rec[n] for n in order)


class AvroFileDataSource(DataSource):
    """spark.read.format("avrofile").option("split_bytes", N).load(path)"""

    @classmethod
    def name(cls) -> str:
        return "avrofile"

    def schema(self) -> str:
        files = _list_files(self.options.get("path", ""))
        if not files:
            raise avro_codec.AvroError(
                f"no .avro files under {self.options.get('path')!r}"
            )
        with open(files[0], "rb") as fh:
            schema, _, _, _ = avro_codec.read_header(fh)
        ddl, _ = spark_ddl_for(schema)
        return ddl

    def reader(self, schema) -> AvroFileReader:
        return AvroFileReader(self.options, spark_schema=schema)


def register(spark) -> None:
    spark.dataSource.register(AvroFileDataSource)
