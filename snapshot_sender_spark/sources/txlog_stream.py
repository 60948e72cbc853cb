"""Streaming reads FROM a transactional txlog table (operators/txlog.py) —
the table-as-a-stream-source half of the lakehouse contract (Delta's
streaming source re-expressed through the Spark 4 Python DataSource API).

The stream offset IS the commit version: ``latestOffset`` polls the log
(O(listdir), no data I/O), ``partitions(start, end)`` replays exactly the
versions in ``(start, end]`` and plans ONE InputPartition PER ADDED FILE, and
``read`` yields the file's rows as Arrow record batches under the table's
stored schema (evolution-missing columns are backfilled as NULL columns, the
same contract as the batch reader). Exactly-once falls out of the engine's
offset checkpointing: a restarted query resumes from the committed version
and never re-reads a file it already emitted.

Non-append commits (delete/overwrite/merge/compact/restore) have no
append-only row semantics to stream; by default the source FAILS the batch
that encounters one (the Delta-without-ignoreChanges stance — silently
streaming a COW rewrite would duplicate every copied row). With
``ignore_changes=true`` those commits are skipped entirely: downstream sees
an append-only projection of the table and accepts the documented gap.

Scale: the poll is one directory listing; each micro-batch's work is
distributed per added file; the driver never touches row data. A JVM-native
file-source would push the parquet scan into the engine — this Python decode
path is the pluggable-source tradeoff, same stance as sources/avro_pyds.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

from ..operators.txlog import _LOG_DIR, _VERSION_DIGITS


class _AddedFilePartition(InputPartition):
    def __init__(self, path: str, schema_json: str):
        self.path = path
        self.schema_json = schema_json


class _TxlogStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema_json: str | None = None):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("txlog_stream requires option path=<table dir>")
        self.ignore_changes = str(options.get("ignore_changes", "false")).lower() == "true"
        self.start_version = int(options.get("starting_version", "0"))
        # the STREAM schema is fixed for the reader's lifetime: every emitted
        # batch uses it, older files backfill NULL, and columns evolved AFTER
        # the stream started surface only on restart — the Delta streaming
        # stance. streamReader() passes the ENGINE's schema through so batches
        # can never diverge from the analyzed plan, even when a commit lands
        # between schema() and streamReader().
        self.schema_json = schema_json or self._latest_schema_json()

    def _latest_schema_json(self) -> str:
        schema_json = None
        for v in self._versions():
            meta = self._actions(v)[0]["meta"]
            if meta.get("schema") is not None:
                schema_json = meta["schema"]
        if schema_json is None:
            raise ValueError(f"no committed schema in txlog table {self.table_path!r}")
        return schema_json

    # -- log access (driver side; mirrors TxTable's layout contract) ---------

    def _log_dir(self) -> str:
        return os.path.join(self.table_path, _LOG_DIR)

    def _versions(self) -> list[int]:
        d = self._log_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            int(n[1:-5]) for n in os.listdir(d) if n.startswith("v") and n.endswith(".json")
        )

    def _actions(self, v: int) -> list[dict]:
        f = os.path.join(self._log_dir(), f"v{v:0{_VERSION_DIGITS}d}.json")
        with open(f, "r", encoding="utf-8") as fh:
            return [json.loads(line) for line in fh if line.strip()]

    # -- stream contract ------------------------------------------------------

    def initialOffset(self):
        return {"version": self.start_version}

    def latestOffset(self):
        versions = self._versions()
        latest = versions[-1] if versions else self.start_version
        return {"version": max(latest, self.start_version)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[_AddedFilePartition] = []
        for v in self._versions():
            if v <= lo:  # before reading anything: a micro-batch costs O(tail)
                continue
            if v > hi:
                break
            actions = self._actions(v)
            meta = actions[0]["meta"]
            if meta["op"] not in ("append", "set_constraint"):
                if self.ignore_changes:
                    continue
                raise ValueError(
                    f"txlog_stream: version {v} is a {meta['op']!r} commit — "
                    "streaming a rewrite would duplicate or lose rows; pass "
                    "ignore_changes=true to skip non-append commits explicitly"
                )
            for action in actions[1:]:
                if "add" in action:
                    full = os.path.join(self.table_path, action["add"]["path"])
                    if not os.path.exists(full):
                        raise FileNotFoundError(
                            f"txlog_stream: v{v} file {action['add']['path']!r} "
                            "was already vacuumed — keep a longer retention for "
                            "streaming readers, or start from a newer "
                            "starting_version"
                        )
                    parts.append(_AddedFilePartition(full, self.schema_json))
        return parts

    def read(self, part: _AddedFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        schema = T.StructType.fromJson(json.loads(part.schema_json))
        arrow_schema = to_arrow_schema(schema)
        pf = pq.ParquetFile(part.path)
        present = set(pf.schema_arrow.names)
        want = [f.name for f in schema.fields]
        for batch in pf.iter_batches(columns=[c for c in want if c in present]):
            cols = []
            for field in arrow_schema:
                if field.name in present:
                    cols.append(batch.column(field.name).cast(field.type))
                else:  # evolution-missing column: NULL backfill
                    cols.append(pa.nulls(batch.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint owns progress

    def stop(self) -> None:
        pass


class TxlogStreamDataSource(DataSource):
    """Registered as ``txlog_stream``; the stored table schema (latest
    commit's, driver-side one log replay) is the source schema."""

    @classmethod
    def name(cls):
        return "txlog_stream"

    def schema(self):
        return T.StructType.fromJson(
            json.loads(_TxlogStreamReader(self.options).schema_json)
        )

    def streamReader(self, schema: T.StructType):
        # pass the ENGINE's schema through: batches must match the analyzed
        # plan even if a commit evolved the table after schema() was called
        return _TxlogStreamReader(
            self.options, schema_json=json.dumps(schema.jsonValue())
        )


def register(spark) -> None:
    spark.dataSource.register(TxlogStreamDataSource)
