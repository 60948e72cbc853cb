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

``read_changes=true`` streams the CHANGE DATA FEED instead: every commit —
append, MOR delete, MOR merge, COW rewrite, overwrite, compact, restore —
becomes row-level (table columns + _change_type 'insert'|'delete' +
_commit_version), with exactly the semantics of TxTable.row_changes:
appends are per-file insert partitions (distributed), deletion-vector
actions are row-exact delete partitions, and commits that REMOVE files get
one multiset-diff partition per version (added rows EXCEPT ALL removed
rows and the converse, removed files read through their pre-commit DV
state), so a copy-on-write rewrite reports only the rows that actually
changed and a pure compaction reports nothing. This is what makes
downstream incremental pipelines exact under deletes. Scale note: the diff
partition materializes one version's rewritten rows in a single task —
right for CDC streams whose non-append commits are takedown/merge-sized;
a full-table rewrite should be consumed via the batch row_changes API.

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

from ..operators.txlog import _HIVE_NULL, _LOG_DIR, _VERSION_DIGITS, _typed_part_value


class _AddedFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        schema_json: str,
        part: dict | None = None,
        mapping: dict | None = None,
    ):
        self.path = path
        self.schema_json = schema_json
        # hive partition values from the add-action ({col: str_or_None});
        # the data file itself does not contain these columns
        self.part = part or {}
        # column mapping (logical -> physical parquet name) as of stream start
        self.mapping = mapping or {}


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
        # between schema() and streamReader(). The column mapping (logical ->
        # physical, for tables evolved via rename/drop) is likewise fixed at
        # reader construction.
        latest_schema, self.mapping, self.frozen_version = (
            self._latest_schema_and_mapping()
        )
        self.schema_json = schema_json or latest_schema

    def _latest_schema_and_mapping(self) -> tuple[str, dict, int]:
        schema_json, mapping, latest = None, {}, 0
        for v in self._versions():
            meta = self._actions(v)[0]["meta"]
            if meta.get("schema") is not None:
                schema_json = meta["schema"]
            if meta.get("column_mapping") is not None:
                mapping = dict(meta["column_mapping"])
            latest = v
        if schema_json is None:
            raise ValueError(f"no committed schema in txlog table {self.table_path!r}")
        return schema_json, mapping, latest

    def _check_mapping_frozen(self, v: int, meta: dict) -> None:
        """A column-mapping change committed AFTER this reader froze its
        mapping (rename, or a drop + re-add assigning a fresh physical) would
        make the frozen decode silently emit NULLs for real data — fail the
        stream instead; a restart picks up the new mapping (the Delta stance
        on non-additive schema changes under a running stream)."""
        cm = meta.get("column_mapping")
        if cm is not None and v > self.frozen_version and dict(cm) != dict(self.mapping):
            raise ValueError(
                f"txlog_stream: version {v} changed the column mapping under "
                "a running stream — restart the stream to adopt it"
            )

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
            self._check_mapping_frozen(v, meta)
            # metadata-only commits move no rows and are always safe to pass
            if meta["op"] not in (
                "append", "set_constraint", "rename_column", "drop_column"
            ):
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
                    parts.append(
                        _AddedFilePartition(
                            full, self.schema_json, action["add"].get("part"),
                            self.mapping,
                        )
                    )
        return parts

    def read(self, part: _AddedFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        schema = T.StructType.fromJson(json.loads(part.schema_json))
        arrow_schema = to_arrow_schema(schema)
        pf = pq.ParquetFile(part.path)
        present = set(pf.schema_arrow.names)
        # column mapping: parquet stores PHYSICAL names; emit logical ones
        phys = lambda name: part.mapping.get(name, name)  # noqa: E731
        want = [phys(f.name) for f in schema.fields]
        for batch in pf.iter_batches(columns=[c for c in want if c in present]):
            cols = []
            for field in arrow_schema:
                if phys(field.name) in present:
                    cols.append(batch.column(phys(field.name)).cast(field.type))
                elif field.name in part.part:
                    # hive partition column: constant per file, injected from
                    # the add-action's recorded value (string → typed cast)
                    raw = part.part[field.name]
                    if raw is None:
                        cols.append(pa.nulls(batch.num_rows, type=field.type))
                    else:
                        cols.append(
                            pa.array([raw] * batch.num_rows, type=pa.string()).cast(
                                field.type
                            )
                        )
                else:  # evolution-missing column: NULL backfill
                    cols.append(pa.nulls(batch.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint owns progress

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# change-data-feed mode (read_changes=true)
# ---------------------------------------------------------------------------

CDF_COLS = ("_change_type", "_commit_version")


class _NanKey:
    """Singleton stand-in for float NaN in frozen rows: NaN != NaN would make
    every NaN-bearing row look changed to the Counter diff (phantom
    insert+delete on a plain rewrite), while Spark's exceptAll — the batch
    row_changes semantics this stream must match — treats NaNs as equal."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):  # pragma: no cover - debug only
        return "<NaN>"


_NAN = _NanKey()


def _freeze(v):
    """Hashable, equality-canonical form of a row value (arrays/maps become
    tuples, NaN becomes a self-equal singleton) so multiset diffs can run on
    a Counter; _thaw() restores the original values for emission."""
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, float) and v != v:
        return _NAN
    return v


def _thaw(v):
    if v is _NAN:
        return float("nan")
    if isinstance(v, tuple):
        return [_thaw(x) for x in v]
    return v


class _CdfAddPartition(InputPartition):
    """One added file → insert rows (read through the add payload's inline
    and/or sidecar DVs if a restore re-add carries them)."""

    def __init__(self, version, path, part, payload_dv, schema_json, payload_dvf=None):
        self.version = version
        self.path = path
        self.part = part or {}
        self.payload_dv = sorted(payload_dv or [])
        self.payload_dvf = list(payload_dvf or [])  # sidecar FULL paths
        self.schema_json = schema_json


class _CdfDvPartition(InputPartition):
    """One deletion-vector action → the exact deleted rows (inline indices,
    or a sidecar parquet filtered to this data file's basename)."""

    def __init__(self, version, path, part, rows, schema_json, sidecar=None):
        self.version = version
        self.path = path
        self.part = part or {}
        self.rows = sorted(rows or [])
        self.sidecar = sidecar  # sidecar FULL path (rows empty when set)
        self.schema_json = schema_json


class _CdfDiffPartition(InputPartition):
    """One version that removes files → multiset diff of added vs removed
    rows (removed files read through their PRE-commit deletion vectors,
    added files through their payload vectors)."""

    def __init__(self, version, adds, removes, prev_dv, schema_json, prev_dvf=None):
        # adds: [(full_path, part, payload_dv, payload_dvf_full_paths)],
        # removes: [(full_path, part)]
        self.version = version
        self.adds = adds
        self.removes = removes
        self.prev_dv = prev_dv  # full_path -> sorted deleted row indices
        self.prev_dvf = prev_dvf or {}  # full_path -> sidecar FULL paths
        self.schema_json = schema_json


class _TxlogCdfStreamReader(_TxlogStreamReader):
    """Offsets and log access are inherited; only planning and row decode
    differ. ``schema_json`` here is the OUTPUT schema (table + CDF cols)."""

    def _table_fields(self):
        schema = T.StructType.fromJson(json.loads(self.schema_json))
        return [f for f in schema.fields if f.name not in CDF_COLS]

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []
        # pre-interval replay tracks per-file DV state so a diff version can
        # read removed files AS OF v-1. Control-plane cost: O(full log ×
        # inline-DV rows) per micro-batch — bounded by MOR_MAX_INLINE_DV per
        # commit, and log checkpointing keeps version files small; a reader
        # resuming far into a long log pays listdir + JSON parse only
        dv_state: dict[str, set[int]] = {}
        dvf_state: dict[str, list[str]] = {}  # per-file sidecar vector rels
        for v in self._versions():
            if v > hi:
                break
            actions = self._actions(v)
            self._check_mapping_frozen(v, actions[0]["meta"])
            adds = [a["add"] for a in actions if "add" in a]
            removes = [a["remove"]["path"] for a in actions if "remove" in a]
            dvs = [a["dv"] for a in actions if "dv" in a]
            if v > lo:
                needed = (
                    [a["path"] for a in adds]
                    + removes
                    + [d["path"] for d in dvs]
                    + [d["file"] for d in dvs if "file" in d]
                )
                for rel in needed:
                    if not os.path.exists(os.path.join(self.table_path, rel)):
                        raise FileNotFoundError(
                            f"txlog_stream CDF: v{v} file {rel!r} was already "
                            "vacuumed — keep a longer retention for CDF readers"
                        )
                full = lambda rel: os.path.join(self.table_path, rel)  # noqa: E731
                if removes:
                    parts.append(
                        _CdfDiffPartition(
                            v,
                            [
                                (
                                    full(a["path"]), a.get("part"), a.get("dv"),
                                    [full(f) for f, _n in a.get("dvf", ())],
                                )
                                for a in adds
                            ],
                            [(full(p), None) for p in removes],
                            {
                                full(p): sorted(dv_state.get(p, ()))
                                for p in removes
                                if dv_state.get(p)
                            },
                            self.schema_json,
                            prev_dvf={
                                full(p): [full(f) for f in dvf_state[p]]
                                for p in removes
                                if dvf_state.get(p)
                            },
                        )
                    )
                else:
                    for a in adds:
                        parts.append(
                            _CdfAddPartition(
                                v, full(a["path"]), a.get("part"), a.get("dv"),
                                self.schema_json,
                                payload_dvf=[full(f) for f, _n in a.get("dvf", ())],
                            )
                        )
                    for d in dvs:
                        if "file" in d:
                            # sidecar vector: rows read executor-side from
                            # the sidecar parquet, filtered to this data
                            # file; fresh by writer construction (the
                            # matched scan read through prior vectors)
                            parts.append(
                                _CdfDvPartition(
                                    v, full(d["path"]),
                                    self._part_of(d["path"]),
                                    None, self.schema_json,
                                    sidecar=full(d["file"]),
                                )
                            )
                            continue
                        # report only rows not already deleted (defensive:
                        # writers never re-delete, but the feed must not
                        # double-report even on a hand-written log)
                        fresh = sorted(set(d["rows"]) - dv_state.get(d["path"], set()))
                        if fresh:
                            parts.append(
                                _CdfDvPartition(
                                    v, full(d["path"]),
                                    self._part_of(d["path"]),
                                    fresh, self.schema_json,
                                )
                            )
            # replay order mirrors the log: removes clear state, adds reset
            # it to the payload's vector, dv actions union into it
            for p in removes:
                dv_state.pop(p, None)
                dvf_state.pop(p, None)
            for a in adds:
                dv_state[a["path"]] = set(a.get("dv", ()))
                dvf_state[a["path"]] = [f for f, _n in a.get("dvf", ())]
            for d in dvs:
                if "file" in d:
                    dvf_state.setdefault(d["path"], []).append(d["file"])
                else:
                    dv_state.setdefault(d["path"], set()).update(d["rows"])
        return parts

    def _part_of(self, rel: str) -> dict | None:
        """Partition values for a file, from its hive directory components
        (cheap, no log scan; identical to the add-action's record)."""
        import urllib.parse

        vals = {}
        for comp in os.path.dirname(rel).split(os.sep):
            if "=" in comp:
                name, _, raw = comp.partition("=")
                vals[name] = None if raw == _HIVE_NULL else urllib.parse.unquote(raw)
        return vals or None

    # -- row decode ----------------------------------------------------------

    def _file_rows(self, path, part_vals, exclude):
        """All rows of one file as frozen tuples in TABLE-column order,
        partition values injected, ``exclude`` row indices dropped."""
        import pyarrow.parquet as pq

        fields = self._table_fields()
        pf = pq.ParquetFile(path)
        present = set(pf.schema_arrow.names)
        exclude = set(exclude or ())
        rows: list[tuple] = []
        offset = 0
        part_vals = part_vals or {}
        phys = lambda name: self.mapping.get(name, name)  # noqa: E731
        for batch in pf.iter_batches(
            columns=[phys(f.name) for f in fields if phys(f.name) in present]
        ):
            cols = []
            for f in fields:
                if phys(f.name) in present:
                    cols.append(batch.column(phys(f.name)).to_pylist())
                elif f.name in part_vals:
                    raw = part_vals[f.name]
                    typed = _typed_part_value(raw, f.dataType)
                    cols.append([typed] * batch.num_rows)
                else:
                    cols.append([None] * batch.num_rows)
            for i, row in enumerate(zip(*cols) if cols else []):
                if offset + i not in exclude:
                    rows.append(tuple(_freeze(v) for v in row))
            offset += batch.num_rows
        return rows

    def _emit(self, rows, change_type, version):
        """One Arrow batch: table columns + _change_type + _commit_version."""
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        if not rows:
            return
        out_schema = to_arrow_schema(T.StructType.fromJson(json.loads(self.schema_json)))
        fields = self._table_fields()
        cols = list(zip(*rows))
        arrays = []
        for f, values in zip(fields, cols):
            arrays.append(
                pa.array([_thaw(v) for v in values], type=out_schema.field(f.name).type)
            )
        arrays.append(pa.array([change_type] * len(rows), type=pa.string()))
        arrays.append(pa.array([version] * len(rows), type=pa.int64()))
        yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    @staticmethod
    def _sidecar_rows(sidecar_paths, basename) -> set:
        """Deleted row indices for ONE data file out of sidecar parquet(s)
        of (__f, __ri) pairs — predicate-pushed, executor-side."""
        import pyarrow.parquet as pq

        out: set = set()
        for sp in sidecar_paths or ():
            tbl = pq.read_table(sp, columns=["__f", "__ri"], filters=[("__f", "=", basename)])
            out.update(tbl.column("__ri").to_pylist())
        return out

    def read(self, part):
        from collections import Counter

        if isinstance(part, _CdfAddPartition):
            exclude = set(part.payload_dv) | self._sidecar_rows(
                part.payload_dvf, os.path.basename(part.path)
            )
            rows = self._file_rows(part.path, part.part, exclude)
            yield from self._emit(rows, "insert", part.version)
        elif isinstance(part, _CdfDvPartition):
            all_rows = self._file_rows(part.path, part.part, None)
            idxs = part.rows or sorted(
                self._sidecar_rows([part.sidecar], os.path.basename(part.path))
            )
            rows = [all_rows[i] for i in idxs if i < len(all_rows)]
            yield from self._emit(rows, "delete", part.version)
        else:  # _CdfDiffPartition: multiset difference, exactly row_changes
            ca: Counter = Counter()
            for path, pvals, payload_dv, payload_dvf in part.adds:
                exclude = set(payload_dv or ()) | self._sidecar_rows(
                    payload_dvf, os.path.basename(path)
                )
                ca.update(self._file_rows(path, pvals, exclude))
            cr: Counter = Counter()
            for path, pvals in part.removes:
                exclude = set(part.prev_dv.get(path, ())) | self._sidecar_rows(
                    part.prev_dvf.get(path), os.path.basename(path)
                )
                cr.update(
                    self._file_rows(
                        path, pvals or self._part_of(os.path.relpath(path, self.table_path)),
                        exclude,
                    )
                )
            ins = ca - cr
            dels = cr - ca
            yield from self._emit(list(ins.elements()), "insert", part.version)
            yield from self._emit(list(dels.elements()), "delete", part.version)


class TxlogStreamDataSource(DataSource):
    """Registered as ``txlog_stream``; the stored table schema (latest
    commit's, driver-side one log replay) is the source schema. With
    ``read_changes=true`` the schema gains _change_type/_commit_version and
    every commit streams as row-level changes (see module doc)."""

    @classmethod
    def name(cls):
        return "txlog_stream"

    @staticmethod
    def _cdf(options) -> bool:
        return str(options.get("read_changes", "false")).lower() == "true"

    def schema(self):
        base = T.StructType.fromJson(
            json.loads(_TxlogStreamReader(self.options).schema_json)
        )
        if self._cdf(self.options):
            base = base.add("_change_type", T.StringType()).add(
                "_commit_version", T.LongType()
            )
        return base

    def streamReader(self, schema: T.StructType):
        # pass the ENGINE's schema through: batches must match the analyzed
        # plan even if a commit evolved the table after schema() was called
        cls = _TxlogCdfStreamReader if self._cdf(self.options) else _TxlogStreamReader
        return cls(self.options, schema_json=json.dumps(schema.jsonValue()))


def register(spark) -> None:
    spark.dataSource.register(TxlogStreamDataSource)
