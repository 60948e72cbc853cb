"""Python DataSource (Spark 4 DataSource API): the reference's S3 snapshot
listing re-expressed as a first-class pluggable source.

The reference's source is a paginated ListObjectsV2 scan that emits one row
per snapshot file under a prefix (S3DirectoryReader.kt:31-98), with the
filename grammar ``(db.)?<database>.<collection>-NNN-NNN-NNNNNN.txt.gz.enc``
(TextParsingUtility.kt:11, fixture s3_files.py:35). Here that listing is a
``DataSource`` subclass registered under the short name ``snapshot_listing``:

* one ``InputPartition`` per topic — the planner parallelizes the listing
  across executors by topic, the reference's natural partition key (§1.3),
  instead of the reference's single synchronized reader thread;
* ``pushFilters`` handles ``EqualTo``/``In`` on ``topic`` by pruning entire
  partitions at planning time — the DSv2 pushdown contract, so a
  ``WHERE topic = ...`` never even lists the other topics (the reference
  re-lists everything and filters in application code);
* rows are derived deterministically from (topic index, file index) — a
  listing fixture, so the DuckDB oracle can reproduce it exactly with
  ``generate_series``.

At 100 TB the same class wraps a real paginated object-store listing: each
partition lists its own prefix server-side; pushdown keeps the listing
O(selected prefixes), and Spark schedules one task per prefix.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

LISTING_SCHEMA = (
    "topic string, database string, collection string, fileName string, "
    "file_no int, total_files int, size_bytes bigint"
)

# deterministic topic universe (database, collection) — fixture-shaped names
TOPICS = [
    ("core", "claimant"),
    ("core", "contract"),
    ("core", "statement"),
    ("accepted-data", "address"),
    ("crypto", "encryptedData"),
    ("quartz", "claimantEvent"),
]


def _file_row(ti: int, db: str, coll: str, fi: int, total: int):
    """One listing row, fully determined by (topic-index, file-index)."""
    topic = f"db.{db}.{coll}"
    name = f"{topic}-{fi:03d}-{fi + 1:03d}-{fi:06d}.txt.gz.enc"
    # size: deterministic pseudo-variation, exactly reproducible in SQL
    size = 4096 + ((ti * 7919 + fi * 104729) % 65536)
    return (topic, db, coll, name, fi, total, size)


class _TopicPartition(InputPartition):
    def __init__(self, ti: int, db: str, coll: str, files: int):
        self.ti, self.db, self.coll, self.files = ti, db, coll, files


class SnapshotListingReader(DataSourceReader):
    def __init__(self, options):
        self.files_per_topic = int(options.get("files_per_topic", "100"))
        self.topic_filter: set[str] | None = None
        # per-query pushdown is OPT-IN: Spark 4.1's
        # PythonDataSourceV2.getOrCreateReadInfo caches the LAST planned
        # read (reader state included) on a shared relation and reuses it
        # for later FILTERLESS queries — a filtered scan would leave its
        # topic pruning behind and silently drop topics from the next
        # unfiltered query on the same registered view/DataFrame. Same
        # defense as sources/txlog_batch.py:TxlogBatchReader.
        self._per_query = (
            str(options.get("filter_pushdown", "false")).lower() == "true"
        )
        # cache-safe alternative: pruning as part of the VIEW definition
        fixed = options.get("topics")
        self._view_filter = set(fixed.split(",")) if fixed else None

    def pushFilters(self, filters: list[Filter]):
        """Accept topic equality/membership filters (under the
        ``filter_pushdown 'true'`` opt-in — see __init__); partition pruning
        happens in partitions(). Filters consumed here are NOT re-applied by
        Spark, which is exact because a topic partition emits only its own
        topic's rows. Everything else is returned → Spark re-applies it."""
        self.topic_filter = None  # reset: never accumulate across plans
        if not self._per_query:
            return filters
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("topic",):
                self.topic_filter = {f.value}
            elif isinstance(f, In) and f.attribute == ("topic",):
                self.topic_filter = set(f.value)
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        parts = []
        selected = self.topic_filter
        if self._view_filter is not None:
            selected = (
                self._view_filter if selected is None
                else selected & self._view_filter
            )
        for ti, (db, coll) in enumerate(TOPICS):
            if selected is not None and f"db.{db}.{coll}" not in selected:
                continue  # pruned at planning time — never listed
            parts.append(_TopicPartition(ti, db, coll, self.files_per_topic))
        return parts

    def read(self, part: _TopicPartition):
        for fi in range(part.files):
            yield _file_row(part.ti, part.db, part.coll, fi, part.files)


class _TopicRangePartition(InputPartition):
    def __init__(self, ti: int, db: str, coll: str, lo: int, hi: int, total: int):
        self.ti, self.db, self.coll = ti, db, coll
        self.lo, self.hi, self.total = lo, hi, total


class SnapshotListingStreamReader(DataSourceStreamReader):
    """The listing as a *streaming* source (Spark 4 Python DataSource
    streaming API): the offset is the per-run high-watermark of emitted file
    indices ({"emitted": n}), each trigger advances it to the current file
    universe (``files_per_topic``), and ``partitions(start, end)`` plans one
    executor-side partition per topic per offset range — the arrival-polling loop of the reference's
    continuous deployment (it re-runs the batch job as new exports land) as
    first-class source offsets, so the engine gets exactly-once via the
    checkpoint instead of re-listing and re-filtering.

    At 100 TB the offset would be the listing cursor (e.g. last-seen
    StartAfter key per prefix); partitions stay per-prefix so each
    micro-batch's listing is distributed and O(new files).

    The offset is monotone under the source contract: the file universe only
    grows (object stores don't un-list exports). A shrunk ``files_per_topic``
    across restarts yields empty batches (partitions() plans nothing for
    hi <= lo) rather than an error, and re-growth re-emits from the
    checkpointed high-watermark."""

    def __init__(self, options):
        self.files_per_topic = int(options.get("files_per_topic", "100"))

    def initialOffset(self):
        return {"emitted": 0}

    def latestOffset(self):
        # poll result: how far the file universe has grown. A committed
        # offset is never re-read: partitions() plans exactly [start, end),
        # so a restarted query resumes from the checkpointed watermark and
        # emits only files that arrived since.
        return {"emitted": self.files_per_topic}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["emitted"]), int(end["emitted"])
        if hi <= lo:
            return []
        return [
            _TopicRangePartition(ti, db, coll, lo, hi, self.files_per_topic)
            for ti, (db, coll) in enumerate(TOPICS)
        ]

    def read(self, part: _TopicRangePartition):
        for fi in range(part.lo, part.hi):
            yield _file_row(part.ti, part.db, part.coll, fi, part.total)

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up; the checkpoint owns progress

    def stop(self) -> None:
        pass


class SnapshotListingDataSource(DataSource):
    @classmethod
    def name(cls):
        return "snapshot_listing"

    def schema(self):
        return LISTING_SCHEMA

    def reader(self, schema: StructType):
        return SnapshotListingReader(self.options)

    def streamReader(self, schema: StructType):
        return SnapshotListingStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SnapshotListingDataSource)
    # DSv2 pushdown for Python sources is opt-in; without it a reader that
    # implements pushFilters fails analysis outright.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def oracle_listing_sql(files_per_topic: int = 100) -> str:
    """DuckDB SQL reproducing the source's full output exactly."""
    topic_rows = ", ".join(
        f"({ti}, '{db}', '{coll}')" for ti, (db, coll) in enumerate(TOPICS)
    )
    return f"""
    SELECT 'db.' || db || '.' || coll AS topic,
           db AS database,
           coll AS collection,
           'db.' || db || '.' || coll || '-' || lpad(CAST(fi AS VARCHAR), 3, '0')
             || '-' || lpad(CAST(fi + 1 AS VARCHAR), 3, '0')
             || '-' || lpad(CAST(fi AS VARCHAR), 6, '0') || '.txt.gz.enc' AS fileName,
           CAST(fi AS INT) AS file_no,
           CAST({files_per_topic} AS INT) AS total_files,
           CAST(4096 + ((ti * 7919 + fi * 104729) % 65536) AS BIGINT) AS size_bytes
    FROM (VALUES {topic_rows}) t(ti, db, coll),
         (SELECT UNNEST(generate_series(0, {files_per_topic - 1})) AS fi)
    """
