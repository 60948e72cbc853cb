"""SQL front-end for txlog tables (sources/txlog_batch.py): USING txlog
views, time travel options, WHERE-driven file pruning, deletion vectors,
column mapping — all through plain spark.sql."""

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxTable
from snapshot_sender_spark.sources.txlog_batch import (
    TxlogBatchReader,
    register_sql_views,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tab"), partition_by=("g",))
    t.append(
        spark.range(0, 40).withColumn("g", (F.col("id") % 4).cast("int")).coalesce(1),
        ts=1.0,
    )
    return t


def test_sql_view_reads_latest_and_pinned_versions(spark, tmp_path, table):
    table.delete_where("id = 5", ts=2.0, mode="mor")
    table.append(
        spark.range(40, 50)
        .withColumn("g", (F.col("id") % 4).cast("int"))
        .withColumn("x", F.lit("new"))
        .coalesce(1),
        ts=3.0,
    )
    register_sql_views(
        spark, "tsql", table.path, pins={"v1": {"version": 1}, "t2": {"timestamp": 2.5}}
    )
    # latest: 49 rows (40 + 10 - 1 MOR-deleted), evolution column backfills
    got = spark.sql(
        "SELECT count(*) n, sum(id) s, count(x) nx FROM tsql"
    ).collect()[0]
    assert (got["n"], got["nx"]) == (49, 10)
    assert got["s"] == sum(range(50)) - 5
    # pinned v1: pre-delete, pre-evolution
    assert spark.sql("SELECT count(*) n FROM tsql_v1").collect()[0]["n"] == 40
    # timestamp pin lands on v2 (the MOR delete): 39 rows, no x column
    t2 = spark.sql("SELECT * FROM tsql_t2")
    assert "x" not in t2.columns and t2.count() == 39
    # the MOR-deleted row is invisible through SQL
    assert spark.sql("SELECT * FROM tsql WHERE id = 5").count() == 0


def test_sql_where_prunes_partition_directories(spark, table):
    """A WHERE on the hive partition column reaches pushFilters (under the
    filter_pushdown opt-in — see TxlogBatchReader for the Spark 4.1
    getOrCreateReadInfo staleness this guards) and eliminates whole
    directories at PLANNING: 4 files -> 1 planned input partition, while
    results stay exact (Spark re-applies every filter)."""
    register_sql_views(
        spark, "tprune", table.path, options={"filter_pushdown": "true"}
    )
    assert len(table.snapshot().live_paths()) == 4
    assert spark.sql("SELECT * FROM tprune").rdd.getNumPartitions() == 4
    q = spark.sql("SELECT * FROM tprune WHERE g = 2")
    assert q.rdd.getNumPartitions() == 1  # directory-level elimination
    assert sorted(r["id"] for r in q.collect()) == [i for i in range(40) if i % 4 == 2]


def test_sql_where_prunes_on_footer_stats(spark, tmp_path):
    """Range predicates prune on parquet footer min/max: a range-clustered
    table plans only the files whose stats overlap the WHERE interval."""
    t = TxTable(spark, str(tmp_path / "stats_tab"))
    t.append(spark.range(0, 1000).repartitionByRange(8, "id"), ts=1.0)
    register_sql_views(spark, "tstats", t.path, options={"filter_pushdown": "true"})
    assert spark.sql("SELECT * FROM tstats").rdd.getNumPartitions() == 8
    q = spark.sql("SELECT * FROM tstats WHERE id >= 950")
    assert q.rdd.getNumPartitions() == 1
    assert q.count() == 50
    q2 = spark.sql("SELECT * FROM tstats WHERE id BETWEEN 200 AND 300")
    assert q2.rdd.getNumPartitions() <= 2
    assert q2.count() == 101


def test_sql_view_prune_option_is_cache_safe_pruning(spark, table):
    """The ``prune`` pin: file pruning as part of the VIEW identity —
    immutable per relation, so the Spark 4.1 read-info cache can never
    serve a stale plan, no opt-in needed. NOTE: prune is an I/O bound
    (files that cannot match are skipped), not a row filter — pair it with
    the WHERE for row exactness."""
    register_sql_views(
        spark, "tpin", table.path, pins={"g2": {"prune": '[["g", 2, 2]]'}}
    )
    assert spark.sql("SELECT * FROM tpin_g2").rdd.getNumPartitions() == 1
    assert spark.sql("SELECT * FROM tpin_g2 WHERE g = 2").count() == 10
    # the unpinned view on the same table still reads everything
    assert spark.sql("SELECT count(*) n FROM tpin").collect()[0]["n"] == 40


def test_reader_pushfilter_unit_ladder(spark, tmp_path):
    """pushFilters folds comparisons into prune ranges and RETURNS every
    filter (Spark re-applies them all — pruning is planning-only)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThanOrEqual

    import json as _json

    t = TxTable(spark, str(tmp_path / "unit_tab"))
    t.append(spark.range(0, 100).repartitionByRange(4, "id"), ts=1.0)
    schema_json = _json.dumps(t.snapshot().schema().jsonValue())
    reader = TxlogBatchReader({"path": t.path, "filter_pushdown": "true"}, schema_json)
    filters = [
        GreaterThan(("id",), 80),
        LessThanOrEqual(("id",), 95),
        EqualTo(("nope", "nested"), 1),  # nested: ignored for pruning
    ]
    assert reader.pushFilters(filters) == filters  # ALL returned
    assert len(reader.partitions()) == 1
    # a later push RESETS the fold (state never accumulates across plans)
    assert reader.pushFilters([]) == []
    assert len(reader.partitions()) == 4
    r2 = TxlogBatchReader({"path": t.path, "filter_pushdown": "true"}, schema_json)
    r2.pushFilters([In(("id",), (3, 7, 11))])
    assert len(r2.partitions()) == 1  # closed hull [3, 11]
    # DEFAULT (safe) mode: pushFilters records nothing, returns everything
    r3 = TxlogBatchReader({"path": t.path}, schema_json)
    assert r3.pushFilters(filters) == filters
    assert len(r3.partitions()) == 4


def test_sql_view_applies_column_mapping_and_sidecar_dvs(spark, tmp_path):
    """Renamed columns (column mapping) and sidecar deletion vectors both
    apply through the SQL surface."""
    t = TxTable(spark, str(tmp_path / "map_tab"))
    t.MOR_MAX_INLINE_DV = 5
    t.append(spark.range(0, 60).withColumn("v", F.col("id") * 2).coalesce(1), ts=1.0)
    t.rename_column("v", "val", ts=2.0)
    t.delete_where("id % 3 = 0", ts=3.0, mode="mor")  # 20 rows -> sidecar
    register_sql_views(spark, "tmap", t.path)
    got = spark.sql("SELECT count(*) n, sum(val) s FROM tmap").collect()[0]
    live = [i for i in range(60) if i % 3 != 0]
    assert got["n"] == len(live) and got["s"] == sum(2 * i for i in live)


def test_sql_join_txlog_with_parquet_table(spark, tmp_path, table):
    """The view participates in arbitrary SQL — here a join against a plain
    parquet-backed view (the interop a SQL user expects)."""
    dim = spark.createDataFrame(
        [(0, "even0"), (1, "odd1"), (2, "even2"), (3, "odd3")], "g int, label string"
    )
    dim.createOrReplaceTempView("gdim")
    register_sql_views(spark, "tjoin", table.path)
    got = spark.sql(
        """
        SELECT label, count(*) AS n FROM tjoin JOIN gdim USING (g)
        GROUP BY label ORDER BY label
        """
    ).collect()
    assert [(r["label"], r["n"]) for r in got] == [
        ("even0", 10), ("even2", 10), ("odd1", 10), ("odd3", 10),
    ]


def test_sql_describe_history_view(spark, tmp_path):
    """DESCRIBE HISTORY through SQL: <name>_history is a queryable view of
    the commit log with exact rows_removed accounting (same numbers as the
    Python history() API)."""
    t = TxTable(spark, str(tmp_path / "hist_tab"))
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    t.delete_where("id < 4", ts=2.0, mode="mor")
    t.compact(target_files=1, ts=3.0)
    register_sql_views(spark, "thist", t.path)
    got = spark.sql(
        "SELECT version, op, rows_added, rows_removed FROM thist_history "
        "ORDER BY version"
    ).collect()
    assert [(r["version"], r["op"], r["rows_added"], r["rows_removed"]) for r in got] == [
        (1, "append", 10, 0),
        (2, "delete", 0, 4),
        (3, "compact", 6, 6),
    ]
    # SQL over the audit surface: the takedown review's one-liner
    n = spark.sql(
        "SELECT sum(rows_removed) s FROM thist_history WHERE op = 'delete'"
    ).collect()[0]["s"]
    assert n == 4
    # parity with the Python API
    assert sorted(map(tuple, t.history().collect())) == sorted(
        map(tuple, spark.sql("SELECT * FROM thist_history").collect())
    )


def test_sql_describe_detail_view(spark, tmp_path):
    """DESCRIBE DETAIL through SQL: the one-row control-plane summary."""
    t = TxTable(spark, str(tmp_path / "det_tab"), partition_by=("g",))
    t.MOR_MAX_INLINE_DV = 100
    t.append(
        spark.range(0, 30).withColumn("g", (F.col("id") % 3).cast("int")).coalesce(1),
        ts=1.0,
    )
    t.delete_where("id < 5", ts=2.0, mode="mor")
    register_sql_views(spark, "tdet", t.path)
    r = spark.sql("SELECT * FROM tdet_detail").collect()[0]
    assert r["version"] == 2 and r["num_rows"] == 25 and r["num_files"] == 3
    assert r["partition_by"] == ["g"] and r["dv_inline_rows"] == 5
    assert r["min_reader"] == 1 and r["schema_fields"] == ["id", "g"]
