"""SQL DML + maintenance dispatcher (sources/txlog_sql.py): DELETE FROM /
UPDATE / MERGE INTO / OPTIMIZE / VACUUM as SQL text routed to TxTable ops
with the full conflict/constraint ladder, plus the native-scan SQL views
(round-12 verdict #1, #3, #6)."""

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxError, TxTable
from snapshot_sender_spark.sources.txlog_batch import register_sql_views
from snapshot_sender_spark.sources.txlog_sql import sql


def _mk(spark, tmp_path, name, n=20):
    t = TxTable(spark, str(tmp_path / name))
    t.append(
        spark.range(0, n)
        .withColumn("v", F.col("id") * 10)
        .withColumn("g", (F.col("id") % 4).cast("int"))
        .coalesce(2),
        ts=1.0,
    )
    return t


def test_delete_from_sql(spark, tmp_path):
    t = _mk(spark, tmp_path, "dml_del")
    register_sql_views(spark, "dml_del_tt", t.path)
    out = sql(spark, "DELETE FROM dml_del_tt WHERE id % 5 = 0").collect()[0]
    assert out["operation"] == "DELETE" and out["rows_deleted"] == 4
    assert t.read().where("id % 5 = 0").count() == 0
    assert t.read().count() == 16
    # NULL-predicate rows survive (SQL DELETE semantics through the text path)
    sql(spark, "DELETE FROM dml_del_tt WHERE CASE WHEN id < 8 THEN NULL ELSE id > 15 END")
    assert sorted(r["id"] for r in t.read().collect()) == [
        1, 2, 3, 4, 6, 7, 8, 9, 11, 12, 13, 14
    ]
    # time travel still sees the pre-delete snapshot
    assert t.read(version=1).count() == 20


def test_update_sql_cow_and_mor(spark, tmp_path):
    t = _mk(spark, tmp_path, "dml_upd")
    register_sql_views(spark, "dml_upd_tt", t.path)
    out = sql(
        spark,
        "UPDATE dml_upd_tt SET v = v + 1, g = CAST(9 AS INT) WHERE id < 3",
    ).collect()[0]
    assert out["operation"] == "UPDATE"
    got = {r["id"]: (r["v"], r["g"]) for r in t.read().collect()}
    assert got[0] == (1, 9) and got[1] == (11, 9) and got[2] == (21, 9)
    assert got[3] == (30, 3)  # untouched
    # all RHS see the OLD row: swap-style update is exact
    t2 = TxTable(spark, str(tmp_path / "dml_swap"))
    t2.append(
        spark.range(0, 4).withColumn("a", F.col("id")).withColumn(
            "b", F.col("id") * 100
        ).coalesce(1),
        ts=1.0,
    )
    register_sql_views(spark, "dml_swap_tt", t2.path)
    sql(spark, "UPDATE dml_swap_tt SET a = b, b = a")
    for r in t2.read().collect():
        assert r["a"] == r["id"] * 100 and r["b"] == r["id"]
    # merge-on-read mode: same answer, zero files rewritten
    t3 = _mk(spark, tmp_path, "dml_upd_mor")
    register_sql_views(spark, "dml_mor_tt", t3.path)
    files_before = set(t3.snapshot().files)
    sql(spark, "UPDATE dml_mor_tt SET v = -1 WHERE id >= 18", mode="mor")
    assert files_before <= set(t3.snapshot().files)  # originals kept, DV'd
    assert t3.read().where("v = -1").count() == 2
    assert t3.read().count() == 20


def test_update_where_constraint_and_unknown_column(spark, tmp_path):
    t = _mk(spark, tmp_path, "dml_upd_cons")
    t.set_constraint("v_pos", "v >= 0", ts=2.0)
    register_sql_views(spark, "dml_cons_tt", t.path)
    with pytest.raises(TxError, match="constraint violation"):
        sql(spark, "UPDATE dml_cons_tt SET v = -5 WHERE id = 1")
    assert t.read().where("v < 0").count() == 0
    with pytest.raises(TxError, match="unknown column"):
        sql(spark, "UPDATE dml_cons_tt SET nope = 1 WHERE id = 1")


def test_merge_into_sql(spark, tmp_path):
    t = _mk(spark, tmp_path, "dml_mrg", n=10)
    register_sql_views(spark, "dml_mrg_tt", t.path)
    spark.range(8, 14).withColumn("v", F.lit(-7).cast("long")).withColumn(
        "g", F.lit(0).cast("int")
    ).createOrReplaceTempView("dml_mrg_src")
    out = sql(
        spark,
        "MERGE INTO dml_mrg_tt USING dml_mrg_src "
        "ON dml_mrg_tt.id = dml_mrg_src.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    ).collect()[0]
    assert out["operation"] == "MERGE"
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert len(got) == 14
    assert got[7] == 70 and got[8] == -7 and got[13] == -7
    # subquery source + aliases
    sql(
        spark,
        "MERGE INTO dml_mrg_tt AS tg USING "
        "(SELECT id, CAST(id AS LONG) AS v, CAST(1 AS INT) AS g "
        " FROM range(13, 16)) AS s "
        "ON tg.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert len(got) == 16 and got[13] == 13 and got[15] == 15
    # unsupported ladders refuse loudly, never mis-execute
    with pytest.raises(TxError, match="unsupported MERGE"):
        sql(
            spark,
            "MERGE INTO dml_mrg_tt USING dml_mrg_src ON dml_mrg_tt.id = "
            "dml_mrg_src.id WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(TxError, match="equi-conjunction|differently-named"):
        sql(
            spark,
            "MERGE INTO dml_mrg_tt USING dml_mrg_src ON dml_mrg_tt.id = "
            "dml_mrg_src.v WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )


def test_optimize_and_vacuum_sql(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "dml_opt"))
    for i in range(4):  # four small commits -> four small files
        t.append(spark.range(i * 10, (i + 1) * 10).coalesce(1), ts=float(i + 1))
    register_sql_views(spark, "dml_opt_tt", t.path)
    out = sql(spark, "OPTIMIZE dml_opt_tt").collect()[0]
    assert out["operation"] == "OPTIMIZE"
    assert out["files_before"] == 4 and out["files_after"] < 4
    assert t.read().count() == 40  # data equivalent
    # dry run reports the would-delete list without deleting
    dry = sql(
        spark, "VACUUM dml_opt_tt RETAIN 1 VERSIONS OLDER THAN 0 SECONDS DRY RUN"
    )
    dry_paths = sorted(r["path"] for r in dry.collect())
    assert dry_paths  # the four pre-compaction files are unreachable
    assert all(os.path.exists(os.path.join(t.path, p)) for p in dry_paths)
    # real vacuum deletes exactly that list
    gone = sql(spark, "VACUUM dml_opt_tt RETAIN 1 VERSIONS OLDER THAN 0 SECONDS")
    assert sorted(r["path"] for r in gone.collect()) == dry_paths
    assert not any(os.path.exists(os.path.join(t.path, p)) for p in dry_paths)
    assert t.read().count() == 40
    # OPTIMIZE with explicit size + clustering parses and commits
    t.append(spark.range(40, 60).coalesce(1), ts=9.0)
    out2 = sql(
        spark, "OPTIMIZE dml_opt_tt FILE SIZE 134217728 CLUSTER BY id"
    ).collect()[0]
    assert out2["files_after"] <= out2["files_before"]
    assert t.read().count() == 60


def test_dml_refuses_pinned_views_and_unknown(spark, tmp_path):
    t = _mk(spark, tmp_path, "dml_pin")
    register_sql_views(
        spark, "dml_pin_tt", t.path,
        pins={"v1": {"version": 1}, "low": {"prune": '[["id", 0, 5]]'}},
    )
    with pytest.raises(TxError, match="pinned"):
        sql(spark, "DELETE FROM dml_pin_tt_v1 WHERE id = 1")
    with pytest.raises(TxError, match="pinned"):
        sql(spark, "UPDATE dml_pin_tt_low SET v = 0 WHERE id = 1")
    with pytest.raises(TxError, match="not a registered txlog view"):
        sql(spark, "DELETE FROM never_registered WHERE id = 1")
    # non-DML statements pass through to spark.sql verbatim
    assert sql(spark, "SELECT count(*) AS n FROM dml_pin_tt").collect()[0]["n"] == 20


def test_native_views_identical_results_and_refresh_contract(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "nat_tab"), partition_by=("g",))
    t.append(
        spark.range(0, 30)
        .withColumn("v", F.col("id") * 3)
        .withColumn("g", (F.col("id") % 3).cast("int"))
        .coalesce(2),
        ts=1.0,
    )
    t.delete_where("id % 7 = 0", ts=2.0, mode="mor")  # DVs must apply natively
    register_sql_views(spark, "nat_src", t.path)
    register_sql_views(
        spark, "nat_jvm", t.path, native=True, pins={"v1": {"version": 1}}
    )
    a = spark.sql("SELECT * FROM nat_src ORDER BY id").collect()
    b = spark.sql("SELECT * FROM nat_jvm ORDER BY id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert spark.sql("SELECT count(*) n FROM nat_jvm_v1").collect()[0]["n"] == 30
    # the native scan is Spark's JVM parquet reader: no Python eval in plan
    plan = (
        spark.sql("SELECT * FROM nat_jvm")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan parquet" in plan
    assert "PythonDataSource" not in plan and "BatchEvalPython" not in plan
    # refresh contract: a native view pins its snapshot at registration
    # (the MOR delete left 25 live rows: 30 minus ids 0,7,14,21,28)...
    sql(spark, "DELETE FROM nat_jvm WHERE id = 1")  # DML works via the registry
    assert spark.sql("SELECT count(*) n FROM nat_jvm").collect()[0]["n"] == 25
    # ...and one re-register call advances it past the delete
    register_sql_views(spark, "nat_jvm", t.path, native=True)
    assert spark.sql("SELECT count(*) n FROM nat_jvm").collect()[0]["n"] == 24
    # INSERT in native mode goes through the source-backed __ins view
    spark.sql(
        "INSERT INTO nat_jvm__ins SELECT id, id * 3 AS v, CAST(id % 3 AS INT) g "
        "FROM range(30, 33)"
    )
    register_sql_views(spark, "nat_jvm", t.path, native=True)
    assert spark.sql("SELECT count(*) n FROM nat_jvm").collect()[0]["n"] == 27
