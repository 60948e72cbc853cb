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
    # WHEN MATCHED THEN DELETE: one merge-on-read DV commit removes the
    # matched keys (the takedown-list shape), zero files rewritten
    files_before = set(t.snapshot().files)
    sql(
        spark,
        "MERGE INTO dml_mrg_tt USING (SELECT id FROM range(14, 99)) AS s "
        "ON dml_mrg_tt.id = s.id WHEN MATCHED THEN DELETE",
        mode="mor",
    )
    assert sorted(r["id"] for r in t.read().collect()) == list(range(14))
    assert files_before <= set(t.snapshot().files)  # DV'd, not rewritten
    # default mode (cow) rewrites the hit files instead — no deletion
    # vectors, no protocol bump
    sql(
        spark,
        "MERGE INTO dml_mrg_tt USING (SELECT id FROM range(12, 14)) AS s "
        "ON dml_mrg_tt.id = s.id WHEN MATCHED THEN DELETE",
    )
    assert sorted(r["id"] for r in t.read().collect()) == list(range(12))
    assert t.snapshot().proto == (1, 1)
    # a no-match delete commits nothing
    v = t.latest_version()
    sql(
        spark,
        "MERGE INTO dml_mrg_tt USING (SELECT id FROM range(500, 510)) AS s "
        "ON dml_mrg_tt.id = s.id WHEN MATCHED THEN DELETE",
    )
    assert t.latest_version() == v
    # richer ladders now route to merge_clauses (round-13); a qualifier
    # that names no declared alias still refuses loudly
    with pytest.raises(TxError, match="unknown qualifier"):
        sql(
            spark,
            "MERGE INTO dml_mrg_tt USING dml_mrg_src ON dml_mrg_tt.id = "
            "dml_mrg_src.id WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)",
        )
    # genuinely unsupported clause shapes still refuse loudly
    with pytest.raises(TxError, match="supports UPDATE SET"):
        sql(
            spark,
            "MERGE INTO dml_mrg_tt USING dml_mrg_src AS s ON dml_mrg_tt.id = "
            "s.id WHEN MATCHED THEN UPSERT EVERYTHING",
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
    # refresh contract: a native view pins its snapshot at registration —
    # OUTSIDE mutations (Python API) stay invisible until re-register...
    # (the MOR delete left 25 live rows: 30 minus ids 0,7,14,21,28)
    t.delete_where("id = 2", ts=3.0)
    assert spark.sql("SELECT count(*) n FROM nat_jvm").collect()[0]["n"] == 25
    register_sql_views(spark, "nat_jvm", t.path, native=True)
    assert spark.sql("SELECT count(*) n FROM nat_jvm").collect()[0]["n"] == 24
    # ...but DISPATCHER mutations auto-refresh the live native view
    sql(spark, "DELETE FROM nat_jvm WHERE id = 1")
    assert spark.sql("SELECT count(*) n FROM nat_jvm").collect()[0]["n"] == 23
    # INSERT on the native name transparently reroutes through the
    # source-backed __ins companion and refreshes
    sql(
        spark,
        "INSERT INTO nat_jvm SELECT id, id * 3 AS v, CAST(id % 3 AS INT) g "
        "FROM range(30, 33)",
    )
    assert spark.sql("SELECT count(*) n FROM nat_jvm").collect()[0]["n"] == 26


def test_update_where_moves_rows_across_partitions(spark, tmp_path):
    """Assigning a PARTITION column relocates the updated rows' files under
    the new hive directory — in both physical modes."""
    for mode in ("cow", "mor"):
        t = TxTable(spark, str(tmp_path / f"upd_part_{mode}"), partition_by=("g",))
        t.append(
            spark.range(0, 12)
            .withColumn("g", (F.col("id") % 2).cast("int"))
            .coalesce(1),
            ts=1.0,
        )
        t.update_where({"g": "CAST(7 AS INT)"}, "id < 4", mode=mode)
        got = {r["id"]: r["g"] for r in t.read().collect()}
        assert all(got[i] == 7 for i in range(4))
        assert all(got[i] == i % 2 for i in range(4, 12))
        snap = t.snapshot()
        assert any(p.startswith("g=7/") for p in snap.live_paths())
        # partition pruning is exact on the moved rows
        pruned = t.candidate_files(prune=[("g", 7, 7)])
        assert 0 < len(pruned) < len(snap.live_paths())


def test_update_where_on_column_mapped_table(spark, tmp_path):
    """UPDATE through a rename: the logical name resolves via the column
    mapping, physical files keep their stable names."""
    t = TxTable(spark, str(tmp_path / "upd_map"))
    t.append(spark.range(0, 6).withColumn("val", F.col("id")).coalesce(1), ts=1.0)
    t.rename_column("val", "score", ts=2.0)
    t.update_where({"score": "score * 100"}, "id >= 4", ts=3.0)
    got = {r["id"]: r["score"] for r in t.read().collect()}
    assert got[3] == 3 and got[4] == 400 and got[5] == 500


def test_update_where_null_predicate_and_type_cast(spark, tmp_path):
    """Rows where the predicate is NULL stay untouched (SQL UPDATE
    semantics), and the RHS casts to the column's STORED type so the schema
    never drifts."""
    t = TxTable(spark, str(tmp_path / "upd_null"))
    t.append(
        spark.createDataFrame(
            [(0, 5), (1, None), (2, 20)], "id long, v int"
        ).coalesce(1),
        ts=1.0,
    )
    # v > 9 is NULL for the NULL row: only id=2 updates; RHS is a BIGINT
    # expression cast back to the stored INT
    t.update_where({"v": "id + 100"}, "v > 9", ts=2.0)
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {0: 5, 1: None, 2: 102}
    assert t.snapshot().schema()["v"].dataType.simpleString() == "int"
    # no-match update commits NOTHING (no new version)
    v = t.latest_version()
    assert t.update_where({"v": "0"}, "id > 99", ts=3.0) == v


def test_cdf_stream_reports_update_as_delete_plus_insert(spark, tmp_path):
    """A MOR update commit streams through the CDF source as row-exact
    delete(old)+insert(new) pairs — the same contract as merge/delete."""
    from snapshot_sender_spark.sources.txlog_stream import register

    register(spark)
    t = TxTable(spark, str(tmp_path / "upd_cdf"))
    t.append(spark.range(0, 8).withColumn("v", F.col("id")).coalesce(1), ts=1.0)
    t.update_where({"v": "v + 1000"}, "id >= 6", ts=2.0, mode="mor")
    out, ckpt = tmp_path / "cdf_out", tmp_path / "cdf_ckpt"
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path).option("read_changes", "true")
        .option("starting_version", "1")
        .load()
        .writeStream.format("parquet").option("path", str(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out)).where("_commit_version = 2")
    rows = sorted(
        (r["_change_type"], r["id"], r["v"]) for r in got.collect()
    )
    assert rows == [
        ("delete", 6, 6), ("delete", 7, 7),
        ("insert", 6, 1006), ("insert", 7, 1007),
    ]
    # batch row_changes agrees
    batch = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in t.row_changes(1, 2).collect()
    )
    assert batch == rows


def test_describe_history_and_detail_sql(spark, tmp_path):
    """DESCRIBE HISTORY / DETAIL as dispatcher statements — the audit
    surface without pre-registered _history/_detail views."""
    t = _mk(spark, tmp_path, "dml_desc")
    register_sql_views(spark, "dml_desc_tt", t.path)
    sql(spark, "DELETE FROM dml_desc_tt WHERE id = 0")
    hist = sql(spark, "DESCRIBE HISTORY dml_desc_tt").collect()
    assert [r["version"] for r in hist] == [1, 2]
    assert hist[-1]["op"] == "delete"
    det = sql(spark, "DESCRIBE DETAIL dml_desc_tt").collect()[0]
    assert det["version"] == 2 and det["num_rows"] == 19


def test_nondeterministic_dml_predicates_refuse(spark, tmp_path):
    """A DML predicate is evaluated by more than one scan per commit —
    rand()/uuid() (however nested) and per-query time functions refuse
    typed instead of silently losing/duplicating rows."""
    t = _mk(spark, tmp_path, "dml_nondet")
    for bad in (
        "rand() < 0.5",
        "CASE WHEN id > 1 THEN rand() ELSE 0 END < 0.5",
        "uuid() = 'x'",
        "current_timestamp() > timestamp'2020-01-01'",
    ):
        with pytest.raises(TxError, match="non-determin|fixed per query"):
            t.delete_where(bad)
        with pytest.raises(TxError, match="non-determin|fixed per query"):
            t.update_where({"v": "0"}, bad, mode="mor")
    assert t.read().count() == 20  # nothing committed
    # deterministic predicates still pass, and assignment RHS is free
    t.update_where({"v": "id"}, "id < 2", ts=2.0)
    assert t.read().where("v = id").count() >= 2


def test_update_where_in_string_literal_and_subquery(spark, tmp_path):
    """The SET/WHERE split is quote- and paren-aware: WHERE inside a string
    literal or a scalar subquery stays in the SET clause."""
    t = TxTable(spark, str(tmp_path / "dml_wsplit"))
    t.append(
        spark.range(0, 4).withColumn("note", F.lit("orig")).coalesce(1), ts=1.0
    )
    register_sql_views(spark, "dml_wsplit_tt", t.path)
    sql(spark, "UPDATE dml_wsplit_tt SET note = 'x WHERE y' WHERE id = 1")
    got = {r["id"]: r["note"] for r in t.read().collect()}
    assert got == {0: "orig", 1: "x WHERE y", 2: "orig", 3: "orig"}
    # subquery RHS with its own WHERE
    spark.range(90, 95).createOrReplaceTempView("dml_wsplit_src")
    sql(
        spark,
        "UPDATE dml_wsplit_tt SET note = CAST((SELECT max(id) FROM "
        "dml_wsplit_src WHERE id < 93) AS STRING) WHERE id = 0",
    )
    assert {r["id"]: r["note"] for r in t.read().collect()}[0] == "92"
    # an UPDATE with no WHERE still hits every row
    sql(spark, "UPDATE dml_wsplit_tt SET note = 'all'")
    assert t.read().where("note = 'all'").count() == 4


def test_registry_is_case_insensitive_and_session_checked(spark, tmp_path):
    """Spark SQL identifiers are case-insensitive — so is the DML registry;
    and a registered name whose temp view was DROPPED refuses instead of
    mutating a table with no live SQL surface."""
    t = _mk(spark, tmp_path, "dml_case")
    register_sql_views(spark, "DML_Case_TT", t.path)
    sql(spark, "DELETE FROM dml_case_tt WHERE id = 0")  # lower-case works
    assert t.read().count() == 19
    sql(spark, "DELETE FROM DML_CASE_TT WHERE id = 1")  # upper-case works
    assert t.read().count() == 18
    spark.catalog.dropTempView("dml_case_tt")
    with pytest.raises(TxError, match="does not exist in this session"):
        sql(spark, "DELETE FROM dml_case_tt WHERE id = 2")
    assert t.read().count() == 18  # table untouched


def test_concurrent_stats_exclude_gates_retrying_append(spark, tmp_path):
    """A stats_exclude declared while an append is staging must strip the
    newly-sensitive column's stats from the retried commit (the revalidate
    re-pop; round-13 review finding)."""
    import json as _json

    path = str(tmp_path / "sx_race")
    t1 = TxTable(spark, path)
    t1.append(
        spark.range(0, 3).withColumn("body", F.lit("seed")).coalesce(1), ts=1.0
    )

    # t2 stages with NO exclusion known, then t1 (exclusion-configured)
    # commits first — t2's blind-append retry must re-pop
    t2 = TxTable(spark, path)
    orig_commit = TxTable._commit
    raced = {"done": False}

    def racing_commit(self, *args, **kwargs):
        if self is t2 and not raced["done"]:
            raced["done"] = True
            t_x = TxTable(spark, path, stats_exclude=("body",))
            t_x.append(
                spark.range(3, 5).withColumn("body", F.lit("sensitive-A"))
                .coalesce(1),
                ts=2.0,
            )
        return orig_commit(self, *args, **kwargs)

    TxTable._commit = racing_commit
    try:
        t2.append(
            spark.range(5, 8).withColumn("body", F.lit("sensitive-B")).coalesce(1),
            ts=3.0,
        )
    finally:
        TxTable._commit = orig_commit
    snap = TxTable(spark, path).snapshot()
    assert snap.stats_exclude == ("body",)
    assert snap.total_rows() == 8
    # v3's add actions (t2's retried commit) carry NO body stats
    v3 = [a for a in t1._read_version_actions(3) if "add" in a]
    assert v3 and all("body" not in a["add"]["stats"] for a in v3)
    # and no version file leaks the sensitive strings via stats
    import glob as _glob

    for vf in _glob.glob(os.path.join(path, "_txlog", "v*.json")):
        meta0 = _json.loads(open(vf).readline())
        if meta0.get("meta", {}).get("ts") == 3.0:
            assert "sensitive-B" not in open(vf).read()


# -- generalized MERGE WHEN ladders (round-13: TxTable.merge_clauses) ----------


def _ladder_fixture(spark, tmp_path, name):
    t = TxTable(spark, str(tmp_path / name))
    t.append(
        spark.range(10).selectExpr("id AS k", "id * 10 AS v", "'old' AS tag")
        .coalesce(2),
        ts=1.0,
    )
    spark.range(5, 15).selectExpr("id AS k", "id * 100 AS nv")\
        .createOrReplaceTempView(f"{name}_src")
    return t


_LADDER = """
    MERGE INTO {t} AS tg USING {t}_src AS s
    ON tg.k = s.k
    WHEN MATCHED AND tg.k = 5 THEN DELETE
    WHEN MATCHED AND s.nv > 700 THEN UPDATE SET v = s.nv, tag = 'upd'
    WHEN NOT MATCHED AND nv >= 1200 THEN INSERT (k, v, tag) VALUES (k, nv, 'ins')
"""

_LADDER_EXPECT = sorted(
    [(i, i * 10, "old") for i in range(5)]       # unmatched target rows
    + [(6, 60, "old"), (7, 70, "old")]           # matched, no applicable clause
    + [(8, 800, "upd"), (9, 900, "upd")]         # conditional update
    + [(12, 1200, "ins"), (13, 1300, "ins"), (14, 1400, "ins")]  # cond insert
)                                                 # 10,11: not matched, dropped


def test_merge_ladder_cow(spark, tmp_path):
    t = _ladder_fixture(spark, tmp_path, "lad_cow")
    register_sql_views(spark, "lad_cow", t.path)
    out = sql(spark, _LADDER.format(t="lad_cow")).collect()[0]
    assert out["operation"] == "MERGE" and out["version"] == 2
    assert sorted((r.k, r.v, r.tag) for r in t.read().collect()) == _LADDER_EXPECT
    # the dispatcher re-published the view: SQL readback agrees
    assert spark.sql("SELECT COUNT(*) AS c FROM lad_cow").collect()[0]["c"] == len(
        _LADDER_EXPECT
    )
    # row-exact CDF: delete 5, update 8/9 (old out, new in), inserts 12-14
    ch = sorted(
        (r["_change_type"], r["k"]) for r in t.row_changes(1, 2).collect()
    )
    assert ch == [
        ("delete", 5), ("delete", 8), ("delete", 9),
        ("insert", 8), ("insert", 9), ("insert", 12), ("insert", 13),
        ("insert", 14),
    ]


def test_merge_ladder_mor_zero_rewrites(spark, tmp_path):
    t = _ladder_fixture(spark, tmp_path, "lad_mor")
    register_sql_views(spark, "lad_mor", t.path)
    files_v1 = set(t.snapshot().files)
    sql(spark, _LADDER.format(t="lad_mor"), mode="mor")
    # merge-on-read: every original file still live (DVs, not rewrites)
    assert files_v1 <= set(t.snapshot().files)
    assert sorted((r.k, r.v, r.tag) for r in t.read().collect()) == _LADDER_EXPECT
    # and proto stays (1,1): the tiny vectors are inline
    assert t.snapshot().proto == (1, 1)


def test_merge_ladder_first_clause_wins(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "lad_ord"))
    t.append(spark.range(4).selectExpr("id AS k", "id AS v").coalesce(1), ts=1.0)
    spark.range(4).selectExpr("id AS k").createOrReplaceTempView("lad_ord_src")
    register_sql_views(spark, "lad_ord", t.path)
    # both clauses' conditions hold for k>=2; the FIRST must win
    sql(spark, """
        MERGE INTO lad_ord USING lad_ord_src AS s ON lad_ord.k = s.k
        WHEN MATCHED AND k >= 2 THEN UPDATE SET v = 100
        WHEN MATCHED AND k >= 0 THEN UPDATE SET v = 200
    """)
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {0: 200, 1: 200, 2: 100, 3: 100}


def test_merge_ladder_ambiguous_match_refuses(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "lad_amb"))
    t.append(spark.range(3).selectExpr("id AS k", "id AS v").coalesce(1), ts=1.0)
    spark.createDataFrame([(1, 10), (1, 20)], "k long, nv long")\
        .createOrReplaceTempView("lad_amb_src")
    register_sql_views(spark, "lad_amb", t.path)
    with pytest.raises(TxError, match="multiple source rows"):
        sql(spark, """
            MERGE INTO lad_amb USING lad_amb_src AS s ON lad_amb.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.nv
        """)
    # refusal is atomic: nothing committed
    assert t.latest_version() == 1


def test_merge_ladder_insert_missing_cols_null(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "lad_null"))
    t.append(
        spark.range(2).selectExpr("id AS k", "id AS v", "'x' AS tag").coalesce(1),
        ts=1.0,
    )
    spark.range(5, 7).selectExpr("id AS k").createOrReplaceTempView("lad_null_src")
    register_sql_views(spark, "lad_null", t.path)
    sql(spark, """
        MERGE INTO lad_null USING lad_null_src AS s ON lad_null.k = s.k
        WHEN NOT MATCHED THEN INSERT (k) VALUES (k)
    """)
    got = {r.k: (r.v, r.tag) for r in t.read().collect()}
    assert got[5] == (None, None) and got[6] == (None, None)
    assert got[0] == (0, "x")


def test_merge_ladder_nondeterministic_condition_refuses(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "lad_rand"))
    t.append(spark.range(3).selectExpr("id AS k", "id AS v").coalesce(1), ts=1.0)
    spark.range(3).selectExpr("id AS k").createOrReplaceTempView("lad_rand_src")
    register_sql_views(spark, "lad_rand", t.path)
    with pytest.raises(TxError, match="non-deterministic"):
        sql(spark, """
            MERGE INTO lad_rand USING lad_rand_src AS s ON lad_rand.k = s.k
            WHEN MATCHED AND rand() < 0.5 THEN DELETE
        """)


def test_merge_ladder_bad_qualifier_refuses(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "lad_qual"))
    t.append(spark.range(3).selectExpr("id AS k", "id AS v").coalesce(1), ts=1.0)
    spark.range(3).selectExpr("id AS k").createOrReplaceTempView("lad_qual_src")
    register_sql_views(spark, "lad_qual", t.path)
    with pytest.raises(TxError, match="unknown qualifier"):
        sql(spark, """
            MERGE INTO lad_qual USING lad_qual_src AS s ON lad_qual.k = s.k
            WHEN MATCHED AND zz.k = 1 THEN DELETE
        """)


def test_merge_not_matched_by_source(spark, tmp_path):
    """The sync-to-source shape: target rows absent from the source get
    flagged or deleted in the SAME atomic commit as the upsert."""
    t = TxTable(spark, str(tmp_path / "lad_nmbs"))
    t.append(
        spark.range(10).selectExpr("id AS k", "id * 10 AS v", "'live' AS st")
        .coalesce(2),
        ts=1.0,
    )
    # source keeps keys 0-5; 6,7 should be tombstoned, 8,9 hard-deleted
    spark.range(6).selectExpr("id AS k", "id * 10 AS nv")\
        .createOrReplaceTempView("lad_nmbs_src")
    register_sql_views(spark, "lad_nmbs", t.path)
    sql(spark, """
        MERGE INTO lad_nmbs AS tg USING lad_nmbs_src AS s ON tg.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv + 1
        WHEN NOT MATCHED BY SOURCE AND k < 8 THEN UPDATE SET st = 'gone'
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    """)
    got = {r.k: (r.v, r.st) for r in t.read().collect()}
    assert set(got) == set(range(8))  # 8,9 deleted
    for k in range(6):
        assert got[k] == (k * 10 + 1, "live")   # matched update
    for k in (6, 7):
        assert got[k] == (k * 10, "gone")       # by-source tombstone
    # one atomic commit for the whole ladder
    assert t.latest_version() == 2
    # row-exact CDF: updates as delete+insert, hard deletes as delete only
    ch = sorted((r["_change_type"], r["k"]) for r in t.row_changes(1, 2).collect())
    assert ch.count(("delete", 8)) == 1 and ("insert", 8) not in ch
    assert ("delete", 6) in ch and ("insert", 6) in ch


def test_merge_by_source_mor_and_refusals(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "lad_nmbs2"))
    t.append(spark.range(6).selectExpr("id AS k", "id AS v").coalesce(1), ts=1.0)
    spark.range(3).selectExpr("id AS k").createOrReplaceTempView("lad_nmbs2_src")
    register_sql_views(spark, "lad_nmbs2", t.path)
    files_v1 = set(t.snapshot().files)
    sql(spark, """
        MERGE INTO lad_nmbs2 USING lad_nmbs2_src AS s ON lad_nmbs2.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    """, mode="mor")
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2]
    assert files_v1 <= set(t.snapshot().files)  # DV'd, not rewritten
    # SET * is meaningless without a source row
    with pytest.raises(TxError, match="explicit SET"):
        sql(spark, """
            MERGE INTO lad_nmbs2 USING lad_nmbs2_src AS s ON lad_nmbs2.k = s.k
            WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *
        """)
    # source qualifiers are OUT OF SCOPE in a BY SOURCE clause
    with pytest.raises(TxError, match="unknown qualifier"):
        sql(spark, """
            MERGE INTO lad_nmbs2 USING lad_nmbs2_src AS s ON lad_nmbs2.k = s.k
            WHEN NOT MATCHED BY SOURCE AND s.k > 0 THEN DELETE
        """)


def test_merge_ladder_partitioned_relocation(spark, tmp_path):
    """Ladder MERGE on a hive-partitioned table: an UPDATE that reassigns
    the PARTITION column relocates the image into the right directory, in
    the same atomic commit as deletes and inserts."""
    t = TxTable(spark, str(tmp_path / "lad_part"), partition_by=("g",))
    t.append(
        spark.range(12).selectExpr("id AS k", "CAST(id % 3 AS INT) AS g"),
        ts=1.0,
    )
    spark.range(8, 16).selectExpr("id AS k").createOrReplaceTempView(
        "lad_part_src"
    )
    register_sql_views(spark, "lad_part", t.path)
    sql(spark, """
        MERGE INTO lad_part USING lad_part_src AS s ON lad_part.k = s.k
        WHEN MATCHED AND k = 8 THEN DELETE
        WHEN MATCHED THEN UPDATE SET g = CAST(9 AS INT)
        WHEN NOT MATCHED THEN INSERT (k, g) VALUES (k, CAST(7 AS INT))
    """)
    got = {r.k: r.g for r in t.read().collect()}
    assert 8 not in got
    for k in (9, 10, 11):
        assert got[k] == 9  # relocated into g=9
    for k in (12, 13, 14, 15):
        assert got[k] == 7  # inserted into g=7
    for k in range(8):
        assert got[k] == k % 3  # untouched
    # the relocated/inserted rows live under the RIGHT hive directories
    snap = t.snapshot()
    dirs = {p.split("/")[0] for p in snap.live_paths() if "/" in p}
    assert {"g=7", "g=9"} <= dirs
    # partition pruning stays exact after the relocation
    kept = t.candidate_files(prune=[("g", 9, 9)])
    assert kept and all("g=9" in p for p in kept)


def test_merge_ladder_under_column_mapping(spark, tmp_path):
    """Ladder MERGE after RENAME COLUMN: logical names in clauses resolve
    through the column mapping (files keep physical names; zero rewrites
    beyond the hit files)."""
    t = TxTable(spark, str(tmp_path / "lad_map"))
    t.append(spark.range(6).selectExpr("id AS k", "id * 10 AS v").coalesce(1), ts=1.0)
    t.rename_column("v", "val")
    spark.range(3, 9).selectExpr("id AS k", "id * 100 AS nv")\
        .createOrReplaceTempView("lad_map_src")
    register_sql_views(spark, "lad_map", t.path)
    sql(spark, """
        MERGE INTO lad_map USING lad_map_src AS s ON lad_map.k = s.k
        WHEN MATCHED THEN UPDATE SET val = s.nv
        WHEN NOT MATCHED THEN INSERT (k, val) VALUES (k, nv)
    """)
    got = {r.k: r.val for r in t.read().collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 300, 4: 400, 5: 500,
                   6: 600, 7: 700, 8: 800}
    # the mapping still routes the logical name to the original physical
    assert t.snapshot().mapping.get("val") == "v"
