"""Round-13 SQL lifecycle completion (sources/txlog_sql.py): DDL (ALTER
TABLE RENAME/ADD/DROP COLUMN, ADD/DROP CONSTRAINT, SET TBLPROPERTIES),
SHOW TBLPROPERTIES, RESTORE TABLE, CREATE TABLE ... USING TXLOG ... AS
SELECT (CTAS + auto-register), the ``table_changes()`` CDF rewrite, and the
view-freshness fix: Spark 4.1 caches a Python DataSource view's planned
reader (file list included) on the relation after its FIRST query plan, so
every dispatcher mutation now RE-PUBLISHES the live view — source mode too,
not just native."""

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxError, TxTable
from snapshot_sender_spark.sources.txlog_batch import register_sql_views
from snapshot_sender_spark.sources.txlog_sql import sql


def _ctas(spark, tmp_path, name, n=20):
    sql(
        spark,
        f"CREATE TABLE {name} USING TXLOG LOCATION '{tmp_path / name}' AS "
        f"SELECT id AS k, id * 10 AS v, CAST(id % 4 AS INT) AS g "
        f"FROM range({n})",
    )
    return TxTable(spark, str(tmp_path / name))


# -- CTAS ---------------------------------------------------------------------


def test_ctas_creates_and_registers(spark, tmp_path):
    out = sql(
        spark,
        f"CREATE TABLE ddl_ctas USING TXLOG LOCATION '{tmp_path / 'c'}' AS "
        "SELECT id AS k, id * 2 AS v FROM range(50)",
    ).collect()[0]
    assert out["operation"] == "CREATE TABLE AS SELECT"
    assert out["version"] == 1 and out["rows"] == 50
    # live view, history and detail companions all registered
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_ctas").collect()[0]["c"] == 50
    assert spark.sql("SELECT * FROM ddl_ctas_history").count() == 1
    # and the table is immediately mutable through the dispatcher
    sql(spark, "DELETE FROM ddl_ctas WHERE k >= 40")
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_ctas").collect()[0]["c"] == 40


def test_ctas_partitioned(spark, tmp_path):
    sql(
        spark,
        f"CREATE TABLE ddl_ctas_p USING TXLOG LOCATION '{tmp_path / 'p'}' "
        "PARTITIONED BY (g) AS "
        "SELECT id AS k, CAST(id % 3 AS INT) AS g FROM range(30)",
    )
    t = TxTable(spark, str(tmp_path / "p"))
    assert t.snapshot().partition_by == ("g",)
    assert all("g=" in p for p in t.snapshot().live_paths())
    got = {
        (r["g"], r["n"])
        for r in spark.sql(
            "SELECT g, COUNT(*) AS n FROM ddl_ctas_p GROUP BY g"
        ).collect()
    }
    assert got == {(0, 10), (1, 10), (2, 10)}


def test_ctas_refuses_existing_table_and_name(spark, tmp_path):
    _ctas(spark, tmp_path, "ddl_ctas_dup")
    with pytest.raises(TxError, match="already a registered"):
        sql(
            spark,
            f"CREATE TABLE ddl_ctas_dup USING TXLOG LOCATION "
            f"'{tmp_path / 'other'}' AS SELECT 1 AS x",
        )
    with pytest.raises(TxError, match="already holds a txlog table"):
        sql(
            spark,
            f"CREATE TABLE ddl_ctas_dup2 USING TXLOG LOCATION "
            f"'{tmp_path / 'ddl_ctas_dup'}' AS SELECT 1 AS x",
        )
    # a CREATE ... USING TXLOG the grammar cannot place (no LOCATION)
    # refuses typed instead of falling through to spark.sql's unhelpful
    # analysis error
    with pytest.raises(TxError, match="unsupported CREATE TABLE form"):
        sql(spark, "CREATE TABLE ddl_ctas_e (k BIGINT) USING TXLOG")


# -- ALTER TABLE column DDL ----------------------------------------------------


def test_add_column_null_extends_everywhere(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_addc")
    out = sql(spark, "ALTER TABLE ddl_addc ADD COLUMN note STRING").collect()[0]
    assert out["operation"] == "ADD COLUMN"
    # metadata-only: zero new files
    assert len(t.snapshot().files) == len(t.snapshot(version=1).files)
    # NULL-extended on the DataFrame path AND the (re-published) SQL view
    assert t.read().where("note IS NULL").count() == 20
    assert (
        spark.sql("SELECT COUNT(*) AS c FROM ddl_addc WHERE note IS NULL")
        .collect()[0]["c"]
        == 20
    )
    # and the column is immediately writable through SQL
    sql(spark, "UPDATE ddl_addc SET note = 'x' WHERE k < 5")
    assert t.read().where("note = 'x'").count() == 5


def test_add_column_parses_complex_types(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_addt")
    sql(spark, "ALTER TABLE ddl_addt ADD COLUMN tags ARRAY<STRING>")
    sql(spark, "ALTER TABLE ddl_addt ADD COLUMN price DECIMAL(10,2)")
    kinds = {f.name: f.dataType.simpleString() for f in t.snapshot().schema().fields}
    assert kinds["tags"] == "array<string>"
    assert kinds["price"] == "decimal(10,2)"
    with pytest.raises(TxError, match="already exists"):
        sql(spark, "ALTER TABLE ddl_addt ADD COLUMN tags ARRAY<STRING>")
    with pytest.raises(TxError, match="cannot parse column type"):
        sql(spark, "ALTER TABLE ddl_addt ADD COLUMN bad NOT_A_TYPE")


def test_add_column_after_drop_never_resurrects(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_readd")
    sql(spark, "ALTER TABLE ddl_readd DROP COLUMN v")
    sql(spark, "ALTER TABLE ddl_readd ADD COLUMN v BIGINT")
    # the re-added logical 'v' maps to a FRESH physical: old bytes stay dead
    assert t.read().where("v IS NOT NULL").count() == 0
    assert t.snapshot().mapping["v"].startswith("v#")


def test_rename_and_drop_column_republish_view(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_ren")
    # PLAN the view first: the republish must beat Spark's read-info cache
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_ren").collect()[0]["c"] == 20
    sql(spark, "ALTER TABLE ddl_ren RENAME COLUMN v TO val")
    assert spark.table("ddl_ren").columns == ["k", "val", "g"]
    assert (
        spark.sql("SELECT CAST(SUM(val) AS BIGINT) AS s FROM ddl_ren")
        .collect()[0]["s"]
        == sum(i * 10 for i in range(20))
    )
    sql(spark, "ALTER TABLE ddl_ren DROP COLUMN g")
    assert spark.table("ddl_ren").columns == ["k", "val"]
    assert t.snapshot().retired == ("g",)
    with pytest.raises(TxError, match="unsupported ALTER TABLE action"):
        sql(spark, "ALTER TABLE ddl_ren REORDER COLUMNS (k, val)")


# -- constraints + properties through SQL ---------------------------------------


def test_add_drop_constraint_sql(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_cons")
    out = sql(
        spark, "ALTER TABLE ddl_cons ADD CONSTRAINT v_pos CHECK (v >= 0)"
    ).collect()[0]
    assert out["operation"] == "ADD CONSTRAINT"
    assert t.constraints() == {"v_pos": "v >= 0"}
    with pytest.raises(Exception, match="constraint"):
        sql(spark, "UPDATE ddl_cons SET v = -1 WHERE k = 3")
    # a constraint the EXISTING data violates is refused at ADD time
    with pytest.raises(TxError, match="existing rows violate"):
        sql(spark, "ALTER TABLE ddl_cons ADD CONSTRAINT v_big CHECK (v > 50)")
    sql(spark, "ALTER TABLE ddl_cons DROP CONSTRAINT v_pos")
    assert t.constraints() == {}
    sql(spark, "UPDATE ddl_cons SET v = -1 WHERE k = 3")  # now allowed
    with pytest.raises(TxError, match="no constraint"):
        sql(spark, "ALTER TABLE ddl_cons DROP CONSTRAINT v_pos")


def test_tblproperties_stats_exclude(spark, tmp_path):
    import json
    import os

    t = _ctas(spark, tmp_path, "ddl_prop")
    out = sql(
        spark,
        "ALTER TABLE ddl_prop SET TBLPROPERTIES ('stats_exclude' = 'v,g')",
    ).collect()[0]
    assert out["operation"] == "SET TBLPROPERTIES"
    assert t.snapshot().stats_exclude == ("g", "v")
    props = {
        r["key"]: r["value"]
        for r in sql(spark, "SHOW TBLPROPERTIES ddl_prop").collect()
    }
    assert props["stats_exclude"] == "g,v"
    assert props["min_reader"] == "1"
    # a subsequent SQL INSERT honors the persisted exclusion: no v/g stats
    # land in the new add actions
    spark.range(100, 105).selectExpr(
        "id AS k", "id * 10 AS v", "CAST(id % 4 AS INT) AS g"
    ).createOrReplaceTempView("ddl_prop_src")
    sql(spark, "INSERT INTO ddl_prop SELECT * FROM ddl_prop_src")
    log_dir = os.path.join(t.path, "_txlog")
    latest = max(
        f for f in os.listdir(log_dir) if f.startswith("v") and f.endswith(".json")
    )
    with open(os.path.join(log_dir, latest)) as fh:
        adds = [
            json.loads(line)["add"]
            for line in fh
            if '"add"' in line
        ]
    assert adds, "INSERT must add files"
    for a in adds:
        stats = a.get("stats", {})
        assert "v" not in stats and "g" not in stats
    with pytest.raises(TxError, match="unsupported table property"):
        sql(spark, "ALTER TABLE ddl_prop SET TBLPROPERTIES ('owner' = 'me')")


# -- RESTORE through SQL ---------------------------------------------------------


def test_restore_sql_version_and_timestamp(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_rst")
    # plan the view BEFORE mutating: restore must beat the read-info cache
    s0 = spark.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM ddl_rst").collect()[0]["s"]
    sql(spark, "DELETE FROM ddl_rst WHERE k % 2 = 0")
    out = sql(spark, "RESTORE TABLE ddl_rst TO VERSION AS OF 1").collect()[0]
    assert out["operation"] == "RESTORE" and out["restored_version"] == 1
    assert (
        spark.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM ddl_rst").collect()[0]["s"]
        == s0
    )
    # timestamp form: resolve the version whose commit ts <= the target
    t2 = TxTable(spark, str(tmp_path / "rst2"))
    t2.append(spark.range(10).withColumnRenamed("id", "k").coalesce(1), ts=100.0)
    t2.delete_where("k < 5", ts=200.0)
    register_sql_views(spark, "ddl_rst2", t2.path)
    sql(spark, "RESTORE TABLE ddl_rst2 TO TIMESTAMP AS OF 150")
    assert t2.read().count() == 10


# -- table_changes() CDF rewrite --------------------------------------------------


def test_table_changes_inclusive_bounds(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tc"))
    t.append(spark.range(0, 4).withColumnRenamed("id", "k").coalesce(1), ts=1.0)  # v1
    t.append(spark.range(4, 6).withColumnRenamed("id", "k").coalesce(1), ts=2.0)  # v2
    t.delete_where("k = 0", ts=3.0)  # v3
    register_sql_views(spark, "ddl_tc", t.path)
    rows = sql(
        spark,
        "SELECT _change_type, k FROM table_changes('ddl_tc', 2, 3) "
        "ORDER BY _change_type, k",
    ).collect()
    # versions 2..3 INCLUSIVE (Delta semantics): v2's inserts + v3's delete
    assert [(r["_change_type"], r["k"]) for r in rows] == [
        ("delete", 0), ("insert", 4), ("insert", 5),
    ]
    # default upper bound = latest version; composes inside a bigger SELECT
    n = sql(
        spark,
        "SELECT COUNT(*) AS n FROM table_changes('ddl_tc', 1) "
        "WHERE _change_type = 'insert'",
    ).collect()[0]["n"]
    assert n == 6
    with pytest.raises(TxError, match="not a registered txlog view"):
        sql(spark, "SELECT * FROM table_changes('nope', 1)")


# -- self-review hardening pins ----------------------------------------------------


def test_add_column_refuses_multi_column_spec(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_multi")
    # "INT, b INT" parses as TWO fields; adding only the first would
    # silently drop the rest of a multi-column attempt
    with pytest.raises(TxError, match="one column"):
        sql(spark, "ALTER TABLE ddl_multi ADD COLUMN a INT, b INT")
    assert [f.name for f in t.snapshot().schema().fields] == ["k", "v", "g"]


def test_stats_exclude_refuses_unknown_column(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_typo")
    # a TYPO'd exclusion would silently keep publishing the sensitive stats
    with pytest.raises(TxError, match="no such column"):
        sql(
            spark,
            "ALTER TABLE ddl_typo SET TBLPROPERTIES ('stats_exclude' = 'vv')",
        )
    assert t.snapshot().stats_exclude == ()


def test_insert_into_pinned_view_refuses(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_pin")
    register_sql_views(spark, "ddl_pin_t", t.path, pins={"v1": {"version": 1}})
    # the writer would append to the LIVE table while the reader keeps
    # serving the pin — a write the view never shows
    with pytest.raises(TxError, match="pinned"):
        sql(spark, "INSERT INTO ddl_pin_t_v1 VALUES (999, 999, 0)")
    assert t.read().where("k = 999").count() == 0


def test_table_changes_in_string_literal_passes_through(spark, tmp_path):
    t = _ctas(spark, tmp_path, "ddl_lit")
    sql(spark, "ALTER TABLE ddl_lit ADD COLUMN note STRING")
    # a literal MENTION of table_changes(...) with an unregistered name
    # must not be rewritten (and must not raise)
    sql(
        spark,
        "UPDATE ddl_lit SET note = 'see table_changes(''nope'', 1) docs' "
        "WHERE k = 0",
    )
    got = t.read().where("k = 0").collect()[0]["note"]
    assert got == "see table_changes('nope', 1) docs"
    # while a REAL call in the same statement still rewrites
    n = sql(
        spark,
        "SELECT COUNT(*) AS n FROM table_changes('ddl_lit', 1) "
        "WHERE _change_type = 'insert'",
    ).collect()[0]["n"]
    assert n >= 20


# -- view freshness after dispatcher mutations -------------------------------------


def test_planned_source_view_sees_dispatcher_writes(spark, tmp_path):
    """The round-13 freshness fix: Spark caches a Python DataSource view's
    planned reader on FIRST use; without the dispatcher's re-publish, every
    later query would serve the pre-mutation file list."""
    t = _ctas(spark, tmp_path, "ddl_fresh")
    # plan the view (populates Spark's read-info cache)
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_fresh").collect()[0]["c"] == 20
    sql(spark, "DELETE FROM ddl_fresh WHERE k >= 10")
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_fresh").collect()[0]["c"] == 10
    # INSERT INTO a source view refreshes too
    spark.range(100, 103).selectExpr(
        "id AS k", "id AS v", "CAST(0 AS INT) AS g"
    ).createOrReplaceTempView("ddl_fresh_src")
    sql(spark, "INSERT INTO ddl_fresh SELECT * FROM ddl_fresh_src")
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_fresh").collect()[0]["c"] == 13
    # the history companion refreshes with the live view
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_fresh_history").collect()[0][
        "c"
    ] == t.latest_version()


def test_stats_exclude_follows_rename(spark, tmp_path):
    """The exclusion tracks the LOGICAL name through RENAME COLUMN: with a
    fresh-physical column (drop + re-add), a stale logical name in the
    property would resolve to nothing and the sensitive stats would leak
    on the next write."""
    import json
    import os

    t = _ctas(spark, tmp_path, "ddl_renx")
    sql(spark, "ALTER TABLE ddl_renx DROP COLUMN v")
    sql(spark, "ALTER TABLE ddl_renx ADD COLUMN v BIGINT")  # fresh physical v#
    phys = t.snapshot().mapping["v"]
    assert phys.startswith("v#")
    sql(spark, "ALTER TABLE ddl_renx SET TBLPROPERTIES ('stats_exclude' = 'v')")
    sql(spark, "ALTER TABLE ddl_renx RENAME COLUMN v TO w")
    props = {
        r["key"]: r["value"]
        for r in sql(spark, "SHOW TBLPROPERTIES ddl_renx").collect()
    }
    assert props["stats_exclude"] == "w"
    # a write through the SQL path must still suppress the physical's stats
    spark.range(500, 505).selectExpr(
        "id AS k", "CAST(0 AS INT) AS g", "id AS w"
    ).createOrReplaceTempView("ddl_renx_src")
    sql(spark, "INSERT INTO ddl_renx SELECT * FROM ddl_renx_src")
    log_dir = os.path.join(t.path, "_txlog")
    latest = max(
        f for f in os.listdir(log_dir) if f.startswith("v") and f.endswith(".json")
    )
    adds = [
        json.loads(line)["add"]
        for line in open(os.path.join(log_dir, latest))
        if '"add"' in line
    ]
    assert adds
    for a in adds:
        assert phys not in a.get("stats", {})


# -- empty CREATE TABLE, CONVERT TO TXLOG, OPTIMIZE ZORDER BY -------------------


def test_create_empty_table_sql(spark, tmp_path):
    out = sql(
        spark,
        f"CREATE TABLE ddl_et (k BIGINT, v DOUBLE, g INT) USING TXLOG "
        f"LOCATION '{tmp_path / 'et'}'",
    ).collect()[0]
    assert out["operation"] == "CREATE TABLE" and out["rows"] == 0
    # an empty table SELECTs as zero rows with the declared schema (the
    # source returns an empty-sentinel partition — Spark hands read() None
    # when partitions() is [])
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_et").collect()[0]["c"] == 0
    assert spark.table("ddl_et").columns == ["k", "v", "g"]
    t = TxTable(spark, str(tmp_path / "et"))
    assert t.read().count() == 0
    # and the schema governs later writes
    spark.range(5).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id AS INT) AS g"
    ).createOrReplaceTempView("ddl_et_src")
    sql(spark, "INSERT INTO ddl_et SELECT * FROM ddl_et_src")
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_et").collect()[0]["c"] == 5
    # partitioned empty create fixes the spec before any data exists
    sql(
        spark,
        f"CREATE TABLE ddl_etp (k BIGINT, g INT) USING TXLOG "
        f"LOCATION '{tmp_path / 'etp'}' PARTITIONED BY (g)",
    )
    assert TxTable(spark, str(tmp_path / "etp")).snapshot().partition_by == ("g",)
    with pytest.raises(TxError, match="not in the schema"):
        sql(
            spark,
            f"CREATE TABLE ddl_etz (k BIGINT) USING TXLOG "
            f"LOCATION '{tmp_path / 'etz'}' PARTITIONED BY (zz)",
        )


def test_convert_flat_parquet(spark, tmp_path):
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").coalesce(3)\
        .write.parquet(str(tmp_path / "flat"))
    out = sql(
        spark, f"CONVERT TO TXLOG '{tmp_path / 'flat'}' AS ddl_cvt"
    ).collect()[0]
    assert out["operation"] == "CONVERT TO TXLOG"
    assert out["rows"] == 100 and out["files"] == 3
    t = TxTable(spark, str(tmp_path / "flat"))
    # zero rewrite: the adopted files ARE the original part files
    assert all(p.startswith("part-") for p in t.snapshot().live_paths())
    # footer stats adopted -> pruning works from the first query
    assert all(a["stats"] for a in t.snapshot().files.values())
    # immediately transactional: DML, time travel
    sql(spark, "DELETE FROM ddl_cvt WHERE k < 50")
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_cvt").collect()[0]["c"] == 50
    assert t.read(version=1).count() == 100
    with pytest.raises(TxError, match="already holds"):
        sql(spark, f"CONVERT TO TXLOG '{tmp_path / 'flat'}'")


def test_convert_hive_partitioned(spark, tmp_path):
    import os

    spark.range(60).selectExpr("id AS k", "CAST(id % 3 AS INT) AS g")\
        .write.partitionBy("g").parquet(str(tmp_path / "hive"))
    sql(spark, f"CONVERT TO TXLOG '{tmp_path / 'hive'}' AS ddl_cvh")
    t = TxTable(spark, str(tmp_path / "hive"))
    assert t.snapshot().partition_by == ("g",)  # inferred from the layout
    got = {
        (r["g"], r["n"])
        for r in spark.sql(
            "SELECT g, COUNT(*) AS n FROM ddl_cvh GROUP BY g"
        ).collect()
    }
    assert got == {(0, 20), (1, 20), (2, 20)}
    # partition pruning prunes adopted directories exactly
    kept = t.candidate_files(prune=[("g", 1, 1)])
    assert kept and all("g=1" in p for p in kept)
    # an explicit spec that contradicts the layout refuses
    spark.range(6).selectExpr("id AS k", "CAST(id AS INT) AS g")\
        .write.partitionBy("g").parquet(str(tmp_path / "hive2"))
    with pytest.raises(TxError, match="partitioned by"):
        sql(spark, f"CONVERT TO TXLOG '{tmp_path / 'hive2'}' PARTITIONED BY (zz)")
    # a non-hive subdirectory refuses (half-converted layouts are corrupt)
    os.makedirs(tmp_path / "bad" / "sub", exist_ok=True)
    spark.range(3).coalesce(1).write.parquet(str(tmp_path / "bad" / "sub" / "x"))
    with pytest.raises(TxError, match="non-hive"):
        sql(spark, f"CONVERT TO TXLOG '{tmp_path / 'bad'}'")


def test_optimize_zorder_by(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "zt"))
    t.append(
        spark.range(10000).selectExpr(
            "id AS x", "(id * 37) % 1000 AS y", "id AS payload"
        ).repartition(8),
        ts=1.0,
    )
    register_sql_views(spark, "ddl_zt", t.path)
    out = sql(spark, "OPTIMIZE ddl_zt FILE SIZE 20000 ZORDER BY (x, y)").collect()[0]
    assert out["operation"] == "OPTIMIZE"
    snap = t.snapshot()

    def overlaps(a, lo, hi, col):
        s = a["stats"].get(col)
        return s is None or not (int(s["max"]) < lo or int(s["min"]) > hi)

    # a 2-D box predicate prunes files in BOTH dimensions after z-ordering
    boxed = [
        p for p, a in snap.files.items()
        if overlaps(a, 0, 500, "x") and overlaps(a, 0, 100, "y")
    ]
    assert len(boxed) < len(snap.files)
    # data-equivalent
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_zt").collect()[0]["c"] == 10000
    with pytest.raises(TxError, match="not both"):
        sql(spark, "OPTIMIZE ddl_zt ZORDER BY (x, y) CLUSTER BY x")
    with pytest.raises(TxError, match="1-3 columns"):
        sql(spark, "OPTIMIZE ddl_zt ZORDER BY (x, y, payload, x)")


def test_drop_table_and_show_create(spark, tmp_path):
    import os

    t = _ctas(spark, tmp_path, "ddl_drop")
    # SHOW CREATE TABLE round-trips the schema + location + spec
    stmt = sql(spark, "SHOW CREATE TABLE ddl_drop").collect()[0]["createtab_stmt"]
    assert stmt.startswith("CREATE TABLE ddl_drop (k BIGINT, v BIGINT, g INT)")
    assert f"LOCATION '{t.path}'" in stmt
    # DROP TABLE unregisters the whole name family, keeps the data
    out = sql(spark, "DROP TABLE ddl_drop").collect()[0]
    assert out["operation"] == "DROP TABLE" and out["dropped"] >= 1
    assert not spark.catalog.tableExists("ddl_drop")
    assert not spark.catalog.tableExists("ddl_drop_history")
    assert os.path.isdir(t.path)  # external-table semantics
    with pytest.raises(TxError, match="not a registered"):
        sql(spark, "DELETE FROM ddl_drop WHERE k = 1")
    # ... and the table can be re-registered (data intact)
    register_sql_views(spark, "ddl_drop", t.path)
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_drop").collect()[0]["c"] == 20
    # PURGE deletes the data too
    sql(spark, "DROP TABLE ddl_drop PURGE")
    assert not os.path.exists(t.path)
    # a NON-txlog DROP TABLE passes through to spark.sql untouched
    spark.sql("CREATE TABLE ddl_plain_tbl (x INT) USING parquet")
    sql(spark, "DROP TABLE IF EXISTS ddl_plain_tbl")
    assert not spark.catalog.tableExists("ddl_plain_tbl")


def test_zorder_refuses_non_numeric(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "znn"))
    t.append(
        spark.range(10).selectExpr("id AS k", "CONCAT('w', id) AS s")
        .coalesce(1),
        ts=1.0,
    )
    register_sql_views(spark, "ddl_znn", t.path)
    with pytest.raises(TxError, match="not integer-valued"):
        sql(spark, "OPTIMIZE ddl_znn ZORDER BY (k, s)")


def test_cluster_by_property_and_bare_optimize(spark, tmp_path):
    """Liquid-clustering-style default: ALTER TABLE ... CLUSTER BY declares
    the clustering once as a TABLE property; a bare OPTIMIZE (no ZORDER/
    CLUSTER clause) picks it up — multi-column declarations cluster on the
    Morton interleave, so 2-D box pruning works without the statement
    repeating the columns."""
    t = TxTable(spark, str(tmp_path / "liq"))
    t.append(
        spark.range(10000).selectExpr(
            "id AS x", "(id * 37) % 1000 AS y", "id AS payload"
        ).repartition(8),
        ts=1.0,
    )
    register_sql_views(spark, "ddl_liq", t.path)
    out = sql(spark, "ALTER TABLE ddl_liq CLUSTER BY (x, y)").collect()[0]
    assert out["operation"] == "CLUSTER BY"
    props = {
        r["key"]: r["value"]
        for r in sql(spark, "SHOW TBLPROPERTIES ddl_liq").collect()
    }
    assert props["cluster_by"] == "x,y"
    # the property survives checkpoint + fresh open
    assert TxTable(spark, t.path).snapshot().cluster_by == ("x", "y")
    sql(spark, "OPTIMIZE ddl_liq FILE SIZE 20000")  # bare: uses the property
    snap = t.snapshot()

    def overlaps(a, lo, hi, col):
        s = a["stats"].get(col)
        return s is None or not (int(s["max"]) < lo or int(s["min"]) > hi)

    boxed = [
        p for p, a in snap.files.items()
        if overlaps(a, 0, 500, "x") and overlaps(a, 0, 100, "y")
    ]
    assert len(boxed) < len(snap.files)
    assert spark.sql("SELECT COUNT(*) AS c FROM ddl_liq").collect()[0]["c"] == 10000
    # latest declaration wins; unknown columns refuse
    sql(spark, "ALTER TABLE ddl_liq CLUSTER BY (payload)")
    assert t.snapshot().cluster_by == ("payload",)
    sql(spark, "ALTER TABLE ddl_liq CLUSTER BY ()")  # clear
    assert t.snapshot().cluster_by == ()
    with pytest.raises(TxError, match="no such column"):
        sql(spark, "ALTER TABLE ddl_liq CLUSTER BY (zz)")


def test_table_changes_timestamp_bounds(spark, tmp_path):
    """table_changes with TIMESTAMP bounds (decimal point = timestamp,
    integer = version): start resolves to the first commit at/after, end
    to the last commit at/before — Delta's resolution."""
    t = TxTable(spark, str(tmp_path / "tcts"))
    t.append(spark.range(0, 2).withColumnRenamed("id", "k").coalesce(1), ts=100.0)
    t.append(spark.range(2, 5).withColumnRenamed("id", "k").coalesce(1), ts=200.0)
    t.append(spark.range(5, 9).withColumnRenamed("id", "k").coalesce(1), ts=300.0)
    register_sql_views(spark, "ddl_tcts", t.path)
    # (150.0, 250.0) -> versions 2..2: only the middle commit
    n = sql(
        spark,
        "SELECT COUNT(*) AS n FROM table_changes('ddl_tcts', 150.0, 250.0)",
    ).collect()[0]["n"]
    assert n == 3
    # exact start ts is INCLUSIVE; integer end is a version
    n = sql(
        spark,
        "SELECT COUNT(*) AS n FROM table_changes('ddl_tcts', 200.0, 3)",
    ).collect()[0]["n"]
    assert n == 7
    # start before every commit covers the full history
    n = sql(
        spark,
        "SELECT COUNT(*) AS n FROM table_changes('ddl_tcts', 50.0)",
    ).collect()[0]["n"]
    assert n == 9
    # an end ts before the first commit refuses
    with pytest.raises(TxError, match="no commit at or before"):
        sql(spark, "SELECT * FROM table_changes('ddl_tcts', 50.0, 60.0)")


def test_ddl_queries_rerun_in_one_session(spark):
    """r14 audit fix: the three DDL lifecycle queries must be re-runnable in
    ONE session (they now DROP IF EXISTS their leftover registration before
    CREATE; CREATE on a still-registered name keeps erroring, like Spark's).
    The audit/oracle harnesses run once per process, but tools/audit_queries.py
    re-runs warm laps — this pins the cheapest of the three, twice."""
    from snapshot_sender_spark.queries import all_queries

    fn = all_queries()["sql_txlog_create_insert"].fn
    for _ in range(2):
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
