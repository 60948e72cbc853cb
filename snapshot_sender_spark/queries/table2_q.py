"""Round-13 txlog surface as oracle-checked queries: SQL DML (DELETE FROM /
UPDATE / MERGE INTO via the dispatcher, sources/txlog_sql.py), SQL
maintenance (OPTIMIZE / VACUUM), constraint-enforced SQL INSERT, native-scan
SQL views, and bytes-bounded stream admission.

Same contract as table_q.py: each query materializes a txlog table in a
fresh temp dir from the driver's parquet fixtures, runs the lifecycle under
test (asserting format mechanics inline), and returns a result that is a
PURE function of the base tables — DuckDB verifies it without knowing the
format. Mechanics are pinned in tests/test_txlog_dml.py and
tests/test_txlog_sql_write.py.

Reference anchor: the reference's only mutations are the status table's
keyed counter updates (DynamoDBExportStatusService.kt:143-177 — an
UPDATE-shaped increment) and whole-prefix S3 lifecycle deletes; the SQL DML
here is that control-plane surface generalized to the data plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.txlog import TxTable
from ..tables import load
from . import query
from .relational import SQL_DSUM
from .table_q import _workdir


@query(
    "sql_txlog_delete_where",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS revenue
    FROM orders
    WHERE o_orderkey % 10 = 0 AND NOT o_orderkey % 30 = 0
    GROUP BY o_orderpriority
    """,
    category="table-format",
)
def sql_txlog_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DELETE FROM <view> WHERE ...`` as PLAIN SQL TEXT (round-12 verdict
    #1: the SQL surface stopped at SELECT+INSERT; mutation required the
    Python API). The dispatcher (sources/txlog_sql.py) parses the statement
    and routes to TxTable.delete_where — full copy-on-write semantics: only
    files containing a matched row are rewritten, the pre-delete snapshot
    still time-travels (asserted inline), NULL-predicate rows survive. The
    readback through the same SQL view equals the pure filter."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_del_q_")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).where(F.col("o_orderkey") % 10 == 0)
    t = TxTable(spark, f"{work}/orders_tx")
    t.append(orders.repartition(4), ts=1.0)
    n0 = orders.count()
    register_sql_views(spark, "orders_del_tt", t.path)
    out = sql(spark, "DELETE FROM orders_del_tt WHERE o_orderkey % 30 = 0")
    row = out.collect()[0]
    if row["operation"] != "DELETE" or row["version"] != 2:
        raise AssertionError(f"unexpected DML result: {row}")
    if t.read(version=1).count() != n0:
        raise AssertionError("pre-delete snapshot must still time-travel")
    return spark.sql(f"""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               {SQL_DSUM('o_totalprice')} AS revenue
        FROM orders_del_tt GROUP BY o_orderpriority
    """)


@query(
    "sql_txlog_merge_into",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey % 10 = 0
    ), src AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 15 = 0
    ), merged AS (
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      UNION ALL SELECT * FROM src
    )
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS revenue
    FROM merged GROUP BY o_orderpriority
    """,
    category="table-format",
)
def sql_txlog_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MERGE INTO ... USING ... ON ... WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *`` as plain SQL text, dispatched to
    TxTable.merge (round-12 verdict #1). Matched keys (%30 — in both the
    %10 base and the %15 source) are REPLACED by the doubled-price source
    row, unmatched source keys (%15 but not %10) INSERT — both branches
    nonempty by construction, asserted inline. Doubling a float is
    exponent arithmetic (exact in both engines), so the oracle is a pure
    anti-join + union over orders."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_mrg_q_")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = orders.where(F.col("o_orderkey") % 10 == 0)
    src = orders.where(F.col("o_orderkey") % 15 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    n_matched = base.join(src, "o_orderkey", "left_semi").count()
    n_inserted = src.join(base, "o_orderkey", "left_anti").count()
    if not (n_matched and n_inserted):
        raise AssertionError("degenerate merge fixture: need both branches")
    t = TxTable(spark, f"{work}/orders_tx")
    t.append(base.repartition(4), ts=1.0)
    register_sql_views(spark, "orders_mrg_tt", t.path)
    src.createOrReplaceTempView("orders_mrg_src")
    out = sql(spark, """
        MERGE INTO orders_mrg_tt AS tg USING orders_mrg_src AS s
        ON tg.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """).collect()[0]
    if out["operation"] != "MERGE" or out["version"] != 2:
        raise AssertionError(f"unexpected DML result: {out}")
    if t.read().count() != base.count() + n_inserted:
        raise AssertionError("merge row count drifted")
    return spark.sql(f"""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               {SQL_DSUM('o_totalprice')} AS revenue
        FROM orders_mrg_tt GROUP BY o_orderpriority
    """)


@query(
    "sql_txlog_update_where",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN n_chars + 5 ELSE n_chars END)
                AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
    category="table-format",
)
def sql_txlog_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UPDATE <view> SET ... WHERE ...`` as plain SQL text, dispatched to
    TxTable.update_where in MERGE-ON-READ mode: no file is rewritten — one
    atomic commit DV-invalidates the matched old rows and appends the
    updated images (asserted inline: every original file is still live).
    Every RHS sees the OLD row (standard UPDATE semantics) and assigned
    expressions cast to the column's stored type, so the readback equals
    the pure CASE projection — the oracle."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_upd_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = TxTable(spark, f"{work}/docs_tx")
    t.append(docs.repartition(4), ts=1.0)
    files_before = set(t.snapshot().files)
    register_sql_views(spark, "docs_upd_tt", t.path)
    out = sql(
        spark,
        "UPDATE docs_upd_tt SET n_chars = n_chars + 5 WHERE lang = 'en'",
        mode="mor",
    ).collect()[0]
    if out["operation"] != "UPDATE":
        raise AssertionError(f"unexpected DML result: {out}")
    if not files_before <= set(t.snapshot().files):
        raise AssertionError("mor update must not rewrite existing files")
    return spark.sql("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_upd_tt GROUP BY lang
    """)


@query(
    "sql_txlog_maintenance",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 3 < 2
    GROUP BY source
    """,
    category="table-format",
)
def sql_txlog_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE and VACUUM as SQL text (round-12 verdict #6): two small
    commits' files bin-pack under ``OPTIMIZE <view>`` (file count drops, data
    unchanged), ``VACUUM ... DRY RUN`` reports the now-unreachable
    pre-compaction files WITHOUT deleting (asserted on disk), and the real
    ``VACUUM`` deletes exactly the reported list. Maintenance is
    data-equivalent by definition — the readback equals the pure filter,
    which is the oracle."""
    import os

    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_mnt_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    t = TxTable(spark, f"{work}/docs_tx")
    for i in range(2):
        t.append(docs.where(F.col("doc_id") % 3 == i).repartition(2), ts=float(i + 1))
    register_sql_views(spark, "docs_mnt_tt", t.path)
    opt = sql(spark, "OPTIMIZE docs_mnt_tt").collect()[0]
    if not opt["files_after"] < opt["files_before"]:
        raise AssertionError(f"OPTIMIZE did not bin-pack: {opt}")
    dry = sorted(
        r["path"]
        for r in sql(
            spark,
            "VACUUM docs_mnt_tt RETAIN 1 VERSIONS OLDER THAN 0 SECONDS DRY RUN",
        ).collect()
    )
    if not dry or not all(os.path.exists(os.path.join(t.path, p)) for p in dry):
        raise AssertionError("DRY RUN must report unreachable files, delete none")
    gone = sorted(
        r["path"]
        for r in sql(
            spark, "VACUUM docs_mnt_tt RETAIN 1 VERSIONS OLDER THAN 0 SECONDS"
        ).collect()
    )
    if gone != dry or any(os.path.exists(os.path.join(t.path, p)) for p in gone):
        raise AssertionError("VACUUM must delete exactly the dry-run list")
    return spark.sql("""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_mnt_tt GROUP BY source
    """)


@query(
    "sql_txlog_insert_constrained",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 2 = 0 AND n_chars >= 0
    GROUP BY source
    """,
    category="table-format",
)
def sql_txlog_insert_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints ENFORCED on the SQL write path (round-12 verdict
    #2: the r12 build refused constrained tables outright). A table with
    ``CHECK (n_chars >= 0)`` accepts a clean ``INSERT INTO`` — each Arrow
    batch is validated executor-side before any byte reaches the table —
    and atomically rejects a dirty one (asserted inline: the refusal leaves
    row count and disk state unchanged). The final readback equals the pure
    filtered union, which is the oracle."""
    from ..sources.txlog_batch import register_sql_views

    work = _workdir("txlog_sql_cons_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    even = docs.where(F.col("doc_id") % 2 == 0)
    t = TxTable(spark, f"{work}/docs_tx")
    t.append(even.where(F.col("doc_id") % 4 == 0).repartition(2), ts=1.0)
    t.set_constraint("chars_nonneg", "n_chars >= 0", ts=2.0)
    register_sql_views(spark, "docs_cons_tt", t.path)
    docs.createOrReplaceTempView("docs_cons_src")
    spark.sql("""
        INSERT INTO docs_cons_tt
        SELECT doc_id, source, n_chars FROM docs_cons_src
        WHERE doc_id % 4 = 2
    """)
    n_clean = even.count()
    if t.read().count() != n_clean:
        raise AssertionError("clean constrained INSERT INTO must commit")
    try:
        spark.sql("""
            INSERT INTO docs_cons_tt
            SELECT doc_id, source, -n_chars - 1 AS n_chars FROM docs_cons_src
            WHERE doc_id % 4 = 1
        """)
        raise AssertionError("dirty INSERT INTO must refuse")
    except Exception as exc:  # Spark wraps the TxError in its job failure
        if isinstance(exc, AssertionError):
            raise
        if "constraint violation" not in str(exc):
            raise
    if t.read().count() != n_clean or t.read().where("n_chars < 0").count():
        raise AssertionError("dirty INSERT must leave the table unchanged")
    return spark.sql("""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_cons_tt GROUP BY source
    """)


@query(
    "sql_txlog_native_scan",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 13 <> 0
    GROUP BY lang
    """,
    category="table-format",
)
def sql_txlog_native_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE-SCAN SQL views (round-12 verdict #3): ``register_sql_views
    (native=True)`` publishes the table over ``TxTable.read()`` — Spark's
    JVM parquet scan over the snapshot's pinned file list, deletion vectors
    applied as the anti-join — instead of the Python DataSource decode
    (~165k rows/s/core, SCALE.md). Asserted inline: the executed plan scans
    parquet with NO Python eval, and both view modes return identical rows.
    The returned aggregate (from the NATIVE view, after a MOR delete) is a
    pure filter of documents — the oracle."""
    from ..sources.txlog_batch import register_sql_views

    work = _workdir("txlog_sql_nat_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = TxTable(spark, f"{work}/docs_tx")
    t.append(docs.repartition(4), ts=1.0)
    t.delete_where("doc_id % 13 = 0", ts=2.0, mode="mor")  # DVs apply natively
    register_sql_views(spark, "docs_nat_src", t.path)
    register_sql_views(spark, "docs_nat_jvm", t.path, native=True)
    plan = (
        spark.sql("SELECT * FROM docs_nat_jvm")
        ._jdf.queryExecution().executedPlan().toString()
    )
    if "Scan parquet" not in plan or "PythonDataSource" in plan:
        raise AssertionError("native view must plan a JVM parquet scan")
    q = """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM {v} GROUP BY lang
    """
    a = sorted(map(tuple, spark.sql(q.format(v="docs_nat_src")).collect()))
    b = sorted(map(tuple, spark.sql(q.format(v="docs_nat_jvm")).collect()))
    if a != b:
        raise AssertionError("native and source views disagree")
    return spark.sql(q.format(v="docs_nat_jvm"))


@query(
    "sql_txlog_merge_ladder",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey % 10 = 0
    ), src AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 15 = 0
    ), final AS (
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      UNION ALL
      SELECT b.o_orderkey, b.o_orderpriority, s.o_totalprice
      FROM base b JOIN src s USING (o_orderkey)
      WHERE b.o_orderpriority <> '1-URGENT'
      UNION ALL
      SELECT * FROM src
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM base)
        AND o_totalprice > 300000
    )
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS revenue
    FROM final GROUP BY o_orderpriority
    """,
    category="table-format",
)
def sql_txlog_merge_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Delta MERGE ladder as SQL text (round-13:
    ``TxTable.merge_clauses``): ordered WHEN clauses, first-applicable-wins
    — matched urgent orders DELETE, other matched orders take the doubled
    source price (conditional UPDATE with explicit SET), unmatched source
    rows above a threshold INSERT *, the rest drop. All four branches are
    nonempty by construction (asserted inline) and deletion/update/insert
    land in ONE atomic commit. Doubling a float is exponent arithmetic
    (exact both engines), so the oracle is a pure anti-join/join/union over
    orders."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_lad_q_")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = orders.where(F.col("o_orderkey") % 10 == 0)
    src = orders.where(F.col("o_orderkey") % 15 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    matched = base.join(src.select("o_orderkey"), "o_orderkey", "left_semi")
    n_del = matched.where("o_orderpriority = '1-URGENT'").count()
    n_upd = matched.where("o_orderpriority <> '1-URGENT'").count()
    unmatched_src = src.join(base, "o_orderkey", "left_anti")
    n_ins = unmatched_src.where("o_totalprice > 300000").count()
    n_drop = unmatched_src.where("o_totalprice <= 300000").count()
    if not (n_del and n_upd and n_ins and n_drop):
        raise AssertionError(
            f"degenerate ladder fixture: {n_del}/{n_upd}/{n_ins}/{n_drop}"
        )
    t = TxTable(spark, f"{work}/orders_tx")
    t.append(base.repartition(4), ts=1.0)
    register_sql_views(spark, "orders_lad_tt", t.path)
    src.createOrReplaceTempView("orders_lad_src")
    out = sql(spark, """
        MERGE INTO orders_lad_tt AS tg USING orders_lad_src AS s
        ON tg.o_orderkey = s.o_orderkey
        WHEN MATCHED AND tg.o_orderpriority = '1-URGENT' THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED AND s.o_totalprice > 300000 THEN INSERT *
    """).collect()[0]
    if out["operation"] != "MERGE" or out["version"] != 2:
        raise AssertionError(f"unexpected MERGE result: {out}")
    if t.read().count() != base.count() - n_del + n_ins:
        raise AssertionError("ladder row count drifted")
    return spark.sql(f"""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               {SQL_DSUM('o_totalprice')} AS revenue
        FROM orders_lad_tt GROUP BY o_orderpriority
    """)


@query(
    "sql_txlog_merge_sync",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
    ), src AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0
    ), final AS (
      SELECT b.doc_id, b.lang, s.n_chars + 1 AS n_chars
      FROM base b JOIN src s USING (doc_id)
      UNION ALL
      SELECT doc_id, lang, 0 AS n_chars FROM base
      WHERE doc_id NOT IN (SELECT doc_id FROM src)
        AND lang IS DISTINCT FROM 'en'
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM final GROUP BY lang
    """,
    category="table-format",
)
def sql_txlog_merge_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WHEN NOT MATCHED BY SOURCE`` — the sync-to-source MERGE shape
    (round-13, ``TxTable.merge_clauses``): target rows the source no longer
    carries are English-deleted / otherwise zeroed in the SAME atomic
    commit as the matched update, first-applicable-wins within the BY
    SOURCE ladder (an UNKNOWN condition falls through — NULL langs zero,
    not delete). Conditions in BY SOURCE clauses are target-scoped (source
    qualifiers refuse, pinned in tests). The readback is a pure
    join/anti-join over documents — the oracle."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_sync_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = docs.where(F.col("doc_id") % 2 == 0)
    src = docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "n_chars")
    n_matched = base.join(src, "doc_id", "left_semi").count()
    orphans = base.join(src, "doc_id", "left_anti")
    n_en = orphans.where("lang = 'en'").count()
    n_zero = orphans.where("lang IS DISTINCT FROM 'en'").count()
    if not (n_matched and n_en and n_zero):
        raise AssertionError(
            f"degenerate sync fixture: {n_matched}/{n_en}/{n_zero}"
        )
    t = TxTable(spark, f"{work}/docs_tx")
    t.append(base.repartition(4), ts=1.0)
    register_sql_views(spark, "docs_sync_tt", t.path)
    src.createOrReplaceTempView("docs_sync_src")
    out = sql(spark, """
        MERGE INTO docs_sync_tt AS tg USING docs_sync_src AS s
        ON tg.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars + 1
        WHEN NOT MATCHED BY SOURCE AND lang = 'en' THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_chars = 0
    """).collect()[0]
    if out["operation"] != "MERGE" or out["version"] != 2:
        raise AssertionError(f"unexpected MERGE result: {out}")
    if t.read().count() != base.count() - n_en:
        raise AssertionError("sync row count drifted")
    return spark.sql("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_sync_tt GROUP BY lang
    """)


@query(
    "sql_txlog_ctas_ddl",
    oracle=f"""
    SELECT CASE WHEN o_totalprice > 100000 THEN 'hi' END AS tier,
           COUNT(*) AS n_orders, {SQL_DSUM('o_totalprice')} AS revenue
    FROM orders WHERE o_orderkey % 7 = 0
    GROUP BY tier
    """,
    category="table-format",
)
def sql_txlog_ctas_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL SQL lifecycle with zero Python-API calls (round-13): CREATE
    TABLE ... USING TXLOG ... AS SELECT materializes and auto-registers the
    table, ALTER TABLE ADD COLUMN is a metadata-only commit (zero files
    written, NULL-extended everywhere — asserted inline), UPDATE populates
    it, RENAME COLUMN re-aliases without touching data, DROP COLUMN retires
    the physical. Every DDL re-publishes the live view (Spark caches a
    Python DataSource view's planned reader on first use — the dispatcher's
    freshness fix, pinned in tests/test_txlog_sql_ddl.py). The readback
    equals a pure CASE projection of orders — the oracle."""
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_ctas_q_")
    load(spark, sf_dir, "orders").createOrReplaceTempView("ctas_orders_src")
    # re-run hygiene (r14): a previous run in THIS session left the name
    # registered (CREATE on an existing name correctly errors, like Spark's);
    # IF EXISTS is a no-op on a fresh session
    sql(spark, "DROP TABLE IF EXISTS orders_ctas_tt")
    sql(spark, f"""
        CREATE TABLE orders_ctas_tt USING TXLOG LOCATION '{work}/orders_tx'
        AS SELECT o_orderkey, o_orderpriority, o_totalprice
           FROM ctas_orders_src WHERE o_orderkey % 7 = 0
    """)
    t = TxTable(spark, f"{work}/orders_tx")
    files_v1 = set(t.snapshot().files)
    sql(spark, "ALTER TABLE orders_ctas_tt ADD COLUMN flag STRING")
    if set(t.snapshot().files) != files_v1:
        raise AssertionError("ADD COLUMN must be metadata-only")
    if spark.sql(
        "SELECT COUNT(*) AS c FROM orders_ctas_tt WHERE flag IS NOT NULL"
    ).collect()[0]["c"]:
        raise AssertionError("new column must be NULL for existing rows")
    sql(spark, "UPDATE orders_ctas_tt SET flag = 'hi' WHERE o_totalprice > 100000")
    sql(spark, "ALTER TABLE orders_ctas_tt RENAME COLUMN flag TO tier")
    sql(spark, "ALTER TABLE orders_ctas_tt DROP COLUMN o_orderpriority")
    if spark.table("orders_ctas_tt").columns != ["o_orderkey", "o_totalprice", "tier"]:
        raise AssertionError("DDL must re-publish the live view's schema")
    return spark.sql(f"""
        SELECT tier, COUNT(*) AS n_orders,
               {SQL_DSUM('o_totalprice')} AS revenue
        FROM orders_ctas_tt GROUP BY tier
    """)


@query(
    "sql_txlog_restore",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
    category="table-format",
)
def sql_txlog_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``RESTORE TABLE ... TO TIMESTAMP AS OF`` as SQL text: after a DELETE
    and a MOR UPDATE, one metadata-only commit rolls the live set back to
    the v1 snapshot (no data movement — asserted inline: zero new data
    files) and the dispatcher re-publishes the view, so a SQL user's very
    next query reads the restored state. History keeps moving FORWARD (the
    bad interval stays auditable). The readback equals the untouched base
    aggregate — the oracle."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_rst_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = TxTable(spark, f"{work}/docs_tx")
    t.append(docs.repartition(4), ts=100.0)
    register_sql_views(spark, "docs_rst_tt", t.path)
    # plan the view BEFORE mutating: restore must beat Spark's plan cache
    n0 = spark.sql("SELECT COUNT(*) AS c FROM docs_rst_tt").collect()[0]["c"]
    sql(spark, "DELETE FROM docs_rst_tt WHERE doc_id % 3 = 0")
    sql(spark, "UPDATE docs_rst_tt SET n_chars = 0 WHERE lang = 'en'", mode="mor")
    out = sql(spark, "RESTORE TABLE docs_rst_tt TO TIMESTAMP AS OF 100").collect()[0]
    if out["operation"] != "RESTORE" or out["restored_version"] != 1:
        raise AssertionError(f"unexpected RESTORE result: {out}")
    if set(t.snapshot().files) != set(t.snapshot(version=1).files):
        raise AssertionError("RESTORE must make the live set exactly v1's")
    if spark.sql("SELECT COUNT(*) AS c FROM docs_rst_tt").collect()[0]["c"] != n0:
        raise AssertionError("restored view must serve the v1 row count")
    return spark.sql("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_rst_tt GROUP BY lang
    """)


@query(
    "sql_txlog_table_changes",
    oracle="""
    SELECT 'insert' AS _change_type, 2 AS _commit_version,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 4 = 1
    UNION ALL
    SELECT 'delete' AS _change_type, 3 AS _commit_version,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 4 < 2 AND doc_id % 5 = 0
    """,
    category="table-format",
)
def sql_txlog_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table_changes('<view>', a, b)`` — Delta's CDF table-valued function
    as plain SQL (versions a..b INCLUSIVE, rewritten to a temp view over
    TxTable.row_changes because Spark cannot resolve a Python TVF inside
    spark.sql). Version 2's appended rows surface as inserts, version 3's
    copy-on-write DELETE surfaces exactly the matched rows as deletes (the
    merely-rewritten rows of the hit files contribute NOTHING — multiset
    file diff), and v1 stays outside the requested window. The aggregate is
    a pure function of documents — the oracle."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_tc_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    t = TxTable(spark, f"{work}/docs_tx")
    n_ins = docs.where(F.col("doc_id") % 4 == 1).count()
    n_del = docs.where((F.col("doc_id") % 4 < 2) & (F.col("doc_id") % 5 == 0)).count()
    if not (n_ins and n_del):
        raise AssertionError("degenerate CDF fixture: need both change types")
    t.append(docs.where(F.col("doc_id") % 4 == 0).repartition(2), ts=1.0)  # v1
    t.append(docs.where(F.col("doc_id") % 4 == 1).repartition(2), ts=2.0)  # v2
    register_sql_views(spark, "docs_tc_tt", t.path)
    sql(spark, "DELETE FROM docs_tc_tt WHERE doc_id % 5 = 0")  # v3, cow
    return sql(spark, """
        SELECT _change_type, _commit_version,
               COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM table_changes('docs_tc_tt', 2, 3)
        GROUP BY _change_type, _commit_version
    """)


@query(
    "sql_txlog_create_insert",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 3 = 1
    GROUP BY lang
    """,
    category="table-format",
)
def sql_txlog_create_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain ``CREATE TABLE (schema) USING TXLOG`` — an EMPTY table whose
    version-1 commit carries only the schema (round-13; previously only
    CTAS existed). An empty table SELECTs as zero rows with the declared
    shape (the Python source emits an empty-sentinel partition — Spark
    hands read() None when partitions() returns []; pinned in tests), the
    schema then governs the first ``INSERT INTO``, and the readback equals
    a pure filter of documents — the oracle."""
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_crt_q_")
    sql(spark, "DROP TABLE IF EXISTS docs_crt_tt")  # re-run hygiene (r14)
    sql(spark, f"""
        CREATE TABLE docs_crt_tt (doc_id BIGINT, lang STRING, n_chars BIGINT)
        USING TXLOG LOCATION '{work}/docs_tx'
    """)
    if spark.sql("SELECT COUNT(*) AS c FROM docs_crt_tt").collect()[0]["c"]:
        raise AssertionError("a freshly created table must be empty")
    if spark.table("docs_crt_tt").columns != ["doc_id", "lang", "n_chars"]:
        raise AssertionError("empty table must carry the declared schema")
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_crt_src")
    sql(spark, """
        INSERT INTO docs_crt_tt
        SELECT doc_id, lang, n_chars FROM docs_crt_src WHERE doc_id % 3 = 1
    """)
    return spark.sql("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_crt_tt GROUP BY lang
    """)


@query(
    "sql_txlog_convert_adopt",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0
    GROUP BY lang
    """,
    category="table-format",
)
def sql_txlog_convert_adopt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CONVERT TO TXLOG`` (Delta's CONVERT TO DELTA): an existing
    hive-partitioned parquet directory becomes a transactional table IN
    PLACE — zero bytes rewritten (asserted inline: the adopted files ARE
    the original part files), partition spec inferred from the layout,
    footer stats adopted so pruning works from the first query. The very
    next statement is a transactional DELETE and the pre-conversion rows
    still time-travel. The readback equals a pure filter of documents —
    the oracle."""
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_cvt_q_")
    sql(spark, "DROP TABLE IF EXISTS docs_cvt_tt")  # re-run hygiene (r14)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.where(F.col("doc_id") % 2 == 0).write.partitionBy("lang").parquet(
        f"{work}/plain"
    )
    import os as _os

    orig_inodes = {_os.stat(p).st_ino for p in _list_parquet(f"{work}/plain")}
    out = sql(
        spark, f"CONVERT TO TXLOG '{work}/plain' AS docs_cvt_tt"
    ).collect()[0]
    if out["operation"] != "CONVERT TO TXLOG" or out["version"] != 1:
        raise AssertionError(f"unexpected CONVERT result: {out}")
    t = TxTable(spark, f"{work}/plain")
    if t.snapshot().partition_by != ("lang",):
        raise AssertionError("partition spec must be inferred from the layout")
    live_inodes = {
        _os.stat(_os.path.join(t.path, p)).st_ino
        for p in t.snapshot().live_paths()
    }
    if live_inodes != orig_inodes:  # renamed, never copied: same inodes
        raise AssertionError("convert must adopt the ORIGINAL bytes in place")
    n0 = t.read().count()
    sql(spark, "DELETE FROM docs_cvt_tt WHERE doc_id % 3 = 0")
    if t.read(version=1).count() != n0:
        raise AssertionError("pre-conversion snapshot must time-travel")
    return spark.sql("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_cvt_tt GROUP BY lang
    """)


def _list_parquet(root: str) -> set:
    import glob as _glob
    import os as _os

    return {
        f
        for f in _glob.glob(_os.path.join(root, "**", "*.parquet"), recursive=True)
        if not any(
            s.startswith(("_", "."))
            for s in _os.path.relpath(f, root).split(_os.sep)
        )
    }


@query(
    "sql_txlog_zorder_optimize",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS sum_value
    FROM events GROUP BY event_type
    """,
    category="table-format",
)
def sql_txlog_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``OPTIMIZE ... ZORDER BY (a, b)`` — Delta's multi-dimensional
    clustering as SQL text: the rewrite range-partitions and sorts on a
    Morton interleave of the two columns (built from the table's current
    min/max; same interleave as the oracle-checked layout_zorder_cluster),
    so every output file's footer stats cover a tight box in BOTH
    dimensions and a 2-D predicate prunes files on each (asserted inline).
    OPTIMIZE is data-equivalent by definition — the readback equals the
    plain aggregate, which is the oracle."""
    from ..sources.txlog_batch import register_sql_views
    from ..sources.txlog_sql import sql

    work = _workdir("txlog_sql_zord_q_")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = TxTable(spark, f"{work}/ev_tx")
    t.append(ev.repartition(8), ts=1.0)
    register_sql_views(spark, "ev_zord_tt", t.path)
    lo_e, hi_e, lo_u, hi_u = ev.agg(
        F.min("event_id"), F.max("event_id"), F.min("user_id"), F.max("user_id")
    ).first()
    out = sql(spark, "OPTIMIZE ev_zord_tt FILE SIZE 65536 "
                     "ZORDER BY (event_id, user_id)").collect()[0]
    if out["operation"] != "OPTIMIZE":
        raise AssertionError(f"unexpected OPTIMIZE result: {out}")
    snap = t.snapshot()

    def overlaps(a, lo, hi, col):
        s = a["stats"].get(col)
        return s is None or not (int(s["max"]) < lo or int(s["min"]) > hi)

    box = [
        p for p, a in snap.files.items()
        if overlaps(a, lo_e, lo_e + (hi_e - lo_e) // 4, "event_id")
        and overlaps(a, lo_u, lo_u + (hi_u - lo_u) // 4, "user_id")
    ]
    if len(snap.files) > 2 and not len(box) < len(snap.files):
        raise AssertionError("z-order must enable 2-D file pruning")
    return spark.sql(f"""
        SELECT event_type, COUNT(*) AS n_events,
               {SQL_DSUM('value')} AS sum_value
        FROM ev_zord_tt GROUP BY event_type
    """)


@query(
    "stream_txlog_bytes_limited",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 4 < 3
    GROUP BY source
    """,
    category="table-format",
)
def stream_txlog_bytes_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTES-based stream admission control (round-12 verdict #7): a reader
    resuming against a 3-commit backlog with ``max_bytes_per_trigger`` set
    to one commit's size drains it as byte-bounded micro-batches — each
    availableNow run admits whole versions until the budget is spent
    (asserted inline: exactly three runs), the version-offset analog of
    maxBytesPerTrigger. Rate limiting changes batch SHAPE, never content:
    the drained union equals the table exactly — the oracle."""
    from ..sources.txlog_stream import register

    register(spark)
    work = _workdir("txlog_bytes_q_")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    t = TxTable(spark, f"{work}/tab")
    for i in range(3):
        t.append(docs.where(F.col("doc_id") % 4 == i).repartition(2), ts=float(i + 1))
    budget = max(a["bytes"] for a in t.snapshot().files.values())

    runs, target = 0, docs.where(F.col("doc_id") % 4 < 3).count()
    while runs < 6:
        q = (
            spark.readStream.format("txlog_stream")
            .option("path", t.path)
            .option("max_bytes_per_trigger", str(budget))
            .load()
            .writeStream.format("parquet")
            .option("path", f"{work}/out")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{work}/ckpt")
            .start()
        )
        q.awaitTermination()
        runs += 1
        if spark.read.parquet(f"{work}/out").count() >= target:
            break
    if runs != 3:  # budget ≈ one commit: one version per run, three to drain
        raise AssertionError(f"expected 3 byte-limited runs, took {runs}")
    return (
        spark.read.parquet(f"{work}/out")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )
