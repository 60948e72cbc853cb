"""Spark 4 native surfaces: VARIANT, the Python DataSource API (partition
planning + filter pushdown), and the arbitrary-state processor behind
stream_transform_with_state (multi-batch state carry-over)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.sources import pyds
from snapshot_sender_spark.streaming import twstate
from snapshot_sender_spark.streaming import windows as sw


def test_variant_roundtrip_typed_extraction(spark):
    df = spark.createDataFrame(
        [('{"a": {"b": [1, 2.5, "x"]}, "n": null}',), ("[7, 8]",)], "js string"
    ).select(F.parse_json("js").alias("v"))
    got = df.select(
        F.try_variant_get("v", "$.a.b[0]", "long").alias("i"),
        F.try_variant_get("v", "$.a.b[1]", "double").alias("d"),
        F.try_variant_get("v", "$.a.b[2]", "string").alias("s"),
        F.is_variant_null(F.try_variant_get("v", "$.n", "variant")).alias("isnull"),
        F.try_variant_get("v", "$[1]", "long").alias("arr1"),
    ).collect()
    assert (got[0]["i"], got[0]["d"], got[0]["s"], got[0]["isnull"]) == (1, 2.5, "x", True)
    assert got[1]["arr1"] == 8 and got[1]["i"] is None


def test_try_parse_json_returns_null_on_corrupt(spark):
    df = spark.createDataFrame([('{"k": 1}',), ('{"k": ',)], "js string")
    got = df.select(F.try_parse_json("js").alias("v")).collect()
    assert got[0]["v"] is not None and got[1]["v"] is None


def test_python_datasource_full_scan(spark):
    pyds.register(spark)
    df = spark.read.format("snapshot_listing").option("files_per_topic", "5").load()
    rows = df.collect()
    assert len(rows) == 5 * len(pyds.TOPICS)
    one = next(r for r in rows if r["file_no"] == 3 and r["topic"] == "db.core.claimant")
    # filename grammar matches TextParsingUtility.kt:11
    assert one["fileName"] == "db.core.claimant-003-004-000003.txt.gz.enc"
    import re

    grammar = re.compile(r"^(?:\w+\.)?[\w-]+\.[\w-]+-\d{3}-\d{3}-\d+\.\w+\.\w+")
    assert all(grammar.match(r["fileName"]) for r in rows)


def test_python_datasource_topic_pushdown_prunes_partitions(spark):
    """EqualTo/In on topic must reach pushFilters and prune whole input
    partitions. Unit level: the reader's partitions() shrinks to the selected
    topics after pushFilters. End to end: filtered scans return exactly the
    selected topics' rows (Spark re-applies whatever the reader declines, so
    results stay correct either way — the unit check is what proves pruning)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    PUSH = {"files_per_topic": "4", "filter_pushdown": "true"}
    r = pyds.SnapshotListingReader(PUSH)
    assert len(r.partitions()) == len(pyds.TOPICS)

    r = pyds.SnapshotListingReader(PUSH)
    leftover = r.pushFilters([EqualTo(("topic",), "db.core.claimant")])
    assert list(leftover) == [] and len(r.partitions()) == 1

    r = pyds.SnapshotListingReader(PUSH)
    unsupported = GreaterThan(("file_no",), 1)
    leftover = r.pushFilters(
        [In(("topic",), ("db.core.claimant", "db.crypto.encryptedData")), unsupported]
    )
    assert list(leftover) == [unsupported]  # declined → Spark re-applies it
    assert len(r.partitions()) == 2
    # a later push RESETS the pruning (state never accumulates across plans)
    assert list(r.pushFilters([unsupported])) == [unsupported]
    assert len(r.partitions()) == len(pyds.TOPICS)

    # DEFAULT mode is SAFE: pushFilters consumes nothing (all filters back
    # to Spark, no pruning state) because Spark 4.1 caches the last planned
    # read on a shared relation and reuses it for filterless queries —
    # see SnapshotListingReader.__init__; the cache-safe pruning spelling
    # is the topics= VIEW option.
    r0 = pyds.SnapshotListingReader({"files_per_topic": "4"})
    back = r0.pushFilters([EqualTo(("topic",), "db.core.claimant")])
    assert len(list(back)) == 1 and len(r0.partitions()) == len(pyds.TOPICS)
    rv = pyds.SnapshotListingReader(
        {"files_per_topic": "4", "topics": "db.core.claimant,db.core.contract"}
    )
    assert len(rv.partitions()) == 2

    pyds.register(spark)
    df = (
        spark.read.format("snapshot_listing")
        .option("files_per_topic", "4")
        .option("filter_pushdown", "true")
        .load()
    )
    assert df.count() == 4 * len(pyds.TOPICS)
    assert df.filter(F.col("topic") == "db.core.claimant").count() == 4
    assert (
        df.filter(
            F.col("topic").isin("db.core.claimant", "db.crypto.encryptedData")
            & (F.col("file_no") > 1)
        ).count()
        == 4
    )


def test_python_datasource_oracle_sql_matches(spark):
    """The generate_series oracle reproduces the source bit-for-bit."""
    import duckdb

    pyds.register(spark)
    got = sorted(
        spark.read.format("snapshot_listing")
        .option("files_per_topic", "3")
        .load()
        .collect(),
        key=lambda r: (r["topic"], r["file_no"]),
    )
    con = duckdb.connect()  # hold the ref — a GC'd connection kills the relation
    want = sorted(
        con.sql(pyds.oracle_listing_sql(files_per_topic=3)).fetchall(),
        key=lambda t: (t[0], t[4]),
    )
    assert [tuple(r) for r in got] == want


@pytest.fixture()
def two_batch_dir(tmp_path, spark):
    d = str(tmp_path / "tw_in")
    os.makedirs(d)
    schema = "user_id long, value double"
    batches = [
        [(1, 1.25), (1, 2.00), (2, 5.50)],
        [(1, 7.75), (2, 0.25)],
    ]
    for i, rows in enumerate(batches, 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{d}/b{i}")
        time.sleep(1.1)
    return d


def test_running_stats_state_carries_across_batches(spark, two_batch_dir):
    schema = spark.read.parquet(two_batch_dir + "/b1").schema
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(two_batch_dir + "/*/")
        .withColumn("cents", F.floor(F.col("value") * 100).cast("long"))
    )
    result = sw.run_to_memory(twstate.running_stats_transform(events), "update").collect()
    final = {}
    for r in result:  # update mode: keep the emission with the largest n_events
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    assert final[1]["n_events"] == 3
    assert final[1]["total_value"] == pytest.approx(11.00)
    assert final[1]["max_value"] == 7.75
    assert final[2]["n_events"] == 2
    assert final[2]["total_value"] == pytest.approx(5.75)


def test_state_v2_gate_matches_environment():
    """The fallback gate must mirror reality: if protobuf imports, state v2 is
    used; this asserts the gate function itself doesn't silently drift."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        expected = True
    except ImportError:
        expected = False
    assert twstate.state_v2_available() is expected


def test_quantize_int8_arrow_edge_cases(spark):
    from snapshot_sender_spark.operators.similarity import quantize_int8_arrow

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0]), (3, []), (4, [2.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["id"]: r for r in quantize_int8_arrow(df, "embedding", "vec_id").collect()}
    assert rows[1]["qmin"] == -127 and rows[1]["qmax"] == 63  # scale = 127/1.0
    assert rows[2]["scale"] is None and rows[2]["qsum"] == 0  # all-zero vector
    assert rows[3]["scale"] is None  # empty vector
    assert rows[4]["qmax"] == 127  # the max element lands exactly on 127


def test_inactivity_flush_times_out_idle_keys(spark, tmp_path):
    """One continuous query: both keys get input, their 1 ms inactivity
    timers expire, each emits its flushed=true final row with the state-held
    count, and the state is dropped — proven by feeding the key again and
    seeing its count restart from zero instead of resuming."""
    src = str(tmp_path / "flush_in")
    ckpt = str(tmp_path / "flush_ckpt")
    os.makedirs(src)
    schema = "user_id long, value double"
    spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 5.0)], schema).coalesce(1).write.parquet(
        src, mode="append"
    )

    stream = spark.readStream.schema(schema).format("parquet").load(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    q = (
        twstate.inactivity_flush_transform(stream, timeout_ms=1)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("flush_run")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )

    def rows():
        return {
            (r["user_id"], r["n_events"], r["flushed"])
            for r in spark.sql("SELECT * FROM flush_run").collect()
        }

    def wait_for(want, deadline_s=90):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            got = rows()
            if want <= got:
                return got
            time.sleep(0.1)
        raise AssertionError(f"timed out waiting for {want}, have {rows()}")

    try:
        # live counts, then inactivity flushes with the final per-key counts
        wait_for({(1, 2, False), (2, 1, False), (1, 2, True), (2, 1, True)})
        # feeding a flushed key restarts from empty state (flush cleared it)
        spark.createDataFrame([(1, 7.0)], schema).coalesce(1).write.parquet(
            src, mode="append"
        )
        got = wait_for({(1, 1, False)})
        assert (1, 3, False) not in got  # state did NOT resume at the old count
    finally:
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_python_datasource_stream_offsets_and_resume(spark, tmp_path):
    """The listing as a streaming source: offsets advance with the file
    universe, and a restarted query resumes from the checkpointed watermark,
    emitting ONLY files that arrived since — exactly-once across runs with
    no re-listing (the streaming analog of the .finished anti-join)."""
    pyds.register(spark)
    ckpt = str(tmp_path / "pyds_ckpt")
    out = str(tmp_path / "pyds_out")

    def run(files_per_topic):
        q = (
            spark.readStream.format("snapshot_listing")
            .option("files_per_topic", str(files_per_topic))
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    first = run(10)
    assert len(first) == 6 * 10  # 6 topics x 10 files
    assert {r["file_no"] for r in first} == set(range(10))

    # universe grows to 15 files/topic; same checkpoint -> exactly the 5 new
    # files per topic are appended on resume, nothing re-emitted
    second = run(15)
    assert len(second) == 6 * 15
    new_rows = [r for r in second if r["file_no"] >= 10]
    assert len(new_rows) == 6 * 5
    assert {r["topic"] for r in new_rows} == {f"db.{d}.{c}" for d, c in pyds.TOPICS}


def test_ddl_column_defaults(spark, tmp_path):
    """Column DEFAULT values on a parquet table: omitted columns and the
    DEFAULT keyword both fill the declared default on INSERT — the
    schema-evolution affordance for appending to delivery manifests whose
    writers predate a new column."""
    spark.sql("DROP TABLE IF EXISTS manifest_defaults")
    spark.sql(
        """
        CREATE TABLE manifest_defaults (
          fileName STRING,
          status STRING DEFAULT 'Sent',
          attempts INT DEFAULT 1
        ) USING parquet
        """
    )
    try:
        spark.sql("INSERT INTO manifest_defaults VALUES ('a.json.gz', DEFAULT, DEFAULT)")
        spark.sql("INSERT INTO manifest_defaults (fileName) VALUES ('b.json.gz')")
        spark.sql(
            "INSERT INTO manifest_defaults VALUES ('c.json.gz', 'Received', 3)"
        )
        got = {
            r["fileName"]: (r["status"], r["attempts"])
            for r in spark.sql("SELECT * FROM manifest_defaults").collect()
        }
        assert got == {
            "a.json.gz": ("Sent", 1),
            "b.json.gz": ("Sent", 1),
            "c.json.gz": ("Received", 3),
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS manifest_defaults")


def test_declarative_pipeline_local_run(spark):
    """Spark Declarative Pipelines declarations (@materialized_view /
    @temporary_view from pyspark.pipelines) execute on a classic session via
    the local registry+executor: dependencies resolve regardless of
    declaration order, outputs are recorded as typed graph elements, and the
    materialized results equal the hand-built equivalents."""
    from pyspark.pipelines import materialized_view, temporary_view
    from pyspark.pipelines.output import MaterializedView, TemporaryView

    from snapshot_sender_spark.plans import sdp
    from snapshot_sender_spark.tables import load

    sf_dir = "/root/testdata/sf0.001"

    def define():
        # declared OUT of dependency order on purpose
        @materialized_view
        def lang_counts():
            return (
                spark.table("quality_docs")
                .groupBy("lang")
                .agg(F.count("*").alias("n"))
            )

        @temporary_view
        def raw_docs():
            return load(spark, sf_dir, "documents")

        @materialized_view(comment="quality-gated corpus")
        def quality_docs():
            d = spark.table("raw_docs")
            return d.filter(F.length("text") >= 120)

    results = sdp.run_local(spark, define)
    assert set(results) == {"raw_docs", "quality_docs", "lang_counts"}

    docs = load(spark, sf_dir, "documents")
    want_q = docs.filter(F.length("text") >= 120).count()
    assert results["quality_docs"].count() == want_q
    want_langs = {
        (r["lang"], r["n"])
        for r in docs.filter(F.length("text") >= 120)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {(r["lang"], r["n"]) for r in results["lang_counts"].collect()} == want_langs

    # typed graph elements were recorded
    reg = sdp.LocalGraphRegistry()
    from pyspark.pipelines.graph_element_registry import (
        graph_element_registration_context,
    )

    with graph_element_registration_context(reg):
        define()
    kinds = {o.name: type(o).__name__ for o in reg.outputs}
    assert kinds["quality_docs"] == "MaterializedView"
    assert kinds["raw_docs"] == "TemporaryView"
    assert isinstance(reg.outputs[0], (MaterializedView, TemporaryView))
    comments = {o.name: o.comment for o in reg.outputs}
    assert comments["quality_docs"] == "quality-gated corpus"


def test_to_arrow_interchange(spark):
    """df.toArrow() (Spark 4): zero-copy-ish Arrow interchange for handing
    query results to pyarrow/polars/duckdb without a pandas detour."""
    import pyarrow as pa

    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    tbl = df.toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 10
    assert tbl.column("id").to_pylist() == list(range(10))
    import duckdb

    con = duckdb.connect()
    assert con.sql("SELECT SUM(id) FROM tbl").fetchone()[0] == 45


def test_declarative_pipeline_streaming_table(spark, tmp_path):
    """An SDP streaming table fed by an append_flow from the custom streaming
    DataSource, consumed by a downstream materialized view — the declarative
    form of the continuous delivery service, run locally (AvailableNow into
    the pipeline workdir). Re-running over the same workdir is incremental:
    no new files -> no new rows."""
    from pyspark.pipelines import append_flow, create_streaming_table, materialized_view

    from snapshot_sender_spark.plans import sdp

    pyds.register(spark)

    def define():
        create_streaming_table("file_events")

        @append_flow(target="file_events")
        def listing_flow():
            return (
                spark.readStream.format("snapshot_listing")
                .option("files_per_topic", "4")
                .load()
            )

        @materialized_view
        def per_topic():
            return (
                spark.table("file_events")
                .groupBy("topic")
                .agg(F.count("*").alias("n_files"), F.sum("size_bytes").alias("bytes"))
            )

    wd = str(tmp_path / "sdp_wd")
    results = sdp.run_local(spark, define, workdir=wd)
    assert results["file_events"].count() == 4 * len(pyds.TOPICS)
    per_topic = {r["topic"]: r["n_files"] for r in results["per_topic"].collect()}
    assert set(per_topic.values()) == {4} and len(per_topic) == len(pyds.TOPICS)

    # incremental: same workdir, no universe growth -> identical row count
    results2 = sdp.run_local(spark, define, workdir=wd)
    assert results2["file_events"].count() == 4 * len(pyds.TOPICS)


def test_declarative_pipeline_unresolvable_raises(spark):
    """A flow referencing a dataset nobody defines must fail loudly with the
    unresolved flow names, not spin or silently drop the dataset."""
    from pyspark.pipelines import materialized_view

    from snapshot_sender_spark.plans import sdp

    def define():
        @materialized_view
        def orphan():
            return spark.table("never_defined_anywhere")

    with pytest.raises(ValueError, match="orphan"):
        sdp.run_local(spark, define)


def test_declarative_pipeline_sink(spark, tmp_path):
    """create_sink: an SDP external sink receives a streaming append flow
    with the sink's declared format/options — the delivery side of the graph
    (files leave the pipeline instead of becoming a dataset)."""
    from pyspark.pipelines import append_flow, create_sink

    from snapshot_sender_spark.plans import sdp

    pyds.register(spark)
    out = str(tmp_path / "sink_out")

    def define():
        create_sink("delivery", format="parquet", options={"path": out})

        @append_flow(target="delivery")
        def deliver_listing():
            return (
                spark.readStream.format("snapshot_listing")
                .option("files_per_topic", "3")
                .load()
                .select("topic", "fileName", "size_bytes")
            )

    results = sdp.run_local(spark, define, workdir=str(tmp_path / "wd"))
    delivered = results["delivery"]
    assert delivered.count() == 3 * len(pyds.TOPICS)
    assert set(delivered.columns) == {"topic", "fileName", "size_bytes"}


def test_geospatial_wkb_roundtrip(spark):
    """Spark 4.1 geospatial preview (flag-gated GEOMETRY type): WKB points
    parse, carry an SRID, and serialize back to the identical WKB bytes —
    the storage-level contract a geo-enabled lake needs before any spatial
    predicate work."""
    import struct

    spark.conf.set("spark.sql.geospatial.enabled", "true")

    def wkb_point(x, y):
        return b"\x01\x01\x00\x00\x00" + struct.pack("<dd", x, y)

    pts = [(1, wkb_point(10.0, 20.0)), (2, wkb_point(-3.5, 48.25))]
    df = spark.createDataFrame(pts, "id long, wkb binary")
    out = df.selectExpr(
        "id",
        "st_srid(st_setsrid(st_geomfromwkb(wkb), 4326)) AS srid",
        "st_asbinary(st_geomfromwkb(wkb)) AS back",
    ).collect()
    for row, (pid, raw) in zip(sorted(out, key=lambda r: r["id"]), pts):
        assert row["srid"] == 4326
        assert bytes(row["back"]) == raw, (pid, bytes(row["back"]).hex())


def test_schema_inference_functions(spark):
    """schema_of_json / schema_of_csv / schema_of_variant: the DDL strings the
    engine infers for undeclared payloads (test-only — the output is a Spark
    DDL dialect no other engine reproduces). Pinned so inference drift across
    Spark upgrades is visible."""
    row = spark.sql(
        """SELECT schema_of_json('{"a": 1, "b": [1.5], "c": {"d": "x"}}') AS j,
                  schema_of_csv('1,abc,2.5') AS c,
                  schema_of_variant(parse_json('{"a": 1, "b": ["x"]}')) AS v"""
    ).first()
    assert row["j"] == "STRUCT<a: BIGINT, b: ARRAY<DOUBLE>, c: STRUCT<d: STRING>>"
    assert row["c"] == "STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>"
    assert row["v"] == "OBJECT<a: BIGINT, b: ARRAY<STRING>>"  # variant spells OBJECT
