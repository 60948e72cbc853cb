"""Python DataSource write path (sources/pyds_sink.py): DSv2 commit protocol
around the reference's delivery outputs — staged partition files become
visible only on commit, markers + manifest included; streaming form commits
per epoch idempotently."""

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.sources import pyds_sink


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds_sink.register(spark)


def _receipts(spark, n=6):
    return spark.range(n).select(
        F.concat(F.lit("db.core.claimant-000-001-00000"), F.col("id")).alias("fileName"),
        (F.col("id") * 10).alias("rows_delivered"),
    )


def test_batch_write_commit_publishes_files_markers_manifest(spark, tmp_path):
    out = str(tmp_path / "sink")
    os.makedirs(out)
    _receipts(spark).repartition(3).write.format("delivery_sink").option(
        "path", out
    ).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 6
    data_files = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert {e["file"] for e in manifest["files"]} == {os.path.basename(f) for f in data_files}
    # every delivered fileName got its .finished marker with the reference's body
    markers = os.listdir(os.path.join(out, "status"))
    assert len(markers) == 6 and all(m.endswith(".finished") for m in markers)
    body = open(os.path.join(out, "status", sorted(markers)[0])).read()
    assert body.startswith("Finished db.core.claimant")
    # staging fully drained; payload round-trips as JSON-L
    assert glob.glob(os.path.join(out, "_staging", "*")) == []
    rows = [json.loads(line) for f in data_files for line in gzip.open(f, "rt")]
    assert sorted(r["rows_delivered"] for r in rows) == [0, 10, 20, 30, 40, 50]


def test_batch_write_task_failure_publishes_nothing(spark, tmp_path):
    out = str(tmp_path / "sink_fail")
    os.makedirs(out)

    @F.udf("string")
    def boom(fn):
        if fn.endswith("3"):
            raise RuntimeError("delivery failed")
        return fn

    df = _receipts(spark, 4).withColumn("fileName", boom("fileName"))
    with pytest.raises(Exception):
        df.repartition(4).write.format("delivery_sink").option("path", out).mode(
            "append"
        ).save()
    # abort: no manifest, no visible data files, no markers
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
    assert glob.glob(os.path.join(out, "part-*.json.gz")) == []
    assert not os.path.exists(os.path.join(out, "status"))


def test_batch_overwrite_replaces_previous_commit(spark, tmp_path):
    out = str(tmp_path / "sink_ow")
    os.makedirs(out)
    for _ in range(2):
        _receipts(spark, 3).write.format("delivery_sink").option("path", out).mode(
            "overwrite"
        ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 3
    data_files = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert {e["file"] for e in manifest["files"]} == {os.path.basename(f) for f in data_files}


def test_stream_write_commits_per_epoch_idempotently(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)
    _receipts(spark, 5).write.parquet(src)

    def run():
        q = (
            spark.readStream.schema("fileName string, rows_delivered bigint")
            .parquet(src)
            .writeStream.format("delivery_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    manifests = glob.glob(os.path.join(out, "_MANIFEST-*.json"))
    assert len(manifests) == 1
    total = sum(json.load(open(m))["total_rows"] for m in manifests)
    assert total == 5
    assert len(os.listdir(os.path.join(out, "status"))) == 5
    # restart from the same checkpoint: no new data → no new manifests
    run()
    assert glob.glob(os.path.join(out, "_MANIFEST-*.json")) == manifests


def test_arrow_writer_stages_parquet_and_commits(spark, tmp_path):
    """The Arrow-native writer (DataSourceArrowWriter): RecordBatches staged
    straight to parquet, same commit protocol — published files read back
    with the ordinary parquet reader, markers + manifest in place."""
    out = str(tmp_path / "arrow_sink")
    os.makedirs(out)
    pyds_sink.register_arrow(spark)
    _receipts(spark).repartition(2).write.format("delivery_sink_arrow").option(
        "path", out
    ).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 6
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert files and {e["file"] for e in manifest["files"]} == {
        os.path.basename(f) for f in files
    }
    back = spark.read.parquet(*files)
    assert sorted(r["rows_delivered"] for r in back.collect()) == [0, 10, 20, 30, 40, 50]
    assert len(os.listdir(os.path.join(out, "status"))) == 6


def test_pluggable_source_to_pluggable_sink_stream(spark, tmp_path):
    """Capstone for the pluggable surface: the custom Python STREAMING source
    (snapshot_listing: offset-watermarked per-topic listing) feeds a transform
    and lands in the custom Python STREAMING sink (delivery_sink: per-epoch
    commit protocol) — the reference's whole dataflow shape with BOTH ends as
    DataSource-API plugins, exactly-once across the checkpoint."""
    from pyspark.sql import functions as F

    from snapshot_sender_spark.sources import pyds

    pyds.register(spark)
    out = str(tmp_path / "plug_out")
    ckpt = str(tmp_path / "plug_ckpt")
    os.makedirs(out)

    def run():
        stream = (
            spark.readStream.format("snapshot_listing")
            .option("files_per_topic", "20")
            .load()
            .select(
                "fileName",
                "topic",
                F.regexp_replace("fileName", r"\.txt\.gz\.enc$", ".json.gz").alias(
                    "delivered_as"
                ),
            )
        )
        q = (
            stream.writeStream.format("delivery_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    manifests = glob.glob(os.path.join(out, "_MANIFEST-*.json"))
    assert manifests
    total = sum(json.load(open(m))["total_rows"] for m in manifests)
    assert total == 6 * 20  # every topic's files delivered exactly once
    markers = os.listdir(os.path.join(out, "status"))
    assert len(markers) == 6 * 20
    # restart: offsets checkpointed, nothing re-delivered
    run()
    assert sum(
        json.load(open(m))["total_rows"]
        for m in glob.glob(os.path.join(out, "_MANIFEST-*.json"))
    ) == 6 * 20


def test_arrow_writer_overwrite_replaces_previous_commit(spark, tmp_path):
    out = str(tmp_path / "arrow_ow")
    os.makedirs(out)
    pyds_sink.register_arrow(spark)
    for n in (5, 3):
        _receipts(spark, n).write.format("delivery_sink_arrow").option(
            "path", out
        ).mode("overwrite").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 3
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert {e["file"] for e in manifest["files"]} == {os.path.basename(f) for f in files}


def test_overwrite_clears_stale_markers_and_staging(spark, tmp_path):
    """Overwrite replaces the previous commit WHOLESALE: the status prefix
    must advertise only the new commit's deliveries, and _staging leftovers
    from a crashed prior run are drained (round-2 ADVICE items)."""
    out = str(tmp_path / "sink_ow_markers")
    os.makedirs(out)
    _receipts(spark, 5).write.format("delivery_sink").option("path", out).mode(
        "overwrite"
    ).save()
    assert len(os.listdir(os.path.join(out, "status"))) == 5
    # simulate a crashed prior run's abandoned staging file
    stale = os.path.join(out, "_staging", "part-deadbeef.json.gz")
    os.makedirs(os.path.dirname(stale), exist_ok=True)
    open(stale, "w").write("orphan")

    _receipts(spark, 2).write.format("delivery_sink").option("path", out).mode(
        "overwrite"
    ).save()
    markers = os.listdir(os.path.join(out, "status"))
    assert len(markers) == 2  # no phantom deliveries from the replaced commit
    assert not os.path.exists(stale)


def test_markers_follow_manifest_and_replay(spark, tmp_path):
    """The manifest rename is the commit point; markers come after and are
    re-creatable from the manifest — a crash in the marker window never
    advertises an uncommitted batch and always converges on replay."""
    out = str(tmp_path / "sink_replay")
    os.makedirs(out)
    _receipts(spark, 4).write.format("delivery_sink").option("path", out).mode(
        "append"
    ).save()
    status = os.path.join(out, "status")
    expected = sorted(os.listdir(status))
    # simulate driver crash after manifest rename but before marker writes
    for m in expected:
        os.remove(os.path.join(status, m))
    n = pyds_sink.replay_markers(out)
    assert n == 4
    assert sorted(os.listdir(status)) == expected
