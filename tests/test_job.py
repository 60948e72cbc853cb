"""Full job orchestration (§3.1/§3.2): delivered-topic path, empty-topic path
(Received + implicit success indicator), heartbeat skip, and the connected-
components operator."""

import gzip
import json
import os

from pyspark.sql import functions as F

from snapshot_sender_spark.operators.graph import connected_components
from snapshot_sender_spark.plans import delivery, job
from snapshot_sender_spark.sources import fixtures as fx


def test_full_job_delivered_topic(spark, tmp_path):
    f = fx.generate(str(tmp_path), n_files=4, records_per_file=6, seed=31)
    cfg = delivery.RunConfig(correlation_id="job-1", topic_name=f.topic)
    report = job.run_delivery_job(
        spark,
        f.input_dir,
        f.status_dir,
        f.output_dir,
        str(tmp_path / "status_table"),
        cfg,
        files_exported=4,
    )
    assert report.files_delivered == 4
    assert report.records_parsed == 24
    assert report.collection_status == "Sent"
    assert report.completion_status == "COMPLETED_SUCCESSFULLY"
    assert report.success_indicator and os.path.basename(report.success_indicator) == (
        "_core_claimant_successful.gz"
    )
    msg = json.loads(report.monitoring_message)
    assert msg["custom_elements"][1]["value"] == "job-1"
    assert report.counters.get("snapshot_sender_files_sent_success") == 4
    # outputs + markers on disk
    assert len([p for p in os.listdir(f.output_dir) if p.endswith(".json.gz")]) == 4


def test_full_job_empty_topic(spark, tmp_path):
    """§3.2: zero files exported → Received + success indicator anyway."""
    empty_in = str(tmp_path / "input")
    os.makedirs(empty_in)
    with open(os.path.join(empty_in, "metadata.sidecar.jsonl"), "w"):
        pass
    cfg = delivery.RunConfig(correlation_id="job-empty", topic_name="db.database.empty")
    report = job.run_delivery_job(
        spark,
        empty_in,
        str(tmp_path / "status"),
        str(tmp_path / "out"),
        str(tmp_path / "status_table"),
        cfg,
        files_exported=0,
    )
    assert report.files_delivered == 0
    assert report.collection_status == "Received"
    assert report.completion_status == "COMPLETED_SUCCESSFULLY"
    assert report.success_indicator is not None
    with open(report.success_indicator, "rb") as fh:
        assert gzip.decompress(fh.read()) == b""


def test_full_job_heartbeat_skips_monitoring(spark, tmp_path):
    f = fx.generate(str(tmp_path), n_files=1, records_per_file=2, seed=33)
    cfg = delivery.RunConfig(
        correlation_id="hb", topic_name=f.topic, export_date="NIFI_HEARTBEAT"
    )
    report = job.run_delivery_job(
        spark, f.input_dir, f.status_dir, f.output_dir, str(tmp_path / "st"), cfg
    )
    assert report.monitoring_message is None  # JobCompletionNotificationListener.kt:60-75


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)], "id_a long, id_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_chain_diameter(spark):
    # a long path graph exercises multi-round propagation
    edges = spark.createDataFrame([(i, i + 1) for i in range(30)], "id_a long, id_b long")
    out = connected_components(edges)
    comps = out.select(F.countDistinct("component").alias("c")).first()["c"]
    assert comps == 1
    assert out.filter(F.col("component") != 0).count() == 0 or (
        out.filter(F.col("component") == 0).count() == 31
    )


def test_full_job_with_pushgateway_lifecycle(spark, tmp_path):
    """run_delivery_job with a gateway wires the reference's metrics
    lifecycle: scheduled pushes while the job runs, a final push carrying the
    job's observed counters, then delete of the per-job grouping key
    (type/correlation_id/topic_name/export_date)."""

    class Gw:
        def __init__(self):
            self.events = []

        def push(self, job_name, grouping, counters):
            self.events.append(("push", job_name, dict(grouping), dict(counters)))

        def delete(self, job_name, grouping):
            self.events.append(("delete", job_name, dict(grouping)))

    f = fx.generate(str(tmp_path), n_files=3, records_per_file=2, seed=41)
    cfg = delivery.RunConfig(correlation_id="job-gw", topic_name=f.topic)
    gw = Gw()
    report = job.run_delivery_job(
        spark,
        f.input_dir,
        f.status_dir,
        f.output_dir,
        str(tmp_path / "status_table"),
        cfg,
        files_exported=3,
        gateway=gw,
        push_rate=0.05,
        initial_delay=0.01,
        scrape_interval=0.01,
    )
    assert report.files_delivered == 3
    kinds = [e[0] for e in gw.events]
    assert kinds[-1] == "delete" and kinds[-2] == "push" and kinds.count("push") >= 1
    final = gw.events[-2]
    assert final[1] == "snapshot_sender"
    assert final[2] == {
        "type": cfg.snapshot_type,
        "correlation_id": "job-gw",
        "topic_name": f.topic,
        "export_date": cfg.export_date,
    }
    assert final[3].get("snapshot_sender_files_sent_success") == 3
    assert gw.events[-1][2] == final[2]


def test_full_job_final_push_outage_does_not_discard_report(spark, tmp_path):
    """A gateway outage at the FINAL push must not abort run_delivery_job:
    delivery side effects are already committed, so the JobReport is returned
    and the error is recorded — the reference's pushFinalMetrics runs in
    afterJob's finally block where a listener exception does not fail the
    completed Spring Batch job."""

    class DownGw:
        def push(self, job_name, grouping, counters):
            raise ConnectionError("pushgateway unreachable")

        def delete(self, job_name, grouping):
            raise ConnectionError("pushgateway unreachable")

    f = fx.generate(str(tmp_path), n_files=2, records_per_file=2, seed=42)
    cfg = delivery.RunConfig(correlation_id="job-gw-down", topic_name=f.topic)
    report = job.run_delivery_job(
        spark,
        f.input_dir,
        f.status_dir,
        f.output_dir,
        str(tmp_path / "status_table"),
        cfg,
        files_exported=2,
        gateway=DownGw(),
        push_rate=5.0,
        initial_delay=5.0,  # no scheduled push fires; only push_final hits the outage
        scrape_interval=0.01,
    )
    assert report.files_delivered == 2
    assert report.counters.get("snapshot_sender_files_sent_success") == 2
