"""foreachBatch exactly-once sink (epoch-id idempotency) and multi-topic
delivery fan-out (the reference runs one topic per job; the declarative plan
is topic-agnostic)."""

import os

from pyspark.sql import functions as F

from snapshot_sender_spark.plans import delivery
from snapshot_sender_spark.sources import fixtures as fx
from snapshot_sender_spark.streaming import windows as sw


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path):
    """foreachBatch with epoch-id bookkeeping: re-delivering an already-
    committed epoch is a no-op — the streaming analog of the .finished
    marker anti-join."""
    out_dir = str(tmp_path / "epochs")
    os.makedirs(out_dir)

    def write_epoch(df, epoch_id):
        marker = os.path.join(out_dir, f"epoch_{epoch_id}.committed")
        if os.path.exists(marker):  # already committed → skip (exactly-once)
            return
        counts = df.groupBy("event_type").count().collect()
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            for r in counts:
                fh.write(f"{r['event_type']},{r['count']}\n")
        os.replace(tmp, marker)

    events = sw.read_events_stream(spark, sf_dir)
    q = events.writeStream.foreachBatch(write_epoch).trigger(availableNow=True).start()
    q.awaitTermination()
    committed = [p for p in os.listdir(out_dir) if p.endswith(".committed")]
    assert len(committed) >= 1
    # replay the same epoch: file content unchanged (idempotent)
    before = open(os.path.join(out_dir, committed[0])).read()
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    write_epoch(batch, int(committed[0].split("_")[1].split(".")[0]))
    after = open(os.path.join(out_dir, committed[0])).read()
    assert before == after


def test_multi_topic_delivery(spark, tmp_path):
    """Three topics through ONE pipeline run: per-topic outputs, markers, and
    manifest counts all fan out from the same declarative plan."""
    root = str(tmp_path)
    topics = ["db.core.claimant", "db.other.ledger", "accounts.payments"]
    merged_input = os.path.join(root, "input")
    os.makedirs(merged_input)
    status_dir = os.path.join(root, "status")
    output_dir = os.path.join(root, "output")
    os.makedirs(status_dir)
    os.makedirs(output_dir)
    meta_lines = []
    for i, topic in enumerate(topics):
        sub = fx.generate(os.path.join(root, f"gen{i}"), topic=topic, n_files=2 + i,
                          records_per_file=5, seed=40 + i)
        for name in os.listdir(sub.input_dir):
            src = os.path.join(sub.input_dir, name)
            if name.endswith(".jsonl"):
                meta_lines.extend(open(src).read().splitlines())
            else:
                os.link(src, os.path.join(merged_input, name))
    with open(os.path.join(merged_input, "metadata.sidecar.jsonl"), "w") as fh:
        fh.write("\n".join(meta_lines) + "\n")

    cfg = delivery.RunConfig(correlation_id="multi", topic_name="*")
    result = delivery.build_decrypted(spark, merged_input, status_dir, cfg)
    manifest = delivery.deliver(result, output_dir, status_dir)
    per_topic = {r["topic"]: r["n"] for r in manifest.groupBy("topic").agg(F.count("*").alias("n")).collect()}
    assert per_topic == {
        "db.core.claimant": 2,
        "db.other.ledger": 3,
        "accounts.payments": 4,
    }
    # every file delivered + marked, across all topics
    assert len([p for p in os.listdir(output_dir) if p.endswith(".json.gz")]) == 9
    assert len([p for p in os.listdir(status_dir) if p.endswith(".finished")]) == 9
    # blocked-topic routing still works per topic in the same run
    cfg2 = delivery.RunConfig(
        correlation_id="multi2", topic_name="*",
        blocked_topics="db.other.ledger", reprocess_files=True,
    )
    result2 = delivery.build_decrypted(spark, merged_input, status_dir, cfg2)
    assert result2.blocked.count() == 3
    assert result2.delivered.count() == 6
