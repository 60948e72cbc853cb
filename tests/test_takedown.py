"""TAKEDOWN (GDPR / data-removal requests, round 8): delete ids from the
persisted id-carrying indexes — jaccard postings+sizes, signature bands,
IVF vectors — rewriting only affected epoch partitions, convergent on
re-run; after a takedown, re-submitting the same content (even under a new
id) is ACCEPTED by the services because the removed fingerprints are gone.
The distinct-hash indexes refuse takedown by design (no ids stored)."""

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators import dedup, index_lifecycle, similarity

POST = "t_takedown_posting_idx"
SIG = "t_takedown_sig_idx"
HASH = "t_takedown_hash_idx"


@pytest.fixture(autouse=True)
def clean_tables(spark):
    for t in (POST, POST + "_sizes", SIG, HASH):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield
    for t in (POST, POST + "_sizes", SIG, HASH):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "id long")


def test_posting_index_takedown(spark):
    # epoch 0: docs 1, 2; epoch 1: doc 3 alone (emptied by the takedown)
    p0 = spark.createDataFrame(
        [(1, 11), (1, 12), (2, 21), (2, 22), (2, 23)], "id long, h long"
    )
    p1 = spark.createDataFrame([(3, 31), (3, 32)], "id long, h long")
    dedup.append_dedup_index_epoch(spark, POST, None, "", "", epoch=0, posting=p0)
    dedup.append_dedup_index_epoch(spark, POST, None, "", "", epoch=1, posting=p1)
    assert spark.table(POST).count() == 7

    removed = dedup.takedown_dedup_index(spark, POST, _ids(spark, [1, 3, 99]))
    assert removed == 4  # 2 postings of id 1 + 2 of id 3; 99 unknown
    assert {r["id"] for r in spark.table(POST).collect()} == {2}
    assert {r["id"] for r in spark.table(POST + "_sizes").collect()} == {2}
    # epoch 1 was emptied -> its partition is gone, not silently retained
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {POST}").collect()}
    assert parts == {"epoch=0"}
    # convergent re-run: nothing left to remove
    assert dedup.takedown_dedup_index(spark, POST, _ids(spark, [1, 3])) == 0
    # probes no longer see the removed ids
    probe = spark.createDataFrame([(50, 11), (50, 12), (50, 21)], "id long, h long")
    got = dedup.incremental_jaccard_against_index(
        spark, POST, None, "", "", threshold=0.1, posting=probe
    ).collect()
    assert {r["id_existing"] for r in got} == {2}


def test_sig_index_takedown_bands(spark):
    sigs = spark.createDataFrame(
        [(10, 7), (11, 1 << 40), (12, -5)], "id long, sig long"
    )
    dedup.append_sig_index_epoch(spark, SIG, sigs, epoch=0)
    assert spark.table(SIG).count() == 12
    assert dedup.takedown_sig_index(spark, SIG, _ids(spark, [11])) == 4
    assert {r["id"] for r in spark.table(SIG).collect()} == {10, 12}
    # a probe at the removed signature finds nothing; others still match
    batch = spark.createDataFrame([(100, 1 << 40), (101, 7)], "id long, sig long")
    got = dedup.banded_hamming_pairs_against_index(spark, SIG, batch, max_hamming=0)
    assert {(r["batch_id"], r["corpus_id"]) for r in got.collect()} == {(101, 10)}


def test_hash_index_refuses_takedown(spark):
    h = spark.createDataFrame([("ab",)], "s string").select(
        F.unhex(F.md5("s")).alias("h")
    )
    dedup.append_hash_index_epoch(spark, HASH, h, epoch=0)
    with pytest.raises(ValueError, match="no id column"):
        index_lifecycle.remove_ids_from_epoch_table(spark, HASH, _ids(spark, [1]))


def test_ivf_takedown(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    vecs = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(40)],
        "id long, vec array<double>",
    )
    similarity.build_ivf_index(vecs, "vec", "id", idx, n_centroids=4, epoch=0)
    similarity.append_ivf_index_epoch(
        spark,
        idx,
        spark.createDataFrame(
            [(100 + i, [float(i % 4), 0.5, 1.0]) for i in range(8)],
            "id long, vec array<double>",
        ),
        "vec",
        "id",
        epoch=1,
    )
    before = spark.read.parquet(f"{idx}/vectors").count()
    removed = similarity.takedown_ivf_index(
        spark, idx, _ids(spark, [0, 1, 100, 999])
    )
    assert removed == 3
    after = spark.read.parquet(f"{idx}/vectors")
    assert after.count() == before - 3
    assert not {0, 1, 100} & {r["id"] for r in after.select("id").collect()}
    # convergent re-run
    assert similarity.takedown_ivf_index(spark, idx, _ids(spark, [0, 1, 100])) == 0
    # searches never return removed ids (full probe = exact over the rest)
    got = similarity.ivf_search_index(spark, idx, [0.0, 0.0, 1.0], k=50, n_probe=4)
    assert not {0, 1, 100} & {r["id"] for r in got.collect()}


def test_service_resubmission_after_takedown(spark, tmp_path):
    """The demanded end-to-end semantics: content whose id was taken down is
    ACCEPTED when re-submitted (same bytes, new id) in a later epoch —
    while untouched corpus content keeps deduplicating."""
    from snapshot_sender_spark.streaming.media_dedup_stream import (
        run_streaming_media_dedup,
    )

    table = "t_takedown_media_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    inp = str(tmp_path / "input")
    os.makedirs(inp)
    now = time.time()

    def land(k, rows):
        df = spark.createDataFrame(rows, "media_id long, content binary")
        tmp = str(tmp_path / f"stage{k}")
        df.coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(inp, f"e{k}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (now - 300 + 60 * k,) * 2)

    def sig_fn(df):  # deterministic stand-in: sig = hash of the content
        return df.select("media_id", F.xxhash64("content").alias("sig"))

    land(0, [(1, b"alpha"), (2, b"bravo")])
    run_streaming_media_dedup(
        spark, inp, table, str(tmp_path / "acc"), str(tmp_path / "ckpt"),
        signature=sig_fn,
    )
    assert dedup.takedown_sig_index(spark, table, _ids(spark, [1])) == 4
    # epoch 1: re-submission of the taken-down content under a new id is
    # accepted; a duplicate of the retained content is still dropped
    land(1, [(10, b"alpha"), (11, b"bravo")])
    run_streaming_media_dedup(
        spark, inp, table, str(tmp_path / "acc"), str(tmp_path / "ckpt"),
        signature=sig_fn,
    )
    acc = {
        (r["media_id"], int(r["epoch"]))
        for r in spark.read.parquet(str(tmp_path / "acc" / "data")).collect()
    }
    assert (10, 1) in acc and not any(m == 11 for m, _ in acc)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_takedown_reaches_compacted_partition(spark):
    """Takedown after compaction: the removed ids' rows live in the reserved
    epoch=-1 partition — the rewrite must reach it like any other epoch
    (and drop it if emptied)."""
    sigs0 = spark.createDataFrame([(1, 7), (2, 99)], "id long, sig long")
    sigs1 = spark.createDataFrame([(3, -1)], "id long, sig long")
    dedup.append_sig_index_epoch(spark, SIG, sigs0, epoch=0)
    dedup.append_sig_index_epoch(spark, SIG, sigs1, epoch=1)
    dedup.compact_sig_index(spark, SIG, [0, 1])
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {SIG}").collect()}
    assert parts == {"epoch=-1"}
    assert dedup.takedown_sig_index(spark, SIG, _ids(spark, [1, 3])) == 8
    assert {r["id"] for r in spark.table(SIG).collect()} == {2}
    # emptying the compacted partition entirely drops it too
    assert dedup.takedown_sig_index(spark, SIG, _ids(spark, [2])) == 4
    assert spark.sql(f"SHOW PARTITIONS {SIG}").count() == 0
    assert spark.table(SIG).count() == 0


def test_service_corpus_takedown(spark, tmp_path):
    """takedown_accepted_media removes the ids from the index AND the
    accepted corpus store, leaving other epochs' files untouched; a re-run
    is a no-op and re-submission is accepted."""
    from snapshot_sender_spark.streaming.media_dedup_stream import (
        run_streaming_media_dedup,
        takedown_accepted_media,
    )

    table = "t_takedown_media_full_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    inp = str(tmp_path / "input")
    os.makedirs(inp)
    now = time.time()

    def land(k, rows):
        df = spark.createDataFrame(rows, "media_id long, content binary")
        tmp = str(tmp_path / f"stage{k}")
        df.coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(inp, f"e{k}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (now - 300 + 60 * k,) * 2)

    def sig_fn(df):
        return df.select("media_id", F.xxhash64("content").alias("sig"))

    land(0, [(1, b"alpha"), (2, b"bravo")])
    land(1, [(3, b"charlie")])
    run_streaming_media_dedup(
        spark, inp, table, str(tmp_path / "acc"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, signature=sig_fn,
    )
    acc_dir = str(tmp_path / "acc")
    removed = takedown_accepted_media(spark, acc_dir, table, _ids(spark, [1, 99]))
    assert removed == 1
    left = {
        (r["media_id"], int(r["epoch"]))
        for r in spark.read.parquet(os.path.join(acc_dir, "data")).collect()
    }
    assert left == {(2, 0), (3, 1)}
    assert {r["id"] for r in spark.table(table).collect()} == {2, 3}
    # convergent re-run
    assert takedown_accepted_media(spark, acc_dir, table, _ids(spark, [1])) == 0
    # re-submission of the removed content under a new id is accepted
    land(2, [(20, b"alpha")])
    run_streaming_media_dedup(
        spark, inp, table, acc_dir, str(tmp_path / "ckpt"), signature=sig_fn,
    )
    acc = {
        (r["media_id"], int(r["epoch"]))
        for r in spark.read.parquet(os.path.join(acc_dir, "data")).collect()
    }
    assert (20, 2) in acc
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_text_service_takedown(spark, tmp_path):
    """The TEXT service's takedown: index postings + sizes + accepted corpus
    all cleaned; the removed text re-submitted under a new id is accepted
    while retained content keeps deduplicating."""
    from snapshot_sender_spark.streaming.dedup_stream import (
        run_streaming_ingestion_dedup,
        takedown_accepted_docs,
    )

    table = "t_takedown_text_idx"
    for t in (table, table + "_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    inp = str(tmp_path / "input")
    os.makedirs(inp)
    now = time.time()

    def land(k, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        tmp = str(tmp_path / f"stage{k}")
        df.coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(inp, f"e{k}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (now - 300 + 60 * k,) * 2)

    land(0, [(1, "alpha beta gamma delta"), (2, "one two three four five")])
    run_streaming_ingestion_dedup(
        spark, inp, table, str(tmp_path / "acc"), str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    removed = takedown_accepted_docs(
        spark, str(tmp_path / "acc"), table, _ids(spark, [1])
    )
    assert removed == 1
    assert {r["id"] for r in spark.table(table).collect()} == {2}
    assert {r["id"] for r in spark.table(table + "_sizes").collect()} == {2}
    # re-submission of the removed text under a new id is accepted; a dup
    # of the retained text is still dropped
    land(1, [(10, "alpha beta gamma delta"), (11, "one two three four five")])
    run_streaming_ingestion_dedup(
        spark, inp, table, str(tmp_path / "acc"), str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    acc = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "acc" / "data")).collect()
    }
    assert acc == {2, 10}
    for t in (table, table + "_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_video_service_takedown_cleans_sizes(spark, tmp_path):
    """The video (posting-mode) service's takedown must clean postings,
    the _sizes side table, AND the corpus; the sig-mode wrapper refuses the
    posting index loudly instead of leaving per-id size rows behind."""
    from snapshot_sender_spark.streaming.media_dedup_stream import (
        run_streaming_video_dedup,
        takedown_accepted_media,
        takedown_accepted_video,
    )

    table = "t_takedown_video_full_idx"
    for t in (table, table + "_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    inp = str(tmp_path / "input")
    os.makedirs(inp)
    now = time.time()

    def land(k, rows):
        df = spark.createDataFrame(rows, "media_id long, content binary")
        tmp = str(tmp_path / f"stage{k}")
        df.coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(inp, f"e{k}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (now - 300 + 60 * k,) * 2)

    def two_hashes(df):  # frame stage stand-in: 2 content-derived hashes
        return df.select(
            F.col("media_id").alias("m"), F.col("content").alias("c")
        ).selectExpr(
            "m as media_id", "stack(2, xxhash64(c), xxhash64(c, 7)) as h"
        ).selectExpr("media_id", "h")

    land(0, [(1, b"alpha"), (2, b"bravo")])
    run_streaming_video_dedup(
        spark, inp, table, str(tmp_path / "acc"), str(tmp_path / "ckpt"),
        frame_hashes=lambda df: two_hashes(df).selectExpr(
            "media_id", "h"
        ),
    )
    # sig-mode wrapper refuses the posting-mode index loudly
    with pytest.raises(ValueError, match="takedown_accepted_video"):
        takedown_accepted_media(spark, str(tmp_path / "acc"), table, _ids(spark, [1]))
    removed = takedown_accepted_video(
        spark, str(tmp_path / "acc"), table, _ids(spark, [1])
    )
    assert removed == 1
    assert {r["id"] for r in spark.table(table).collect()} == {2}
    assert {r["id"] for r in spark.table(table + "_sizes").collect()} == {2}
    assert {
        r["media_id"]
        for r in spark.read.parquet(str(tmp_path / "acc" / "data")).collect()
    } == {2}
    for t in (table, table + "_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streaming_takedown_service(spark, tmp_path):
    """Removal requests as a STREAM: per-batch takedown of index + corpus
    with audit manifests; replay with the same checkpoint is a no-op; a
    fingerprint mismatch on a collided batch id fails loudly; unknown ids
    remove nothing but are still manifested."""
    from snapshot_sender_spark.streaming.media_dedup_stream import (
        run_streaming_media_dedup,
    )
    from snapshot_sender_spark.streaming.takedown_stream import (
        run_streaming_takedown,
        takedown_manifests,
    )

    table = "t_takedown_stream_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    inp = str(tmp_path / "input")
    req = str(tmp_path / "requests")
    os.makedirs(inp)
    os.makedirs(req)
    now = time.time()

    def land(base, k, rows, schema):
        df = spark.createDataFrame(rows, schema)
        tmp = str(tmp_path / f"stage_{os.path.basename(base)}_{k}")
        df.coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(base, f"f{k}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (now - 300 + 60 * k,) * 2)

    def sig_fn(df):
        return df.select("media_id", F.xxhash64("content").alias("sig"))

    land(inp, 0, [(1, b"alpha"), (2, b"bravo"), (3, b"charlie")],
         "media_id long, content binary")
    run_streaming_media_dedup(
        spark, inp, table, str(tmp_path / "acc"), str(tmp_path / "ing_ckpt"),
        signature=sig_fn,
    )
    # two request batches: ids {1}, then {3, 999 (unknown)}
    land(req, 0, [(1,)], "id long")
    land(req, 1, [(3,), (999,)], "id long")
    got = run_streaming_takedown(
        spark, req, str(tmp_path / "acc"), table, str(tmp_path / "td_ckpt"),
        kind="media", max_files_per_trigger=1,
    )
    assert got == [0, 1]
    assert {r["id"] for r in spark.table(table).collect()} == {2}
    assert {
        r["media_id"]
        for r in spark.read.parquet(str(tmp_path / "acc" / "data")).collect()
    } == {2}
    man = takedown_manifests(str(tmp_path / "acc"))
    assert man[0]["corpus_rows_removed"] == 1 and man[0]["distinct_ids"] == 1
    assert man[1]["corpus_rows_removed"] == 1 and man[1]["distinct_ids"] == 2
    assert all(m["kind"] == "media" for m in man.values())

    # replay with the SAME checkpoint: nothing new, manifests unchanged
    again = run_streaming_takedown(
        spark, req, str(tmp_path / "acc"), table, str(tmp_path / "td_ckpt"),
        kind="media",
    )
    assert again == [] and takedown_manifests(str(tmp_path / "acc")) == man

    # fresh checkpoint + retained manifests + same requests: batch-id
    # collision (both files in one batch 0) must fail loudly
    with pytest.raises(Exception, match="fingerprint|collided"):
        run_streaming_takedown(
            spark, req, str(tmp_path / "acc"), table,
            str(tmp_path / "td_ckpt_fresh"), kind="media",
        )
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_takedown_before_any_ingestion_is_noop(spark, tmp_path):
    """Round-9 advice: a removal request arriving BEFORE any ingestion must
    be a no-op returning 0 at every level — epoch table, partitioned dir,
    IVF dir, and the three service wrappers — not an AnalysisException.
    Removal requests routinely precede (or outlive) the data."""
    from snapshot_sender_spark.streaming.dedup_stream import takedown_accepted_docs
    from snapshot_sender_spark.streaming.media_dedup_stream import (
        takedown_accepted_media,
        takedown_accepted_video,
    )

    ids = _ids(spark, [1, 2])
    missing = "t_takedown_never_created_idx"
    spark.sql(f"DROP TABLE IF EXISTS {missing}")
    assert index_lifecycle.remove_ids_from_epoch_table(spark, missing, ids) == 0
    assert dedup.takedown_dedup_index(spark, missing, ids) == 0
    assert dedup.takedown_sig_index(spark, missing, ids) == 0
    assert (
        index_lifecycle.remove_ids_from_partitioned_dir(
            spark, str(tmp_path / "no_such_dir"), "doc_id", ids
        )
        == 0
    )
    assert similarity.takedown_ivf_index(spark, str(tmp_path / "no_ivf"), ids) == 0
    # service wrappers: missing index table AND missing accepted corpus
    acc = str(tmp_path / "acc_never_ingested")
    assert takedown_accepted_docs(spark, acc, missing, ids) == 0
    assert takedown_accepted_media(spark, acc, missing, ids) == 0
    assert takedown_accepted_video(spark, acc, missing, ids) == 0
    # and the streaming service end-to-end on the empty state
    from snapshot_sender_spark.streaming.takedown_stream import (
        run_streaming_takedown,
        takedown_manifests,
    )

    req = str(tmp_path / "requests")
    os.makedirs(req)
    df = spark.createDataFrame([(1,), (2,)], "id long")
    stage = str(tmp_path / "stage_req")
    df.coalesce(1).write.parquet(stage)
    shutil.move(
        glob.glob(os.path.join(stage, "part-*.parquet"))[0],
        os.path.join(req, "f0.parquet"),
    )
    got = run_streaming_takedown(
        spark, req, acc, missing, str(tmp_path / "ckpt"), kind="media"
    )
    assert got == [0]
    man = takedown_manifests(acc)
    assert man[0]["corpus_rows_removed"] == 0
    assert man[0]["rows_removed_semantics"] == "as-of-this-run"


def test_partitioned_dir_emptied_epoch_removed(spark, tmp_path):
    """Round-9 advice: an epoch directory EMPTIED by a takedown is deleted
    (mirroring the table form's partition drop), never rewritten as an
    empty dataset — and emptying EVERY epoch leaves no data-less dirs that
    would break later schema inference."""
    data = str(tmp_path / "data")
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "doc_id long, epoch int"
    )
    df.write.partitionBy("epoch").parquet(data)
    removed = index_lifecycle.remove_ids_from_partitioned_dir(
        spark, data, "doc_id", _ids(spark, [3])
    )
    assert removed == 1
    assert not os.path.exists(os.path.join(data, "epoch=1"))
    back = spark.read.parquet(data)
    assert {r["doc_id"] for r in back.collect()} == {1, 2}
    # empty the remaining epoch too: the dir holds no epoch dirs at all
    assert (
        index_lifecycle.remove_ids_from_partitioned_dir(
            spark, data, "doc_id", _ids(spark, [1, 2])
        )
        == 2
    )
    assert not os.path.exists(os.path.join(data, "epoch=0"))
    # a takedown against the now-empty store is a clean no-op
    assert (
        index_lifecycle.remove_ids_from_partitioned_dir(
            spark, data, "doc_id", _ids(spark, [1])
        )
        == 0
    )


def test_partitioned_dir_noop_is_probed_not_swallowed(spark, tmp_path):
    """Round-9 review: the before-ingestion no-op must come from an explicit
    no-data-files probe, never from swallowing read errors — a dir holding
    only marker files is a clean 0; a dir with actual (corrupt) parquet
    RAISES instead of committing a phantom 'removed 0' success."""
    data = str(tmp_path / "data")
    os.makedirs(os.path.join(data, "_takedowns"))
    open(os.path.join(data, "_takedowns", "batch_0.json"), "w").write("{}")
    assert (
        index_lifecycle.remove_ids_from_partitioned_dir(
            spark, data, "doc_id", _ids(spark, [1])
        )
        == 0
    )
    os.makedirs(os.path.join(data, "epoch=0"))
    with open(os.path.join(data, "epoch=0", "part-0.parquet"), "wb") as fh:
        fh.write(b"not parquet at all")
    with pytest.raises(Exception):
        index_lifecycle.remove_ids_from_partitioned_dir(
            spark, data, "doc_id", _ids(spark, [1])
        )
