"""Persisted distinct-hash index for the substring/chunk dedup families
(round 7): result identity against the text-corpus forms, replay idempotence,
epoch exclusion, compaction, and the bucket-aligned probe plan."""

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _final_plan(df):
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )


@pytest.fixture
def fresh_tables(spark):
    names = ["t_span_idx_test", "t_chunk_idx_test"]
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )


def test_span_index_probe_matches_text_form(spark, documents, fresh_tables):
    """The persisted-index probe is result-identical to incremental_span_stats
    on real sf0.001 documents, and the corpus side is a bucketed in-place
    scan (the whole point of persisting the index)."""
    table = fresh_tables[0]
    batch = documents.filter(F.col("source") == "src1")
    corpus = documents.filter(F.col("source") != "src1")
    expected = _rows(
        D.incremental_span_stats(batch, corpus, "text", "doc_id", k=5, min_count=2)
    )
    D.append_hash_index_epoch(
        spark, table, D.substring_index_hashes(corpus, "text", "doc_id", k=5), epoch=0
    )
    got = D.incremental_span_stats_against_index(
        spark, table, batch, "text", "doc_id", k=5, min_count=2
    )
    assert _rows(got) == expected
    plan = _final_plan(got)
    assert "Bucketed: true" in plan  # corpus read in place, never exchanged


def test_chunk_index_probe_matches_text_form(spark, documents, fresh_tables):
    table = fresh_tables[1]
    batch = documents.filter(F.col("source") == "src1")
    corpus = documents.filter(F.col("source") != "src1")
    expected = _rows(
        D.incremental_chunk_dedup(batch, corpus, "text", "doc_id", k=8)
    )
    D.append_hash_index_epoch(
        spark, table, D.chunk_index_hashes(corpus, "text", "doc_id", k=8), epoch=0
    )
    got = D.incremental_chunk_dedup_against_index(
        spark, table, batch, "text", "doc_id", k=8
    )
    assert _rows(got) == expected
    plan = _final_plan(got)
    assert "Bucketed: true" in plan
    # exactly ONE exchange on the chunk hash: the batch units side of the
    # sort-merge anti join; the winner window reuses that partitioning
    assert plan.count("Exchange hashpartitioning(h#") == 1


def test_append_is_replay_idempotent(spark, fresh_tables):
    table = fresh_tables[0]
    corpus = _docs(spark, [(1, "a b c d e f g h"), (2, "p q r s t u v w")])
    hashes = D.substring_index_hashes(corpus, "text", "doc_id", k=5)
    D.append_hash_index_epoch(spark, table, hashes, epoch=0)
    n1 = spark.table(table).count()
    D.append_hash_index_epoch(spark, table, hashes, epoch=0)  # crash replay
    assert spark.table(table).count() == n1  # overwrote its own partition


def test_exclude_epoch_hides_current_epoch(spark, fresh_tables):
    """Probing with exclude_epoch=k must not see the crashed attempt's own
    hashes — a batch doc would otherwise self-match and report its whole
    text as one duplicated span."""
    table = fresh_tables[0]
    batch = _docs(spark, [(10, "alpha beta gamma delta epsilon zeta")])
    D.append_hash_index_epoch(
        spark, table, D.substring_index_hashes(batch, "text", "doc_id", k=5), epoch=0
    )
    seen = D.incremental_span_stats_against_index(
        spark, table, batch, "text", "doc_id", k=5, min_count=2
    ).collect()
    assert seen[0]["n_spans"] == 1  # self-match via the index
    hidden = D.incremental_span_stats_against_index(
        spark, table, batch, "text", "doc_id", k=5, min_count=2, exclude_epoch=0
    ).collect()
    assert hidden[0]["n_spans"] == 0  # own epoch partition-pruned away


def test_compact_hash_index_probe_identical(spark, documents, fresh_tables):
    """Folding epoch partitions into epoch=-1 keeps every probe result
    bit-identical, shrinks the file census, collapses cross-epoch duplicate
    hashes, is a no-op on re-run, and preserves the bucketed plan."""
    table = fresh_tables[1]
    batch = documents.filter(F.col("source") == "src1")
    rest = documents.filter(F.col("source") != "src1").withColumn(
        "ep", (F.col("doc_id") % 2).cast("int")
    )
    for k in (0, 1):
        D.append_hash_index_epoch(
            spark,
            table,
            D.chunk_index_hashes(
                rest.filter(F.col("ep") == k), "text", "doc_id", k=8
            ),
            epoch=k,
        )

    def probe():
        df = D.incremental_chunk_dedup_against_index(
            spark, table, batch, "text", "doc_id", k=8
        )
        return _rows(df), _final_plan(df)

    before, plan_before = probe()
    files0 = len(spark.table(table).inputFiles())
    distinct_h = spark.table(table).select("h").distinct().count()

    moved = D.compact_hash_index(spark, table, [0, 1])
    assert moved == distinct_h  # cross-epoch dup hashes collapse in the fold
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {table}").collect()}
    assert parts == {"epoch=-1"}
    assert len(spark.table(table).inputFiles()) < files0
    assert spark.table(table).count() == distinct_h

    after, plan_after = probe()
    assert after == before
    assert "Bucketed: true" in plan_after
    assert plan_after.count("Exchange hashpartitioning(h#") == 1

    assert D.compact_hash_index(spark, table, [0, 1]) == 0  # markers outlive
    assert D.compact_hash_index(spark, table, [7]) == 0
    with pytest.raises(ValueError, match="target_epoch"):
        D.compact_hash_index(spark, table, [0, -1])

    # crash between target overwrite and source drop: epoch 0 exists in both
    # places; re-running the fold dedups by key and heals
    D.append_hash_index_epoch(
        spark,
        table,
        D.chunk_index_hashes(rest.filter(F.col("ep") == 0), "text", "doc_id", k=8),
        epoch=0,
    )
    healed = D.compact_hash_index(spark, table, [0])
    assert healed == distinct_h
    assert spark.table(table).count() == distinct_h
    assert probe()[0] == before


def test_sig_index_probe_matches_cross_form(spark, fresh_tables):
    """The persisted per-band signature index probe is result-identical to
    banded_hamming_pairs_cross, replay-idempotent, epoch-excludable, and
    compactable — the media analog of the text index tests above."""
    spark.sql("DROP TABLE IF EXISTS t_sig_idx_test")
    try:
        corpus = spark.createDataFrame(
            [(1, 0x0F0F0F0F0F0F0F0F), (2, 0x123456789ABCDEF0), (3, -42)],
            "id long, sig long",
        )
        batch = spark.createDataFrame(
            # 10 pairs with 1 at hamming 1; 11 far from everything
            [(10, 0x0F0F0F0F0F0F0F0E), (11, 0x5555AAAA5555AAAA)],
            "id long, sig long",
        )
        expected = _rows(
            D.banded_hamming_pairs_cross(batch, corpus, max_hamming=3)
        )
        assert expected, "fixture must produce at least one cross pair"
        D.append_sig_index_epoch(spark, "t_sig_idx_test", corpus, epoch=0)
        got = D.banded_hamming_pairs_against_index(
            spark, "t_sig_idx_test", batch, max_hamming=3
        )
        assert _rows(got) == expected
        plan = _final_plan(got)
        assert "Bucketed: true" in plan  # corpus bands read in place

        # replay idempotence + epoch exclusion
        D.append_sig_index_epoch(spark, "t_sig_idx_test", corpus, epoch=0)
        assert spark.table("t_sig_idx_test").count() == 3 * 4
        D.append_sig_index_epoch(spark, "t_sig_idx_test", batch, epoch=1)
        self_seen = D.banded_hamming_pairs_against_index(
            spark, "t_sig_idx_test", batch, max_hamming=3
        )
        # an id whose signature is already indexed MUST self-match at
        # hamming 0 — that is how a re-delivered media gets deduplicated
        # (the probe deliberately has NO same-id guard, unlike the cross
        # form); crash-replay safety comes from exclude_epoch instead:
        selfs = {
            (r["batch_id"], r["corpus_id"], r["hamming"])
            for r in self_seen.collect()
            if r["batch_id"] == r["corpus_id"]
        }
        assert selfs == {(10, 10, 0), (11, 11, 0)}
        hidden = D.banded_hamming_pairs_against_index(
            spark, "t_sig_idx_test", batch, max_hamming=3, exclude_epoch=1
        )
        assert _rows(hidden) == expected

        # compaction: fold both epochs, probe of epoch-1 sigs unchanged
        moved = D.compact_sig_index(spark, "t_sig_idx_test", [0, 1])
        assert moved == 5 * 4
        parts = {r[0] for r in spark.sql("SHOW PARTITIONS t_sig_idx_test").collect()}
        assert parts == {"epoch=-1"}
        after = D.banded_hamming_pairs_against_index(
            spark, "t_sig_idx_test", batch, max_hamming=3
        )
        # the folded index now also contains the batch's own sigs, which
        # correctly self-match (re-delivery semantics); every expected
        # cross pair must still survive alongside them
        got_pairs = _rows(after.select("batch_id", "corpus_id", "hamming"))
        for row in expected:
            assert row in got_pairs
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sig_idx_test")


def test_concurrent_same_epoch_hash_append_no_duplicates(spark, fresh_tables):
    """Two concurrent attempts of the SAME epoch's append (zombie-attempt
    shape) must converge to exactly one copy of the epoch's hashes — the
    dynamic-partition-overwrite contract the text posting index pins in
    test_streaming_dedup, mirrored for the round-7 hash index."""
    import threading

    table = fresh_tables[0]
    base = _docs(spark, [(1, "one two three four five six seven")])
    D.append_hash_index_epoch(
        spark, table, D.substring_index_hashes(base, "text", "doc_id", k=5), epoch=0
    )
    batch = _docs(spark, [(10, "eight nine ten eleven twelve thirteen")])
    hashes = D.substring_index_hashes(batch, "text", "doc_id", k=5)
    expected = hashes.count()  # 6 tokens → 2 distinct 5-gram hashes
    errs = []

    def attempt():
        try:
            D.append_hash_index_epoch(spark, table, hashes, epoch=1)
        except Exception as e:  # a loser MAY fail; it must not corrupt
            errs.append(e)

    threads = [threading.Thread(target=attempt) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(errs) < 2
    spark.catalog.refreshTable(table)
    assert spark.table(table).filter(F.col("epoch") == 1).count() == expected
    # epoch 0 untouched by the race
    assert spark.table(table).filter(F.col("epoch") == 0).count() == 3


def test_concurrent_same_epoch_sig_append_no_duplicates(spark):
    import threading

    spark.sql("DROP TABLE IF EXISTS t_sig_idx_race")
    try:
        base = spark.createDataFrame([(1, 111)], "id long, sig long")
        D.append_sig_index_epoch(spark, "t_sig_idx_race", base, epoch=0)
        batch = spark.createDataFrame([(10, 222), (11, 333)], "id long, sig long")
        errs = []

        def attempt():
            try:
                D.append_sig_index_epoch(spark, "t_sig_idx_race", batch, epoch=1)
            except Exception as e:
                errs.append(e)

        threads = [threading.Thread(target=attempt) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(errs) < 2
        spark.catalog.refreshTable("t_sig_idx_race")
        got = spark.table("t_sig_idx_race").filter(F.col("epoch") == 1)
        assert got.count() == 2 * 4  # one band-row set per sig, no doubles
        assert spark.table("t_sig_idx_race").filter(F.col("epoch") == 0).count() == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sig_idx_race")
