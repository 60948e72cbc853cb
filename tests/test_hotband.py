"""HOT-BAND GUARD (round 8): degenerate signature corpora — millions of
blank pages / black frames / silent clips collapsing to ONE 64-bit
signature — must never make the banded hamming join's candidate mass
quadratic in the hot-band population. The guard collapses identical
signatures to their min-id representative BEFORE banding
(operators/dedup.py:collapse_identical_sigs / banded_hamming_dropped), so
the band join runs over DISTINCT signatures only, and the keeper decision
is provably identical to the unguarded drop-higher-id-of-every-pair rule
(equivalence brute-forced here over randomized duplicate-heavy corpora).
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators import dedup
from snapshot_sender_spark.operators.dedup import _sig_bands


def _sigs_df(spark, rows):
    return spark.createDataFrame(rows, "id long, sig long")


def test_collapse_identical_sigs(spark):
    rows = [(i, 7) for i in range(10)] + [(100, -3), (101, -3), (200, 9)]
    got = {
        r["sig"]: (r["id"], r["n_members"])
        for r in dedup.collapse_identical_sigs(_sigs_df(spark, rows)).collect()
    }
    assert got == {7: (0, 10), -3: (100, 2), 9: (200, 1)}


def test_dropped_equals_unguarded_rule_bruteforce(spark):
    """Equivalence on a randomized duplicate-heavy corpus: 400 members drawn
    from a pool of 25 base signatures (some within hamming <= 3 of each
    other, some identical across many members) — the guarded drop set must
    equal the unguarded banded-pairs drop set row for row."""
    import random

    rng = random.Random(8)
    pool = []
    base = rng.getrandbits(63)
    for _ in range(25):
        if pool and rng.random() < 0.4:
            # derive a near signature: flip 1-3 bits of an existing one
            s = pool[rng.randrange(len(pool))]
            for _ in range(rng.randint(1, 3)):
                s ^= 1 << rng.randrange(64)
            pool.append(s - (1 << 64) if s >= (1 << 63) else s)
        else:
            s = rng.getrandbits(64)
            pool.append(s - (1 << 64) if s >= (1 << 63) else s)
    rows = [(i, pool[rng.randrange(len(pool))]) for i in range(400)]
    sigs = _sigs_df(spark, rows)
    unguarded = {
        r["id"]
        for r in dedup.banded_hamming_pairs(sigs, max_hamming=3)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .collect()
    }
    guarded = {r["id"] for r in dedup.banded_hamming_dropped(sigs, max_hamming=3).collect()}
    assert guarded == unguarded
    survivors = {
        r["id"] for r in dedup.banded_hamming_survivors(sigs, max_hamming=3).collect()
    }
    assert survivors == set(range(400)) - unguarded
    # survivors carry distinct signatures by construction
    by_id = dict(rows)
    surv_sigs = [by_id[i] for i in survivors]
    assert len(surv_sigs) == len(set(surv_sigs))


def test_degenerate_corpus_candidates_are_bounded(spark):
    """10^5 members, 3 distinct signatures: the band join's input is the
    collapsed rep frame — 3 sigs × 4 bands = 12 rows — regardless of the
    hot-band population. The unguarded join would stage ~(10^5/3)^2 × 4
    candidate rows per identical-sig group."""
    n = 100_000
    sigs = spark.range(n).select(
        F.col("id"), (F.col("id") % 3 * 1024).cast("long").alias("sig")
    )
    reps = dedup.collapse_identical_sigs(sigs)
    assert reps.count() == 3
    assert _sig_bands(reps.select("id", "sig")).count() == 12  # the band join input
    dropped = dedup.banded_hamming_dropped(sigs, max_hamming=3)
    # sigs 0, 1024, 2048 are pairwise hamming 1-2 apart -> one keeper total:
    # reps are ids 0,1,2; rep 0 survives, reps 1 and 2 drop against it.
    assert dropped.count() == n - 1
    survivors = dedup.banded_hamming_survivors(sigs, max_hamming=3)
    assert [r["id"] for r in survivors.collect()] == [0]


def test_media_service_degenerate_corpus(spark, tmp_path):
    """End-to-end: >= 10^4 identical-signature media through the streaming
    media dedup service complete with bounded candidates and exactly ONE
    accepted id (the global min arrives in epoch 0). The signature stage is
    a constant-sig stand-in (the guard is signature-agnostic; decode is
    exercised by the image/audio service tests)."""
    from snapshot_sender_spark.streaming.media_dedup_stream import (
        run_streaming_media_dedup,
    )

    table = "t_hotband_degenerate_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    inp = os.path.join(str(tmp_path), "input")
    os.makedirs(inp)
    now = time.time()
    n = 12_000
    for k in range(2):
        tmp = os.path.join(str(tmp_path), f"part{k}")
        (
            spark.range(n)
            .filter((F.col("id") % 2) == k)
            .select(F.col("id").alias("media_id"), F.encode(F.lit("blank"), "UTF-8").alias("content"))
            .coalesce(1)
            .write.parquet(tmp)
        )
        import glob as _glob
        import shutil as _shutil

        src = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(inp, f"epoch_{k}.parquet")
        _shutil.move(src, dst)
        os.utime(dst, (now - 200 + 100 * k,) * 2)

    def constant_sig(df):
        return df.select("media_id", F.lit(0x0123456789ABCDEF).cast("long").alias("sig"))

    run_streaming_media_dedup(
        spark,
        inp,
        table,
        os.path.join(str(tmp_path), "accepted"),
        os.path.join(str(tmp_path), "ckpt"),
        max_hamming=3,
        max_files_per_trigger=1,
        signature=constant_sig,
    )
    acc = spark.read.parquet(os.path.join(str(tmp_path), "accepted", "data"))
    assert [r["media_id"] for r in acc.collect()] == [0]
    # the index holds the single accepted signature: 4 band rows
    assert spark.table(table).count() == 4
    stats = dedup.sig_index_band_stats(spark, table).collect()
    assert len(stats) == 4 and all(r["band_df"] == 1 for r in stats)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_max_band_df_cut_documented_approximation(spark):
    """Opt-in max_band_df on the index probe: a hand-built index with one
    hot band drops that band from blocking; a pair agreeing ONLY there is
    missed (documented subset semantics), pairs agreeing on a cold band
    still match."""
    table = "t_hotband_cut_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # hand-built adversarial index: 50 sigs identical in band 0 (low 16
    # bits = 0xBEEF) but far apart elsewhere (unique high bits)
    corpus = spark.range(1000, 1050).select(
        F.col("id"),
        ((F.col("id") - 1000) * F.lit(1 << 20) + F.lit(0xBEEF)).cast("long").alias("sig"),
    )
    dedup.append_sig_index_epoch(spark, table, corpus, epoch=0)
    # batch sig matches corpus id 1000 exactly (hamming 0) — they agree on
    # ALL 4 bands, so even with band 0 cut the pair survives via bands 1-3
    batch_exact = spark.createDataFrame([(1, 0xBEEF)], "id long, sig long")
    got = dedup.banded_hamming_pairs_against_index(
        spark, table, batch_exact, max_hamming=3, max_band_df=10
    ).collect()
    assert {(r["batch_id"], r["corpus_id"], r["hamming"]) for r in got} == {(1, 1000, 0)}
    # batch sig within hamming 3 of corpus id 1001 but agreeing ONLY on the
    # hot band 0 (one bit flipped in each of bands 1, 2, 3): with the cut
    # this pair is MISSED (subset semantics), without it it is found
    sig_1001 = (1 << 20) + 0xBEEF
    probe = sig_1001 ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)
    batch_only_hot = spark.createDataFrame([(2, probe)], "id long, sig long")
    exact = dedup.banded_hamming_pairs_against_index(
        spark, table, batch_only_hot, max_hamming=3
    ).collect()
    assert any(r["corpus_id"] == 1001 and r["hamming"] == 3 for r in exact)
    cut = dedup.banded_hamming_pairs_against_index(
        spark, table, batch_only_hot, max_hamming=3, max_band_df=10
    ).collect()
    assert all(not (r["corpus_id"] == 1001) for r in cut)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_null_sigs_survive_in_both_forms(spark):
    """NULL signatures (e.g. simhash of a null text) must pass through the
    keeper decision untouched in BOTH forms: the unguarded band join never
    matches a null band, and the guard's equi-joins never match a null sig
    key — so neither form drops them, and the equivalence holds."""
    rows = [(0, 7), (1, 7), (2, None), (3, None), (4, 1024)]
    sigs = spark.createDataFrame(rows, "id long, sig long")
    unguarded = {
        r["id"]
        for r in dedup.banded_hamming_pairs(sigs, max_hamming=3)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .collect()
    }
    guarded = {r["id"] for r in dedup.banded_hamming_dropped(sigs, max_hamming=3).collect()}
    # sig 7 duplicates drop id 1; sig 1024 is hamming 4 from 7 (> budget) so
    # id 4 survives; the two null-sig ids survive everywhere
    assert guarded == unguarded == {1}
    survivors = {
        r["id"] for r in dedup.banded_hamming_survivors(sigs, max_hamming=3).collect()
    }
    assert survivors == {0, 2, 3, 4}


def test_max_band_df_on_self_join_family(spark):
    """The DISTINCT-signature band flood (the residual the identical-sig
    collapse cannot touch): 60 pairwise-distant sigs sharing band 0 while
    their bands 1-3 stay unique. With the cut, band 0 leaves blocking —
    pairs agreeing ONLY there are missed (documented subset), a pair
    agreeing on cold bands survives, and the keeper decision threads the
    knob through the rep level."""
    # sig_j: band 0 = 0xBEEF for all (hot, df 60+), bands 1-3 = j (unique)
    rows = [
        (j, 0xBEEF | (j << 20) | (j << 36) | (j << 52)) for j in range(60)
    ]
    # engineered only-hot-band pair: flip one bit in each of bands 1-3 of
    # sig_0 -> hamming 3 vs id 0, agreement only on the hot band 0
    rows.append((100, rows[0][1] ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)))
    # cold-band pair: hamming 1, agrees on bands 1-3 (each df 2 <= cut)
    X = 0x1111222233334444
    rows += [(200, X), (201, X ^ 1)]
    sigs = _sigs_df(spark, rows)
    exact = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.banded_hamming_pairs(sigs, max_hamming=3).collect()
    }
    # hamming(sig_j, sig_k) = 3*popcount(j^k): one-bit-apart j,k pairs are
    # in budget and agree ONLY on the hot band
    assert {(0, 100, 3), (200, 201, 1), (0, 1, 3)} <= exact
    cut = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.banded_hamming_pairs(
            sigs, max_hamming=3, max_band_df=10
        ).collect()
    }
    assert cut == {(200, 201, 1)}  # everything hot-band-only is missed
    # keeper decision threads the knob: under the cut only 201 is dropped
    surv_cut = {
        r["id"]
        for r in dedup.banded_hamming_survivors(
            sigs, max_hamming=3, max_band_df=10
        ).collect()
    }
    surv_exact = {
        r["id"]
        for r in dedup.banded_hamming_survivors(sigs, max_hamming=3).collect()
    }
    assert surv_cut == set(dict(rows)) - {201}
    assert surv_exact <= surv_cut  # the cut only ADDS survivors
    assert 100 in surv_cut and 100 not in surv_exact


def test_max_band_df_on_cross_form(spark):
    """Cross-form symmetry: the corpus-side hot band is cut; a batch sig
    agreeing with a corpus sig only there is missed, agreement on a cold
    band still matches."""
    corpus = _sigs_df(
        spark, [(j, 0xBEEF | (j << 20) | (j << 36) | (j << 52)) for j in range(40)]
    )
    batch = _sigs_df(
        spark,
        [
            # agrees with corpus 0 ONLY on hot band 0 (one flip per band 1-3)
            (500, (0xBEEF) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)),
            # exact copy of corpus 5: agrees on its (cold) bands 1-3 too
            (501, 0xBEEF | (5 << 20) | (5 << 36) | (5 << 52)),
        ],
    )
    exact = {
        (r["batch_id"], r["corpus_id"], r["hamming"])
        for r in dedup.banded_hamming_pairs_cross(batch, corpus).collect()
    }
    assert {(500, 0, 3), (501, 5, 0)} <= exact
    cut = {
        (r["batch_id"], r["corpus_id"], r["hamming"])
        for r in dedup.banded_hamming_pairs_cross(
            batch, corpus, max_band_df=10
        ).collect()
    }
    assert (500, 0, 3) not in cut and (501, 5, 0) in cut
    assert cut <= exact
