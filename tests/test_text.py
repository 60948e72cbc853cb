"""Filename-grammar accept/reject matrix replicated verbatim from the reference
(TextParsingUtilityTest.kt:11-67) plus topic/rename/blocklist semantics."""

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.functions import text

ACCEPT = [
    ("db.core.addressDeclaration-001-002-000001.txt.gz", "core", "addressDeclaration"),
    ("db.a.b-045-050-000001.txt.gz", "a", "b"),  # single-char names (HttpWriterTest.kt:136)
    ("db.database.collection-045-050-000001.txt.gz", "database", "collection"),
    ("core.addressDeclaration-045-050-000001.txt.gz", "core", "addressDeclaration"),
    (
        "db.core-with-hyphen.addressDeclaration-045-050-000001.txt.gz",
        "core-with-hyphen",
        "addressDeclaration",
    ),
    (
        "core-with-hyphen.addressDeclaration-045-050-000001.txt.gz",
        "core-with-hyphen",
        "addressDeclaration",
    ),
    (
        "db.core-with-hyphen.address-declaration-has-hyphen-045-050-000001.txt.gz",
        "core-with-hyphen",
        "address-declaration-has-hyphen",
    ),
    (
        "core-with-hyphen.address-declaration-has-hyphen-045-050-000001.txt.gz",
        "core-with-hyphen",
        "address-declaration-has-hyphen",
    ),
]

REJECT = [
    "dbcoreaddressDeclaration-000001",
    "db.core.address-045-05001.txt",
    "bad_filename-045-050-000001",
    "db.type.nonum.txt.gz",
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [(f,) for f, _, _ in ACCEPT] + [(f,) for f in REJECT], "fileName string"
    )
    col = F.col("fileName")
    rows = df.select(
        "fileName",
        text.filename_is_valid(col).alias("valid"),
        text.extract_database(col).alias("database"),
        text.extract_collection(col).alias("collection"),
        text.derive_topic(col, text.extract_database(col), text.extract_collection(col)).alias(
            "topic"
        ),
    ).collect()
    return {r["fileName"]: r for r in rows}


def test_accept_matrix(parsed):
    for fname, db, coll in ACCEPT:
        row = parsed[fname]
        assert row["valid"], fname
        assert row["database"] == db, fname
        assert row["collection"] == coll, fname


def test_reject_matrix(parsed):
    for fname in REJECT:
        assert not parsed[fname]["valid"], fname


def test_topic_prefix_rule(parsed):
    # HttpWriter.kt:47-49: "db." prefix kept only when the filename carries it
    assert parsed["db.core.addressDeclaration-001-002-000001.txt.gz"]["topic"] == (
        "db.core.addressDeclaration"
    )
    assert parsed["core.addressDeclaration-045-050-000001.txt.gz"]["topic"] == (
        "core.addressDeclaration"
    )
    assert parsed["db.a.b-045-050-000001.txt.gz"]["topic"] == "db.a.b"


def test_renames(spark):
    df = spark.createDataFrame(
        [("db.core.claimant-045-050-000001.txt.gz.enc",)], "f string"
    )
    row = df.select(
        text.strip_enc_suffix(F.col("f")).alias("dec"),
        text.rename_output(text.strip_enc_suffix(F.col("f"))).alias("out"),
    ).collect()[0]
    assert row["dec"] == "db.core.claimant-045-050-000001.txt.gz"
    assert row["out"] == "db.core.claimant-045-050-000001.json.gz"


def test_snapshot_type_normalization():
    # NiFiUtility.kt:27-32
    assert text.normalize_snapshot_type("full") == "full"
    assert text.normalize_snapshot_type("incremental") == "incremental"
    assert text.normalize_snapshot_type("drift_testing_incremental") == "incremental"
    assert text.normalize_snapshot_type("anything-else") == "full"
    assert text.normalize_snapshot_type("") == "full"


def test_blocked_topics_parse():
    # FilterBlockedTopicsUtils.kt:18-22
    assert text.parse_blocked_topics("") == []
    assert text.parse_blocked_topics(None) == []
    assert text.parse_blocked_topics("db.a.b") == ["db.a.b"]
    assert text.parse_blocked_topics("db.a.b,db.c.d") == ["db.a.b", "db.c.d"]


def test_sentences_segmentation(spark):
    """The sentences() built-in (locale-aware BreakIterator segmentation) —
    test-only because the segmentation rules are JVM-locale-defined, not
    SQL-portable: each sentence becomes a word array, punctuation dropped."""
    df = spark.createDataFrame(
        [("The quick fox. It jumped! Done?",)], "t string"
    )
    got = df.selectExpr("sentences(t) AS s").first()["s"]
    assert [list(x) for x in got] == [
        ["The", "quick", "fox"],
        ["It", "jumped"],
        ["Done"],
    ]


def test_utf8_validation_funcs(spark):
    """Spark 4 UTF-8 validation family on genuinely invalid byte sequences
    (test-only: DuckDB VARCHARs cannot hold invalid UTF-8, so no oracle).
    Covers a lone continuation byte, a truncated 3-byte sequence, an overlong
    encoding, and a valid control string."""
    df = spark.createDataFrame(
        [("80",), ("e282",), ("c0af",), ("6f6b",)], "hex string"
    ).selectExpr(
        "hex",
        "CAST(unhex(hex) AS STRING) AS s",
        "is_valid_utf8(CAST(unhex(hex) AS STRING)) AS ok",
        "hex(encode(make_valid_utf8(CAST(unhex(hex) AS STRING)), 'UTF-8')) AS repaired",
        "try_validate_utf8(CAST(unhex(hex) AS STRING)) AS tried",
    )
    rows = {r["hex"]: r for r in df.collect()}
    assert not rows["80"]["ok"] and rows["80"]["repaired"] == "EFBFBD"  # U+FFFD
    assert not rows["e282"]["ok"] and rows["e282"]["repaired"] == "EFBFBD"
    assert not rows["c0af"]["ok"]  # overlong '/' must NOT decode to 2F
    assert "2F" not in rows["c0af"]["repaired"]
    assert rows["6f6b"]["ok"] and rows["6f6b"]["repaired"] == "6F6B" and rows["6f6b"]["tried"] == "ok"


def test_mode_deterministic_tie_break(spark):
    """mode(col, true) breaks frequency ties to the LOWEST value — the
    contract agg_mode_deterministic's oracle encodes. Both candidate orders
    must give the same answer (insertion order must not matter)."""
    a = spark.createDataFrame([(7,), (7,), (3,), (3,), (9,)], "x int")
    b = spark.createDataFrame([(3,), (3,), (7,), (7,), (9,)], "x int")
    assert a.selectExpr("mode(x, true) m").first()["m"] == 3
    assert b.selectExpr("mode(x, true) m").first()["m"] == 3


def test_soundex_classic_vector(spark):
    """American Soundex reference vector (public algorithm test cases)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Ashcraft",), ("Tymczak",), ("Pfister",)],
        "s string",
    )
    got = {r["s"]: r["sx"] for r in df.select("s", F.soundex("s").alias("sx")).collect()}
    assert got == {
        "Robert": "R163",
        "Rupert": "R163",
        "Ashcraft": "A261",
        "Tymczak": "T522",
        "Pfister": "P236",
    }


def test_histogram_numeric_mass_and_range(spark, sf_dir):
    """The adaptive histogram's centroid weights must sum to the row count
    and every centroid must lie within the data range."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    n, lo, hi = o.agg(F.count("*"), F.min("v"), F.max("v")).first()
    bins = o.agg(F.expr("histogram_numeric(v, 8)").alias("b")).first()["b"]
    assert sum(r["y"] for r in bins) == n
    assert all(lo <= r["x"] <= hi for r in bins)
    assert 1 <= len(bins) <= 8
