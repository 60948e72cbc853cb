"""Pure-spec Avro container codec + the ``avrofile`` range-split DataSource
(round-9): binary-encoding round trips, deflate codec, the exactly-once
byte-range split contract (per-byte boundary sweep), typed subset errors,
and the distributed scan end to end."""

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapshot_sender_spark.functions import avro_codec as A

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "bal", "type": "double"},
        {"name": "frac", "type": "float"},
        {"name": "tags", "type": {"type": "array", "items": "int"}},
        {"name": "note", "type": ["null", "string"]},
        {"name": "blob", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
    ],
}


def _rows(n):
    return [
        {
            "id": (i - n // 2) * 977,  # negative and positive zigzag paths
            "name": f"n{i}éあ",  # multi-byte utf-8
            "bal": i / 7.0,
            "frac": float(i),
            "tags": [i, -i, i * 2][: i % 4],
            "note": None if i % 3 == 0 else f"x{i}",
            "blob": bytes([i % 256, 255, 0]),
            "ok": i % 2 == 0,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_all_types(tmp_path, codec):
    rows = _rows(300)
    p = str(tmp_path / f"t_{codec}.avro")
    n = A.write_avro_file(p, SCHEMA, rows, codec=codec, block_rows=37)
    assert n == 300
    got = list(A.iter_avro_file(p))
    # float32 loses precision by type, not by codec: compare via struct repack
    import struct

    for g, r in zip(got, rows):
        assert g["frac"] == struct.unpack("<f", struct.pack("<f", r["frac"]))[0]
        g.pop("frac"), r.pop("frac")
    assert got == rows


def test_zigzag_int64_edges():
    for v in (0, -1, 1, 2**62, -(2**63), 2**63 - 1, 63, -64):
        buf = A._zigzag_encode(v)
        dec, pos = A._zigzag_decode(buf, 0)
        assert dec == v and pos == len(buf)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.text(max_size=20),
            st.floats(allow_nan=False, allow_infinity=False),
            st.one_of(st.none(), st.text(max_size=5)),
            st.binary(max_size=16),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_roundtrip_property(tmp_path_factory, rows):
    schema = {
        "type": "record",
        "name": "p",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": "double"},
            {"name": "d", "type": ["null", "string"]},
            {"name": "e", "type": "bytes"},
        ],
    }
    dicts = [dict(zip("abcde", r)) for r in rows]
    p = str(tmp_path_factory.mktemp("avro") / "prop.avro")
    A.write_avro_file(p, schema, dicts, codec="deflate", block_rows=7)
    assert list(A.iter_avro_file(p)) == dicts


def test_range_split_exactly_once(tmp_path):
    """THE distributed contract: disjoint covering byte ranges read every
    row exactly once for ANY split points — including a per-byte sweep
    across the first blocks (boundaries inside sync markers, inside block
    headers, inside data)."""
    rows = _rows(500)
    p = str(tmp_path / "split.avro")
    A.write_avro_file(p, SCHEMA, rows, block_rows=23)
    size = os.path.getsize(p)
    for nsplit in (1, 2, 3, 5, 8):
        got = []
        bounds = [round(size * k / nsplit) for k in range(nsplit + 1)]
        for lo, hi in zip(bounds, bounds[1:]):
            got.extend(r["id"] for r in A.iter_avro_range(p, lo, hi))
        assert sorted(got) == sorted(r["id"] for r in rows), nsplit
    for b in range(0, 600):  # per-byte sweep over header + first blocks
        n1 = sum(1 for _ in A.iter_avro_range(p, 0, b))
        n2 = sum(1 for _ in A.iter_avro_range(p, b, size))
        assert n1 + n2 == 500, b


def test_typed_errors(tmp_path):
    p = str(tmp_path / "x.avro")
    with pytest.raises(A.AvroUnsupported, match="snappy|codec"):
        A.write_avro_file(p, SCHEMA, [], codec="snappy")
    with pytest.raises(A.AvroUnsupported, match="nullable unions"):
        A.write_avro_file(p, {"type": "record", "name": "u", "fields": [
            {"name": "x", "type": ["int", "string"]}]}, [{"x": 1}])
    with pytest.raises(A.AvroUnsupported, match="subset"):
        A.write_avro_file(p, {"type": "record", "name": "m", "fields": [
            {"name": "x", "type": {"type": "map", "values": "int"}}]}, [{"x": {}}])
    bad = str(tmp_path / "bad.avro")
    with open(bad, "wb") as fh:
        fh.write(b"PAR1not-avro-at-all")
    with pytest.raises(A.AvroError, match="magic"):
        with open(bad, "rb") as fh:
            A.read_header(fh)
    # corrupt a block's sync marker -> loud mismatch
    A.write_avro_file(p, SCHEMA, _rows(50), block_rows=10)
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # last byte of the final sync
    open(p, "wb").write(bytes(data))
    with pytest.raises(A.AvroError, match="sync"):
        list(A.iter_avro_file(p))


def test_deflate_is_raw_rfc1951(tmp_path):
    """The spec requires RAW deflate (no zlib wrapper): the block body must
    start with a deflate bit pattern, not the 0x78 zlib header."""
    import zlib

    p = str(tmp_path / "d.avro")
    A.write_avro_file(p, SCHEMA, _rows(100), codec="deflate", block_rows=100)
    with open(p, "rb") as fh:
        _, codec, sync, hdr_end = A.read_header(fh)
        fh.seek(hdr_end)
        buf = fh.read(40)
    _, pos = A._zigzag_decode(buf, 0)  # count
    nbytes, pos = A._zigzag_decode(buf, pos)  # size
    body = open(p, "rb").read()[hdr_end + pos : hdr_end + pos + nbytes]
    assert body[:1] != b"\x78"  # not zlib-wrapped
    zlib.decompress(body, wbits=-15)  # raw inflate succeeds


def test_avrofile_datasource_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    rows = _rows(800)
    for k in range(3):
        A.write_avro_file(
            str(tmp_path / f"f{k}.avro"), SCHEMA,
            rows[k * 300 : (k + 1) * 300], codec="deflate", block_rows=29,
        )
    df = spark.read.format("avrofile").option("split_bytes", 2048).load(str(tmp_path))
    assert df.schema.simpleString() == (
        "struct<id:bigint,name:string,bal:double,frac:float,"
        "tags:array<int>,note:string,blob:binary,ok:boolean>"
    )
    got = df.agg(
        F.count("*").alias("n"),
        F.sum("id").alias("s"),
        F.count("note").alias("notes"),
        F.sum(F.size("tags")).alias("tagn"),
    ).first()
    assert got["n"] == len(rows)
    assert got["s"] == sum(r["id"] for r in rows)
    assert got["notes"] == sum(1 for r in rows if r["note"] is not None)
    assert got["tagn"] == sum(len(r["tags"]) for r in rows)
    # the range splitter actually fanned out (many ranges per file)
    reader = avro_pyds.AvroFileReader({"path": str(tmp_path), "split_bytes": "2048"})
    assert len(reader.partitions()) > 3


def test_avrofile_user_schema_projects_by_name(spark, tmp_path):
    """Round-9 review: a user-supplied .schema(...) must bind by FIELD NAME,
    never positionally — a reordered schema gets reordered values, an
    unknown column fails loudly."""
    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    A.write_avro_file(str(tmp_path / "f.avro"), SCHEMA, _rows(10), block_rows=5)
    df = (
        spark.read.format("avrofile")
        .schema("name string, id bigint")  # reordered subset
        .load(str(tmp_path))
    )
    got = {r["id"]: r["name"] for r in df.collect()}
    assert got == {(i - 5) * 977: f"n{i}éあ" for i in range(10)}
    with pytest.raises(Exception, match="not in the Avro writer schema"):
        spark.read.format("avrofile").schema("nope int").load(str(tmp_path)).collect()


def test_avrofile_distributed_write_commit_protocol(spark, tmp_path):
    """Distributed write path: one staged container per task, visible only
    after the all-or-nothing commit (_MANIFEST.json); overwrite replaces the
    previous commit wholesale INCLUDING a crashed run's staging leftovers;
    data round-trips exactly."""
    from pyspark.sql import functions as F

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "out")
    df = spark.range(5000).select(
        "id",
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        (F.col("id") / 7.0).alias("bal"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id").cast("string"))
        .alias("note"),
    )
    df.repartition(5).write.format("avrofile").mode("overwrite").save(d)
    files = [f for f in os.listdir(d) if f.endswith(".avro")]
    assert len(files) == 5
    import json

    man = json.load(open(os.path.join(d, "_MANIFEST.json")))
    assert man["total_rows"] == 5000
    assert sorted(e["file"] for e in man["files"]) == sorted(files)
    back = spark.read.format("avrofile").load(d)
    got = back.agg(
        F.count("*").alias("n"), F.sum("id").alias("s"), F.count("note").alias("k")
    ).first()
    assert (got["n"], got["s"], got["k"]) == (5000, 5000 * 4999 // 2, 3333)
    # plant a fake crashed-run leftover; overwrite must clear staging, keep
    # the just-replaced generation ONE overwrite (in-flight-reader grace,
    # round 10 — pinned in test_avrofile_overwrite_gc_keeps_one_generation)
    open(os.path.join(d, "_staging", "part-deadbeef.avro"), "wb").write(b"junk")
    df.limit(70).repartition(2).write.format("avrofile").mode("overwrite").save(d)
    assert spark.read.format("avrofile").load(d).count() == 70
    assert len([f for f in os.listdir(d) if f.endswith(".avro")]) == 7  # 2 new + 5 grace
    assert os.listdir(os.path.join(d, "_staging")) == []
    assert json.load(open(os.path.join(d, "_MANIFEST.json")))["total_rows"] == 70
    # the NEXT overwrite sweeps the graced generation
    df.limit(10).coalesce(1).write.format("avrofile").mode("overwrite").save(d)
    assert len([f for f in os.listdir(d) if f.endswith(".avro")]) == 3  # 1 new + 2 grace
    assert spark.read.format("avrofile").load(d).count() == 10


def test_avrofile_write_rejects_unsupported_spark_types(spark, tmp_path):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    df = spark.range(3).select(F.create_map(F.lit("k"), F.col("id")).alias("m"))
    with pytest.raises(Exception, match="no Avro mapping"):
        df.write.format("avrofile").mode("overwrite").save(str(tmp_path / "x"))


def test_avrofile_write_empty_dataframe_round_trips(spark, tmp_path):
    """An all-empty write must commit a readable dataset (one header-only
    container carrying the schema), mirroring parquet's empty-part
    behavior — not a directory the reader rejects."""
    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "empty")
    df = spark.range(10).filter("id < 0").select(
        "id", (1.0 * __import__("pyspark").sql.functions.col("id")).alias("v")
    )
    df.write.format("avrofile").mode("overwrite").save(d)
    back = spark.read.format("avrofile").load(d)
    assert back.count() == 0
    assert back.schema.simpleString() == "struct<id:bigint,v:double>"


def test_avrofile_append_merges_manifest_and_guards_schema(spark, tmp_path):
    """APPEND semantics: new task files join the dataset, _MANIFEST.json
    describes the WHOLE committed dataset (not just the last write), and an
    append with a different writer schema is refused up front — the reader
    derives its schema from the first file, so a silent mixed-schema
    dataset would misread one cohort."""
    import json

    from pyspark.sql import functions as F

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "ds")
    df = spark.range(100).select("id", (F.col("id") * 2.0).alias("v"))
    df.repartition(2).write.format("avrofile").mode("overwrite").save(d)
    spark.range(100, 150).select("id", (F.col("id") * 2.0).alias("v")) \
        .repartition(1).write.format("avrofile").mode("append").save(d)
    back = spark.read.format("avrofile").load(d)
    assert back.count() == 150
    man = json.load(open(os.path.join(d, "_MANIFEST.json")))
    assert man["total_rows"] == 150
    assert len(man["files"]) == 3
    # schema-mismatched append refused
    bad = spark.range(5).select("id", F.col("id").cast("string").alias("v"))
    with pytest.raises(Exception, match="append schema differs"):
        bad.write.format("avrofile").mode("append").save(d)
    # an all-empty append adds nothing and keeps the manifest intact
    df.filter("id < 0").write.format("avrofile").mode("append").save(d)
    assert spark.read.format("avrofile").load(d).count() == 150
    assert json.load(open(os.path.join(d, "_MANIFEST.json")))["total_rows"] == 150


def test_avrofile_null_array_elements_roundtrip(spark, tmp_path):
    """Round-9 second-review: Spark arrays default containsNull=True, so a
    null element must survive the write (the unfixed encoder stringified it
    to the literal 'None')."""
    from pyspark.sql import functions as F

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "narr")
    df = spark.createDataFrame(
        [(0, ["a", None, "c"]), (1, [None]), (2, [])],
        "id long, xs array<string>",
    )
    df.write.format("avrofile").mode("overwrite").save(d)
    got = {r["id"]: r["xs"] for r in spark.read.format("avrofile").load(d).collect()}
    assert got == {0: ["a", None, "c"], 1: [None], 2: []}


def test_avrofile_reader_resolves_through_manifest(spark, tmp_path):
    """The manifest IS the commit point: a data file in the root that the
    manifest does not own (a crashed commit's orphan) is invisible to
    readers; a manifest naming a missing file fails loudly."""
    import json

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "ds")
    spark.range(50).write.format("avrofile").mode("overwrite").save(d)
    # orphan: a file from a hypothetical crashed commit
    A.write_avro_file(
        os.path.join(d, "part-orphan.avro"),
        {"type": "record", "name": "row",
         "fields": [{"name": "id", "type": ["null", "long"]}]},
        [{"id": 999}],
    )
    assert spark.read.format("avrofile").load(d).count() == 50  # orphan unseen
    # manifest naming a missing file -> loud error
    man = json.load(open(os.path.join(d, "_MANIFEST.json")))
    man["files"].append({"file": "part-gone.avro", "rows": 1})
    json.dump(man, open(os.path.join(d, "_MANIFEST.json"), "w"))
    with pytest.raises(Exception, match="missing data files"):
        spark.read.format("avrofile").load(d).count()


def test_avrofile_concurrent_appends_merge_manifest(spark, tmp_path):
    """Two concurrent appends to one dataset: the per-path mutation lock
    serializes the manifest read-merge-write, so BOTH jobs' entries survive
    (unlocked, last-writer-wins dropped one side's files from the
    manifest)."""
    import json
    import threading

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "ds")
    spark.range(10).write.format("avrofile").mode("overwrite").save(d)
    barrier = threading.Barrier(2)
    errs = []

    def append(lo):
        try:
            # a fresh Python thread maps to a JVM thread with NO active
            # session, and the Python DataSource registry is session-scoped
            # (lookup falls back to the classpath and dies with
            # ClassNotFoundException: avrofile.DefaultSource) — pin it
            spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            barrier.wait(timeout=30)
            spark.range(lo, lo + 20).repartition(1).write.format(
                "avrofile"
            ).mode("append").save(d)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [threading.Thread(target=append, args=(100,)),
          threading.Thread(target=append, args=(200,))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errs, errs
    man = json.load(open(os.path.join(d, "_MANIFEST.json")))
    assert man["total_rows"] == 50
    assert spark.read.format("avrofile").load(d).count() == 50


def test_write_avro_file_no_tmp_litter_on_encode_failure(tmp_path):
    """A bad row mid-stream must not strand a partial .tmp (retried
    distributed tasks would accumulate orphans in _staging)."""
    p = str(tmp_path / "x.avro")
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"}]}

    def rows():
        yield {"a": 1}
        yield {"a": "not-an-int-and-not-coercible" + "x"}

    with pytest.raises(Exception):
        A.write_avro_file(p, schema, rows(), block_rows=1)
    assert os.listdir(str(tmp_path)) == []


def test_count_avro_rows_block_skipping(tmp_path):
    """count_avro_rows sums block-header counts without decoding payloads —
    equal to the full iteration on both codecs and multi-block files."""
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"c_{codec}.avro")
        A.write_avro_file(p, SCHEMA, _rows(157), codec=codec, block_rows=20)
        assert A.count_avro_rows(p) == 157
        assert sum(1 for _ in A.iter_avro_file(p)) == 157


def test_read_header_grows_past_64kib(tmp_path):
    """Round-10 advice: a valid container whose schema exceeds the 64 KiB
    initial buffer must parse (the buffer grows), not die with a misleading
    'truncated varint'."""
    wide = {
        "type": "record",
        "name": "wide",
        "fields": [
            {"name": f"field_{i:06d}_padpadpadpadpad", "type": ["null", "long"]}
            for i in range(2000)
        ],
    }
    import json as _j

    assert len(_j.dumps(wide)) > (1 << 16)  # the schema alone exceeds 64 KiB
    p = str(tmp_path / "wide.avro")
    row = {f"field_{i:06d}_padpadpadpadpad": (i if i % 7 == 0 else None)
           for i in range(2000)}
    A.write_avro_file(p, wide, [row])
    with open(p, "rb") as fh:
        schema, codec, sync, pos = A.read_header(fh)
    assert len(schema["fields"]) == 2000 and pos > (1 << 16)
    got = list(A.iter_avro_file(p))
    assert got[0]["field_000000_padpadpadpadpad"] == 0
    # a genuinely truncated header still fails loudly
    with open(p, "rb") as fh:
        head = fh.read(1000)
    q = str(tmp_path / "trunc.avro")
    with open(q, "wb") as fh:
        fh.write(head)
    with pytest.raises(A.AvroError):
        with open(q, "rb") as fh:
            A.read_header(fh)


def test_avrofile_append_onto_manifestless_seeds_existing(spark, tmp_path):
    """Round-10 advice (medium): appending onto a MANIFEST-LESS dataset
    (hand-built *.avro fixtures) must publish a manifest that also names the
    pre-existing files — before the fix, _list_files preferred the new
    manifest and every pre-existing file went silently invisible."""
    import json

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "ds")
    os.makedirs(d)
    # non-nullable id: matches spark.range's writer schema (the append path
    # enforces writer-schema equality; evolution is out of scope)
    schema = {"type": "record", "name": "row",
              "fields": [{"name": "id", "type": "long"}]}
    # two hand-built files, no manifest (the fixture layout the reader's
    # glob fallback supports)
    A.write_avro_file(os.path.join(d, "fix-a.avro"), schema,
                      [{"id": i} for i in range(30)])
    A.write_avro_file(os.path.join(d, "fix-b.avro"), schema,
                      [{"id": i} for i in range(30, 50)])
    assert spark.read.format("avrofile").load(d).count() == 50
    spark.range(100, 110).write.format("avrofile").mode("append").save(d)
    man = json.load(open(os.path.join(d, "_MANIFEST.json")))
    named = {e["file"] for e in man["files"]}
    assert {"fix-a.avro", "fix-b.avro"} <= named
    assert man["total_rows"] == 60
    got = sorted(r["id"] for r in spark.read.format("avrofile").load(d).collect())
    assert got == list(range(50)) + list(range(100, 110))


def test_avrofile_overwrite_gc_keeps_one_generation(spark, tmp_path):
    """Round-10 advice: overwrite GC must not delete the just-replaced
    commit's files (a reader that resolved the OLD manifest may be
    mid-scan); they survive ONE generation and the NEXT overwrite sweeps
    them. Crashed-commit orphans (owned by neither manifest) still go
    immediately."""
    import json

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "ds")
    spark.range(10).write.format("avrofile").mode("overwrite").save(d)
    gen1 = {e["file"] for e in json.load(open(os.path.join(d, "_MANIFEST.json")))["files"]}
    spark.range(20).write.format("avrofile").mode("overwrite").save(d)
    on_disk = set(os.listdir(d))
    assert gen1 <= on_disk  # gen1 kept for in-flight readers
    assert spark.read.format("avrofile").load(d).count() == 20  # but invisible
    spark.range(5).write.format("avrofile").mode("overwrite").save(d)
    on_disk = set(os.listdir(d))
    assert not (gen1 & on_disk)  # swept by the NEXT overwrite
    assert spark.read.format("avrofile").load(d).count() == 5


def test_read_header_corruption_fails_fast_without_buffering(tmp_path):
    """A corruption error that more bytes can never fix (oversized varint)
    must re-raise immediately — NOT retry-and-buffer the whole file (a
    corrupt multi-GB header would otherwise be held in RAM with O(n²)
    reparses)."""
    p = str(tmp_path / "bad.avro")
    # magic + a varint of 10 continuation bytes (>64 bits) + junk padding
    with open(p, "wb") as fh:
        fh.write(b"Obj\x01" + b"\xff" * 10 + b"\x00" * (1 << 17))
    t0 = __import__("time").perf_counter()
    with pytest.raises(A.AvroError, match="varint longer"):
        with open(p, "rb") as fh:
            A.read_header(fh)
    assert __import__("time").perf_counter() - t0 < 1.0  # no reparse loop


def test_avrofile_manifestless_seed_excludes_own_crashed_parts(spark, tmp_path):
    """Finding pin: manifest-less seeding must NOT resurrect a crashed
    commit's own part-<32hex>.avro orphans (moved before the manifest flip)
    — only genuinely foreign fixture files seed."""
    import json
    import uuid

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    d = str(tmp_path / "ds")
    os.makedirs(d)
    schema = {"type": "record", "name": "row",
              "fields": [{"name": "id", "type": "long"}]}
    A.write_avro_file(os.path.join(d, "fixture.avro"), schema,
                      [{"id": i} for i in range(5)])
    # simulate a crashed prior append: our writer's own naming, no manifest
    orphan = f"part-{uuid.uuid4().hex}.avro"
    A.write_avro_file(os.path.join(d, orphan), schema, [{"id": 999}])
    spark.range(100, 103).write.format("avrofile").mode("append").save(d)
    man = json.load(open(os.path.join(d, "_MANIFEST.json")))
    named = {e["file"] for e in man["files"]}
    assert "fixture.avro" in named
    assert orphan not in named  # the crashed attempt's rows stay invisible
    got = sorted(r["id"] for r in spark.read.format("avrofile").load(d).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102]  # 999 not resurrected


def test_avrofile_datasource_reads_wide_schema_past_64kib(spark, tmp_path):
    """The header-growth fix end-to-end through the DataSource: a container
    whose schema alone exceeds the 64 KiB initial buffer must scan correctly
    (spark_ddl_for + range planning + per-task read_header all reparse the
    grown header)."""
    from pyspark.sql import functions as F

    from snapshot_sender_spark.sources import avro_pyds

    avro_pyds.register(spark)
    nf = 2000
    wide = {
        "type": "record",
        "name": "wide",
        "fields": [
            {"name": f"field_{i:06d}_padpadpadpadpad", "type": ["null", "long"]}
            for i in range(nf)
        ],
    }
    rows = [
        {f"field_{i:06d}_padpadpadpadpad": (r * nf + i if (i + r) % 5 == 0 else None)
         for i in range(nf)}
        for r in range(6)
    ]
    d = str(tmp_path)
    A.write_avro_file(os.path.join(d, "wide.avro"), wide, rows, block_rows=2)
    df = spark.read.format("avrofile").load(os.path.join(d, "wide.avro"))
    assert len(df.schema.fields) == nf
    got = df.agg(
        F.count("*").alias("n"),
        F.sum("field_000000_padpadpadpadpad").alias("s0"),
        F.sum(f"field_{nf-1:06d}_padpadpadpadpad").alias("slast"),
    ).first()
    assert got["n"] == 6
    assert got["s0"] == sum(r * nf for r in range(6) if r % 5 == 0)
    assert got["slast"] == sum(
        r * nf + (nf - 1) for r in range(6) if (nf - 1 + r) % 5 == 0
    )
