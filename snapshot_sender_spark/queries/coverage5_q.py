"""Query batch 12: JSON introspection, cross-timezone conversion,
calendar-month distance, indexed-choice string functions, and the
SQL-injection-safe IDENTIFIER clause.

Timezone conversion generalizes the reference's export-date header handling
(NiFiUtility.kt:15 passes export_date through; a fleet spanning regions needs
the wall-clock mapping to be an engine op, not application code)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "json_introspect_funcs",
    oracle="""
    SELECT doc_id,
           to_json(string_split(text, ' ')[1:4]) AS head_json,
           CAST(json_array_length(to_json(string_split(text, ' ')[1:4])) AS BIGINT)
             AS arr_len,
           array_to_string(json_keys('{"doc": 1, "lang": "' || lang || '"}'), ',')
             AS obj_keys,
           json_extract_string('{"doc": 1, "lang": "' || lang || '"}', '$.lang')
             AS lang_extracted
    FROM documents WHERE doc_id < 80
    """,
    category="scalar-json",
)
def json_introspect_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON introspection: array length and object keys of runtime-built JSON
    (json_array_length / json_object_keys), plus json_tuple extraction — the
    schema-on-read probes for payloads nobody declared a schema for (§1.2:
    the reference forwards payloads unparsed; these are the first-look ops)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    head_json = F.to_json(F.slice(F.split(F.col("text"), " "), 1, 4))
    obj = F.concat(F.lit('{"doc": 1, "lang": "'), F.col("lang"), F.lit('"}'))
    return d.select(
        "doc_id",
        head_json.alias("head_json"),
        F.json_array_length(head_json).cast("bigint").alias("arr_len"),
        F.array_join(F.json_object_keys(obj), ",").alias("obj_keys"),
        F.expr(
            """json_tuple('{"doc": 1, "lang": "' || lang || '"}', 'lang')"""
        ).alias("lang_extracted"),
    )


@query(
    "date_tz_convert",
    oracle="""
    SELECT event_id,
           ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS ts_nyc,
           ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo' AS ts_tokyo,
           CAST(hour(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York') AS INT)
             AS hour_nyc
    FROM events WHERE event_id < 500
    """,
    category="scalar-date",
)
def date_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert_timezone: the same instant as wall-clock time in other zones
    (UTC→America/New_York crosses a day boundary for evening events;
    UTC→Asia/Tokyo crosses forward). Both engines consult the same IANA tzdb;
    the January data window sits outside DST transitions."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    ntz = F.col("ts").cast("timestamp_ntz")
    nyc = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), ntz)
    tokyo = F.convert_timezone(F.lit("UTC"), F.lit("Asia/Tokyo"), ntz)
    return e.select(
        "event_id",
        nyc.alias("ts_nyc"),
        tokyo.alias("ts_tokyo"),
        F.hour(nyc).cast("int").alias("hour_nyc"),
    )


@query(
    "date_months_between",
    oracle="""
    SELECT o_orderkey,
           CAST(datediff('month', date_trunc('month', o_orderdate),
                         DATE '2025-06-01') AS DOUBLE) AS months_to_ref,
           CAST(datediff('month', date_trunc('month', o_orderdate),
                         DATE '2025-06-01') // 12 AS BIGINT) AS whole_years
    FROM orders WHERE o_orderkey < 1000
    """,
    category="scalar-date",
)
def date_months_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """months_between on month-aligned dates — exactly integral by the
    31-day-month rule, so the double compares bit-for-bit with the oracle's
    calendar month difference."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    mb = F.months_between(
        F.lit("2025-06-01").cast("date"), F.date_trunc("month", "o_orderdate")
    )
    return o.select(
        "o_orderkey",
        mb.alias("months_to_ref"),
        F.floor(mb / 12).cast("bigint").alias("whole_years"),
    )


@query(
    "string_choice_funcs",
    oracle="""
    SELECT n_nationkey,
           (['alpha', 'beta', 'gamma'])[1 + n_nationkey % 3] AS chosen,
           CAST(COALESCE(list_position(string_split('AMERICA,ASIA,EUROPE', ','),
                         r_name), 0) AS INT) AS region_slot
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    category="scalar-string",
)
def string_choice_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed-choice string ops: elt (1-based positional pick) and
    find_in_set (position in a comma-list, 0 when absent) — the dispatch-table
    primitives behind topic→route mappings."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = n.join(r, n.n_regionkey == r.r_regionkey)
    return j.select(
        "n_nationkey",
        F.expr("elt(1 + n_nationkey % 3, 'alpha', 'beta', 'gamma')").alias("chosen"),
        F.expr("find_in_set(r_name, 'AMERICA,ASIA,EUROPE')").cast("int").alias(
            "region_slot"
        ),
    )


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
    FROM nation GROUP BY n_name
    """,
    category="sql",
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTIFIER() clause: table and column names supplied as runtime
    strings without string-splicing SQL (the injection-safe form of dynamic
    DDL/DML the reference's property-driven topic selection would need,
    PropertyUtility.kt:5-11)."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("ident_nation")
    return spark.sql(
        "SELECT IDENTIFIER(:col) AS n_name, COUNT(*) AS n "
        "FROM IDENTIFIER(:tab) GROUP BY IDENTIFIER(:col)",
        args={"col": "n_name", "tab": "ident_nation"},
    )


@query(
    "text_chunk_arrow_udtf",
    oracle="""
    SELECT doc_id, CAST(i // 80 AS INT) AS chunk_no,
           substring(text, CAST(i AS INT) + 1, 120) AS chunk
    FROM documents, UNNEST(range(0, length(text), 80)) AS t(i)
    """,
    category="llm-text",
)
def text_chunk_arrow_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native UDTF (Spark 4.1 ``arrow_udtf``): overlapping context
    windows (120 chars, stride 80) emitted as one pyarrow Table per offset —
    the whole batch is sliced vectorized with pyarrow.compute, no per-row
    Python. The one-to-many table-function shape text_chunk_udtf expresses
    row-at-a-time, here at Arrow batch speed."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udtf

    @arrow_udtf(returnType="doc_id bigint, chunk_no int, chunk string")
    class ArrowChunker:
        def eval(self, batch: pa.RecordBatch):
            doc_id = batch.column("doc_id")
            text = batch.column("text")
            lengths = pc.utf8_length(text)
            max_len = pc.max(lengths).as_py() or 0
            for chunk_no, off in enumerate(range(0, max_len, 80)):
                mask = pc.greater(lengths, off)
                ids = pc.filter(doc_id, mask)
                if len(ids) == 0:
                    continue
                chunks = pc.utf8_slice_codeunits(
                    pc.filter(text, mask), start=off, stop=off + 120
                )
                yield pa.table(
                    {
                        "doc_id": ids,
                        "chunk_no": pa.array([chunk_no] * len(ids), pa.int32()),
                        "chunk": chunks,
                    }
                )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return ArrowChunker(d.asTable())


@query(
    "pandas_api_groupby",
    oracle="""
    SELECT source,
           CAST(COUNT(doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
    category="pandas-api",
)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas API on Spark (pyspark.pandas): the pandas groupby/agg idiom
    compiled to the same distributed plan — the migration surface for users
    arriving from single-node pandas. The ps frame is converted back with
    to_spark() (columns only, no materialized index) so the result is the
    plain aggregate."""
    import warnings

    import pyspark.pandas as ps

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        prev = ps.get_option("compute.default_index_type")
        ps.set_option("compute.default_index_type", "distributed")
        try:
            pdf = ps.read_parquet(f"{sf_dir}/documents.parquet")
            agg = pdf.groupby("source", as_index=False).agg(
                {"doc_id": "count", "n_chars": "sum"}
            )
            out = agg.to_spark()
        finally:
            ps.set_option("compute.default_index_type", prev)
    return out.select(
        "source",
        F.col("doc_id").cast("bigint").alias("n_docs"),
        F.col("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "agg_count_if",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_large,
           CAST(COUNT(*) FILTER (WHERE day(ts) <= 15) AS BIGINT) AS n_first_half,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM events GROUP BY event_type
    """,
    category="aggregation",
)
def agg_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if — the conditional-count shorthand (≡ COUNT(*) FILTER): the
    reference's per-outcome counters (files posted vs retried vs rejected,
    MetricsConfiguration.kt:20-93) as one pass over the group."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_large"),
        F.count_if(F.dayofmonth("ts") <= 15).alias("n_first_half"),
        F.count("*").alias("n_total"),
    )


@query(
    "array_zip_inline",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ')[1:3] AS ws FROM documents
      WHERE doc_id < 60
    )
    SELECT doc_id, ws[i] AS word, CAST(length(ws[i]) AS INT) AS wlen
    FROM words, UNNEST(range(1, len(ws) + 1)) AS t(i)
    """,
    category="scalar-array",
)
def array_zip_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + inline: two parallel arrays fanned out as one row per
    element with struct fields promoted straight to columns (the
    array-of-structs explode without the intermediate col.* projection)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    d = d.withColumn("word", F.slice(F.split(F.col("text"), " "), 1, 3)).withColumn(
        "wlen", F.transform(F.col("word"), lambda w: F.length(w))
    )
    return d.select("doc_id", F.inline(F.arrays_zip("word", "wlen")))


@query(
    "multimodal_audio_energy",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx, length(text) AS nb
      FROM documents WHERE doc_id < 200
    ),
    samples AS (
      SELECT doc_id, i,
             ('0x' || substr(hx, 4*i + 3, 2))::INTEGER * 256
               + ('0x' || substr(hx, 4*i + 1, 2))::INTEGER AS u16
      FROM h, UNNEST(range(0, nb // 2)) AS t(i)
    )
    SELECT doc_id AS media_id,
           CAST(i // 8 AS INT) AS window_no,
           CAST(COUNT(*) AS INT) AS n_samples,
           CAST(SUM(CASE WHEN u16 >= 32768 THEN (u16 - 65536) * (u16 - 65536)
                         ELSE u16 * u16 END) AS BIGINT) AS energy
    FROM samples GROUP BY doc_id, i // 8
    """,
    category="llm-multimodal",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction that is NOT a stub: binary payloads decoded as
    16-bit little-endian PCM (numpy.frombuffer inside mapInPandas) and reduced
    to exact integer sum-of-squares energy per 8-sample window. The oracle
    re-derives every sample from the hex of the same bytes — decode, framing,
    odd-byte truncation and windowing all verified bit-for-bit."""
    from ..operators import multimodal

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    return multimodal.pcm16_window_energy(media)


@query(
    "map_construct_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(['type=' || event_type,
                                      'usr=' || CAST(user_id % 10 AS VARCHAR)]), ',')
             AS m_base,
           array_to_string(list_sort(['TYPE=' || event_type,
                                      'USR=' || CAST(user_id % 10 AS VARCHAR)]), ',')
             AS m_upper_keys,
           array_to_string(list_sort(['type=' || event_type,
                                      'usr=' || CAST(user_id % 10 AS VARCHAR),
                                      'day=' || CAST(day(ts) AS VARCHAR)]), ',')
             AS m_merged
    FROM events WHERE event_id < 300
    """,
    category="scalar-map",
)
def map_construct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/rewrite family: str_to_map parsing of "k=v,k=v"
    header strings (the reference's NiFi header map, NiFiUtility.kt:12-25, as
    data), transform_keys, map_concat. Maps canonicalize to sorted k=v CSV on
    both engines, so entry-order differences can't affect the hash."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)

    def canon(m):
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(m),
                    lambda kv: F.concat(kv["key"], F.lit("="), kv["value"].cast("string")),
                )
            ),
            ",",
        )

    base = F.expr("str_to_map(concat('type=', event_type, ',usr=', user_id % 10), ',', '=')")
    upper = F.map_from_arrays(
        F.transform(F.map_keys(base), F.upper), F.map_values(base)
    )
    merged = F.map_concat(
        base, F.create_map(F.lit("day"), F.dayofmonth("ts").cast("string"))
    )
    return e.select(
        "event_id",
        canon(base).alias("m_base"),
        canon(upper).alias("m_upper_keys"),
        canon(merged).alias("m_merged"),
    )


@query(
    "string_regexp_position_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'ba[a-z]+')) AS BIGINT) AS n_matches,
           CASE WHEN regexp_extract(text, 'ba[a-z]+') = '' THEN 0
                ELSE CAST(strpos(text, regexp_extract(text, 'ba[a-z]+')) AS INT)
           END AS first_pos,
           NULLIF(regexp_extract(text, 'ba[a-z]+'), '') AS first_match,
           regexp_matches(text, 's[ct]an') AS has_scan
    FROM documents
    """,
    category="scalar-string",
)
def string_regexp_position_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex position/count family: regexp_count, regexp_instr (1-based, 0
    when absent), regexp_substr (NULL when absent), regexp_like — the
    occurrence-analysis side of the regex surface (the validation side is
    string_regexp_filename's reference grammar)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("ba[a-z]+")).cast("bigint").alias("n_matches"),
        F.regexp_instr(F.col("text"), F.lit("ba[a-z]+")).cast("int").alias("first_pos"),
        F.regexp_substr(F.col("text"), F.lit("ba[a-z]+")).alias("first_match"),
        F.rlike(F.col("text"), F.lit("s[ct]an")).alias("has_scan"),
    )


@query(
    "analytics_rfm_segmentation",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(day(ts)) AS last_day,
             COUNT(*) AS freq,
             CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS monetary_cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    scored AS (
      SELECT user_id,
             NTILE(4) OVER (ORDER BY last_day, user_id) AS r_q,
             NTILE(4) OVER (ORDER BY freq, user_id) AS f_q,
             NTILE(4) OVER (ORDER BY monetary_cents, user_id) AS m_q
      FROM per_user
    )
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(m_q) AS BIGINT) AS sum_m_q
    FROM scored GROUP BY r_q, f_q
    """,
    category="analytics",
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary quartiles (NTILE
    with unique tie-break so quartile assignment is engine-exact; money in
    integer cents) rolled up to segment counts — the standard customer-value
    grid as three windows over one aggregate."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_user = e.groupBy("user_id").agg(
        F.max(F.dayofmonth("ts")).alias("last_day"),
        F.count("*").alias("freq"),
        F.sum(F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias(
            "monetary_cents"
        ),
    )
    scored = per_user.select(
        "user_id",
        F.ntile(4).over(Window.orderBy("last_day", "user_id")).alias("r_q"),
        F.ntile(4).over(Window.orderBy("freq", "user_id")).alias("f_q"),
        F.ntile(4).over(Window.orderBy("monetary_cents", "user_id")).alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q").agg(
        F.count("*").alias("n_users"), F.sum("m_q").alias("sum_m_q")
    )


@query(
    "agg_product_exact",
    oracle="""
    SELECT l_orderkey,
           product(l_linenumber) AS line_product,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem WHERE l_orderkey < 2000
    GROUP BY l_orderkey
    """,
    category="aggregation",
)
def agg_product_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCT aggregate on small integers (line numbers ≤ 7, ≤ 7 lines →
    products ≤ 7! — exact in a double regardless of multiply order, so the
    float output is engine-reproducible)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.groupBy("l_orderkey").agg(
        F.product("l_linenumber").alias("line_product"),
        F.count("*").alias("n_lines"),
    )


@query(
    "quality_referential_audit",
    oracle="""
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
      (SELECT CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders)
        AS n_null_custkey,
      (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
        AS n_dup_orderkey,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS n_orphan_orders,
      (SELECT CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
        FROM orders) AS min_price_cents,
      (SELECT CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
        FROM orders) AS max_price_cents
    """,
    category="quality",
)
def quality_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit (the Deequ-style pre-flight a 100 TB ingest runs
    before publishing): row count, null-key count, duplicate-key count,
    referential orphans (anti-join against the dimension), and value bounds —
    the scalar checks in ONE aggregation pass plus one anti-join, not six
    scans."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    stats = o.agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("o_custkey").isNull()).alias("n_null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n_dup_orderkey"),
        F.min(cents).alias("min_price_cents"),
        F.max(cents).alias("max_price_cents"),
    )
    orphans = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count("*").alias("n_orphan_orders")
    )
    return stats.crossJoin(orphans).select(
        "n_rows",
        "n_null_custkey",
        "n_dup_orderkey",
        "n_orphan_orders",
        "min_price_cents",
        "max_price_cents",
    )


@query(
    "math_int_funcs",
    oracle="""
    SELECT n_nationkey,
           CAST(factorial(n_nationkey % 12) AS BIGINT) AS fact,  -- max 11! = 39,916,800: int64-safe
           bin(n_nationkey + 1) AS bits,
           CAST((n_nationkey >> 2) & 1 AS INT) AS bit2,
           CAST(CASE WHEN (n_nationkey * 37 + 50) % 100 > 50
                       OR ((n_nationkey * 37 + 50) % 100 = 50
                           AND ((n_nationkey * 37 + 50) // 100) % 2 = 1)
                     THEN (n_nationkey * 37 + 50) // 100 + 1
                     ELSE (n_nationkey * 37 + 50) // 100 END AS BIGINT)
             AS banker_rounded
    FROM nation
    """,
    category="scalar-math",
)
def math_int_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer math extras: factorial, binary representation, bit
    extraction, and bround (banker's HALF_EVEN rounding — the money-correct
    rounding mode) on DECIMAL, stated in the oracle as pure integer
    arithmetic so every value compares exactly."""
    n = load(spark, sf_dir, "nation")
    cents = (F.col("n_nationkey") * 37 + 50).cast("decimal(12,0)")
    return n.select(
        "n_nationkey",
        F.factorial(F.col("n_nationkey") % 12).alias("fact"),
        F.bin(F.col("n_nationkey") + 1).alias("bits"),
        F.expr("getbit(n_nationkey, 2)").cast("int").alias("bit2"),
        F.bround(cents / 100, 0).cast("bigint").alias("banker_rounded"),
    )


@query(
    "string_overlay_funcs",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 3) || '###' || substr(p_name, 7) AS patched,
           CAST(strpos(p_name, 'o') AS INT) AS first_o,
           repeat(p_brand, 2) AS doubled,
           reverse(p_type) AS backwards
    FROM part WHERE p_partkey < 300
    """,
    category="scalar-string",
)
def string_overlay_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """overlay (in-place byte-range patch — the engine form of the
    reference's filename rewrites), locate, repeat, reverse. The oracle
    rebuilds overlay from substr concatenation."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.overlay("p_name", F.lit("###"), F.lit(4)).alias("patched"),
        F.locate("o", "p_name").cast("int").alias("first_o"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.reverse("p_type").alias("backwards"),
    )


@query(
    "null_zero_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 7 END
             AS null_if_zero,
           COALESCE(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                         ELSE o_orderkey % 7 END, 0) AS zero_if_null,
           CASE WHEN o_orderkey % 7 = 0 THEN 'had_null' ELSE 'had_value' END
             AS branch_nvl2,
           (o_orderstatus IS NOT DISTINCT FROM 'O') AS eq_null_safe,
           CASE WHEN isnan(CASE WHEN o_orderkey % 5 = 0 THEN 'NaN'::DOUBLE
                                ELSE CAST(o_orderkey AS DOUBLE) END)
                THEN -1.0 ELSE CAST(o_orderkey AS DOUBLE) END AS nan_guarded
    FROM orders WHERE o_orderkey < 700
    """,
    category="scalar-null",
)
def null_zero_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null/zero/NaN-normalization family (Spark 4 nullifzero/zeroifnull
    plus nvl2, null-safe equality, nanvl) — the tri-state cleanups a pipeline
    applies before aggregating sensor-style data. The oracle states each as
    its CASE definition."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 700)
    mod7 = F.col("o_orderkey") % 7
    maybe_nan = F.when(F.col("o_orderkey") % 5 == 0, F.lit(float("nan"))).otherwise(
        F.col("o_orderkey").cast("double")
    )
    return o.select(
        "o_orderkey",
        F.nullifzero(mod7).alias("null_if_zero"),
        F.zeroifnull(F.nullifzero(mod7)).alias("zero_if_null"),
        F.nvl2(F.nullifzero(mod7), F.lit("had_value"), F.lit("had_null")).alias(
            "branch_nvl2"
        ),
        F.equal_null(F.col("o_orderstatus"), F.lit("O")).alias("eq_null_safe"),
        F.nanvl(maybe_nan, F.lit(-1.0)).alias("nan_guarded"),
    )


@query(
    "date_epoch_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) AS epoch_days,
           CAST(DATE '1970-01-01'
                + INTERVAL (CAST(o_orderdate AS DATE) - DATE '1970-01-01') DAY
                AS TIMESTAMP) AS roundtrip_date,
           epoch_ms(o_orderkey * 1000 + 123) AS ts_from_millis,
           CAST(CAST(o_orderdate AS DATE)
             + CAST(CASE WHEN (8 - isodow(CAST(o_orderdate AS DATE))) % 7 = 0 THEN 7
                         ELSE (8 - isodow(CAST(o_orderdate AS DATE))) % 7 END
                    AS INTEGER) AS TIMESTAMP) AS next_monday
    FROM orders WHERE o_orderkey < 800
    """,
    category="scalar-date",
)
def date_epoch_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-integer date plumbing (unix_date / date_from_unix_date /
    timestamp_millis) and next_day — the calendar arithmetic a partition-layout
    planner uses (days-since-epoch IS the partition key at 100 TB). next_day
    is strictly-after; the oracle states the isodow modular form."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 800)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.unix_date(d).cast("int").alias("epoch_days"),
        F.date_from_unix_date(F.unix_date(d)).cast("timestamp").alias("roundtrip_date"),
        F.timestamp_millis(F.col("o_orderkey") * 1000 + 123).alias("ts_from_millis"),
        F.next_day(d, "Mon").cast("timestamp").alias("next_monday"),
    )
