"""Arrow-native scalar UDFs (Spark 4.1 ``arrow_udf``): batches arrive as
pyarrow.Array and are processed with pyarrow.compute kernels — no pandas
materialization, no per-row Python. The third vectorized-UDF tier the engine
declares (row Python UDF → pandas UDF → arrow_udf), the one with zero
conversion overhead on the worker.

NOTE: no ``from __future__ import annotations`` here — arrow_udf resolves the
``pa.Array`` type hints at decoration time, and postponed (string) annotations
referencing a function-local import are unresolvable.
"""

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql.functions import arrow_udf


@arrow_udf("bigint")
def a_len(v: pa.Array) -> pa.Array:
    return pc.cast(pc.utf8_length(v), pa.int64())


@arrow_udf("bigint")
def a_ws_tokens(v: pa.Array) -> pa.Array:
    return pc.cast(pc.count_substring_regex(v, r"\S+"), pa.int64())


@arrow_udf("bigint")
def a_count_e(v: pa.Array) -> pa.Array:
    return pc.cast(pc.count_substring(v, "e"), pa.int64())
