"""The declared query surface — SURVEY.md §2B — verified against the DuckDB oracle.

Each QueryDef pairs a Spark implementation (``fn(spark, sf_dir) → DataFrame``)
with an equivalent ANSI-SQL string DuckDB can run on the same parquet tables
(``oracle``; None for genuinely non-SQL-expressible operators → the driver
records a rows-only check).

Cross-engine float determinism: the driver hash-compares values, and
``round()`` is NOT portable across Spark and DuckDB (Java BigDecimal HALF_UP on
the shortest decimal string vs C rounding of the binary double — e.g.
round(2.675, 2) differs). Every float column here is therefore made
bit-deterministic instead:
  * sums/avgs of 2-decimal money columns go through DECIMAL (exact,
    order-independent) and are cast back to DOUBLE at the end;
  * vector math is quantized to integers ≤ 2^53 (exact in either integer or
    float arithmetic, order-free) before any division;
  * remaining float ops are same-input/same-op arithmetic (x−y, a/b), which is
    bitwise identical on both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    category: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, category: str = ""):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # import side-effect: modules register into REGISTRY
    from . import (  # noqa: F401
        analytics_q,
        bpe_q,
        codec_q,
        corrupt_q,
        coverage2_q,
        coverage3_q,
        coverage4_q,
        coverage5_q,
        curation_q,
        graph_q,
        llm,
        llm2,
        quality_q,
        relational,
        relational2,
        scalar3_q,
        scale_q,
        sources_q,
        spark4_q,
        spark41_q,
        sql2_q,
        streamingq,
        table_q,
        table2_q,
        tpch2_q,
        tpch_q,
    )

    return REGISTRY
