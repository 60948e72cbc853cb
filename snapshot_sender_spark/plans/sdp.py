"""Spark Declarative Pipelines (Spark 4.1 ``pyspark.pipelines``) executed
locally, without a Spark Connect server.

SDP is the engine's declarative orchestration layer: datasets are declared
with ``@materialized_view`` / ``@temporary_view`` decorators and the runtime
resolves the dataflow graph. The stock runner
(``pyspark.pipelines.cli``) requires Spark Connect + grpc; this module
provides the two pieces that make the same *declarations* executable on a
classic session:

* ``LocalGraphRegistry`` — a ``GraphElementRegistry`` that records the
  declared outputs/flows (the same objects the Connect registry would ship
  to the server);
* ``run_local`` — a dependency-driven executor: it repeatedly attempts each
  flow's query function, materializing finished datasets as temp views so
  downstream flows' ``spark.read.table`` / ``spark.table`` references
  resolve — a fixed-point pass over the graph instead of an explicit
  topological sort, so declaration order never matters.

The reference's pipeline (read → filter → decrypt → deliver,
JobConfiguration.kt:41-64) is exactly such a dataflow graph; SDP is its
declarative form in our engine.

At scale the same declarations run unchanged under the real SDP runner
(``spark-pipelines run``) against a Connect endpoint — this executor is the
dependency-free local form, like parquet-rewrite is for MERGE.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.errors import AnalysisException
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.sql import DataFrame, SparkSession


class LocalGraphRegistry(GraphElementRegistry):
    """Records declared graph elements (outputs, flows, sql files)."""

    def __init__(self) -> None:
        self.outputs = []
        self.flows = []
        self.sqls = []

    def register_output(self, output) -> None:
        self.outputs.append(output)

    def register_flow(self, flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        self.sqls.append((sql_text, file_path))


def run_local(spark: SparkSession, define, workdir: str | None = None) -> dict[str, DataFrame]:
    """Register the pipeline declared by ``define()`` and materialize every
    flow target as a temp view; returns {target: DataFrame}.

    Dependency resolution is by fixed point: a flow whose query still
    references an unmaterialized dataset raises AnalysisException and is
    retried after other flows complete. A full pass with no progress means
    the graph has a cycle or references a dataset nobody defines — that
    raises with the unresolved flow names.

    Streaming flows (``create_streaming_table`` + ``@append_flow``, or a
    ``@table`` whose query is streaming) are driven to completion with
    Trigger.AvailableNow into a parquet directory under ``workdir`` (one per
    target, checkpointed per flow — re-running the same workdir is
    incremental, the streaming-table contract), then exposed as the same
    temp view downstream batch flows read. Multiple append flows to one
    target append to the same directory."""
    import os
    import tempfile

    from pyspark.pipelines.output import Sink

    registry = LocalGraphRegistry()
    with graph_element_registration_context(registry):
        define()

    workdir = workdir or tempfile.mkdtemp(prefix="sdp_local_")
    sinks = {o.name: o for o in registry.outputs if isinstance(o, Sink)}
    results: dict[str, DataFrame] = {}
    pending = list(registry.flows)
    while pending:
        progressed = False
        last_err: Exception | None = None
        for fl in list(pending):
            try:
                df = fl.func()
                if fl.target in sinks:
                    # external sink: write with the sink's declared format and
                    # options; nothing is registered for downstream reads
                    # (that's the Sink contract), but a parquet sink with a
                    # path is read back into results for inspection.
                    sink = sinks[fl.target]
                    ckpt = os.path.join(workdir, "ckpt", fl.name)
                    q = (
                        df.writeStream.outputMode("append")
                        .format(sink.format)
                        .options(**dict(sink.options))
                        .option("checkpointLocation", ckpt)
                        .trigger(availableNow=True)
                        .start()
                    )
                    q.awaitTermination()
                    if sink.format == "parquet" and "path" in sink.options:
                        results[fl.target] = spark.read.parquet(sink.options["path"])
                    pending.remove(fl)
                    progressed = True
                    continue
                if df.isStreaming:
                    out = os.path.join(workdir, "data", fl.target)
                    ckpt = os.path.join(workdir, "ckpt", fl.name)
                    q = (
                        df.writeStream.outputMode("append")
                        .format("parquet")
                        .option("path", out)
                        .option("checkpointLocation", ckpt)
                        .trigger(availableNow=True)
                        .start()
                    )
                    q.awaitTermination()
                    df = spark.read.parquet(out)
                df.createOrReplaceTempView(fl.target)
            except AnalysisException as e:  # dependency not materialized yet
                last_err = e
                continue
            results[fl.target] = df
            pending.remove(fl)
            progressed = True
        if not progressed:
            names = [fl.name for fl in pending]
            raise ValueError(
                f"unresolvable pipeline flows {names}: cycle or undefined "
                f"dataset reference (last error: {last_err})"
            )
    return results
