"""Windowed / grouped aggregations over routed turns.

Analog of (a) the reference's canonical time-bucketed count query over
exported parquet (`rust/parquet-query-examples/examples/query_logs.rs:29-45`)
and (b) the KQL ``summarize`` hash aggregation
(`rust/experimental/query_engine/expressions/src/summary/summary_data_expression.rs:9-75`).
All aggregations are plain ``groupBy().agg()`` so Catalyst applies map-side
partial aggregation; no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counts_by_sink_tool_hour(routed: DataFrame) -> DataFrame:
    """Per-sink turn counts grouped by (sink, tool, hour) — the north-star agg."""
    return (
        routed.groupBy(
            "sink",
            F.col("tool"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def counts_by_conv(routed: DataFrame) -> DataFrame:
    """Turns / distinct tools / span per conversation."""
    return routed.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("tool").alias("n_tools"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def stable_order(df: DataFrame) -> DataFrame:
    """Global stable (conv_id, turn_idx) ordering — the text-equality gate order.

    A total sort is a range-partitioned exchange; at scale prefer
    ``sortWithinPartitions`` after hash-partitioning on conv_id (done in the
    sink writes) and reserve this global sort for bounded outputs.
    """
    return df.orderBy("conv_id", "turn_idx")


def with_turn_rank(df: DataFrame) -> DataFrame:
    """Stable per-conversation ordering rank via a window.

    `Window.partitionBy(conv_id).orderBy(turn_idx)` is the skew hotspot for
    mega-conversations — callers on skewed data should bound it with
    :func:`otel_arrow_spark.ordering.salted_window_rank` instead.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_rank", F.row_number().over(w))
