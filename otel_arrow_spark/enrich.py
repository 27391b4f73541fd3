"""Broadcast-hash-join enrichment stage.

Analog of the reference's attribute-dictionary accessors: the Go consumer
materializes an ``AttributesStore`` hash map and probes it while rebuilding
entities (`go/pkg/otel/common/otlp/attributes.go:42-79`). In Spark the
idiomatic form is a broadcast hash join against small lookup DataFrames —
no shuffle of the fact side, executor-local probe, exactly the hash-map
semantics at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENRICH_FIELDS = ["tool_kind", "vendor", "sla_tier", "role_group", "is_human"]


def enrich_turns(
    df: DataFrame, tool_catalog: DataFrame, role_catalog: DataFrame
) -> DataFrame:
    """Left-join tool/role metadata; unmatched ids yield nulls (never drop rows).

    Both catalogs are explicitly broadcast: the fact table keeps its
    partitioning (narrow op at any scale), matching the build-side/probe-side
    split of the reference's hash join.
    """
    tools = F.broadcast(
        tool_catalog.select(
            F.col("tool_id"),
            "tool_kind",
            F.col("vendor").alias("vendor"),
            "sla_tier",
        )
    )
    roles = F.broadcast(role_catalog.select("role", "role_group", "is_human"))
    out = df.join(tools, df["tool"] == tools["tool_id"], "left").drop("tool_id")
    out = out.join(roles, "role", "left")
    return out
