"""Thin table-catalog abstraction.

The reference's parquet exporter writes each payload type as its own
partitioned parquet table (`crates/otap/src/parquet_exporter.rs:1-60`,
`parquet_exporter/partition.rs:33-85`). At production scale the rebuild
targets Iceberg (atomic commits, hidden partitioning, snapshot-based
incremental reads); this sandbox has no Iceberg jars, so ``Catalog``
abstracts the table layer over plain parquet directories with the same
API shape. Swapping ``format`` to ``iceberg`` when the runtime has the
jars is the only change needed.

Iceberg provisioning attempt (round 2): no ``iceberg-spark-runtime``
jar ships in this environment's Spark install, the Python ``pyiceberg``
package is absent, and the sandbox has no network to fetch either
(maven resolution fails with name-resolution errors), so the real
format cannot be exercised here. :func:`iceberg_available` probes for
the runtime class at session start; ``tests/test_catalog.py`` runs the
table-roundtrip matrix over every available format and will pick up
``iceberg`` automatically on a runtime that carries the jars — the
mapping is: ``overwrite_partitions`` ≙ ``overwritePartitions()``,
staged-input pruning ≙ hidden partitioning + metadata pruning, the
lineage ledger ≙ snapshot history.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def available_formats(spark: SparkSession) -> list[str]:
    return ["parquet"] + (["iceberg"] if iceberg_available(spark) else [])


@dataclass
class Catalog:
    """Named tables rooted at a directory (parquet) or an Iceberg catalog."""

    spark: SparkSession
    root: str
    format: str = "parquet"
    write_options: dict[str, str] = field(default_factory=dict)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        # A parquet dir written by spark always contains a _SUCCESS marker.
        return os.path.isdir(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS"))
            or any(f.endswith(".parquet") for f in os.listdir(p))
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.format).load(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        sort_within_partitions: list[str] | None = None,
        max_records_per_file: int | None = None,
    ) -> None:
        """Write a table; optional partitioning + in-partition sort.

        ``sort_within_partitions`` mirrors the reference's
        sort-for-compression (rows sorted by resource/scope before encoding,
        `go/pkg/otel/logs/arrow/optimizer.go:44-115`) and doubles as the
        stable-ordering guarantee for the transcripts invariant.
        ``max_records_per_file`` is the batch-split analog
        (`rust/otel-arrow-rust/src/otap/groups.rs:108-131`).
        """
        if sort_within_partitions:
            df = df.sortWithinPartitions(*sort_within_partitions)
        writer = df.write.format(self.format).mode(mode)
        for k, v in self.write_options.items():
            writer = writer.option(k, v)
        if max_records_per_file is not None:
            writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(self.path(name))

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        buckets: int,
        bucket_by: list[str],
        sort_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Write a BUCKETED catalog table: rows are hash-clustered into
        ``buckets`` files per bucket key at write time, so every later
        equi-join / aggregation on that key reads co-located data and
        plans with NO Exchange — the pre-partitioning lever for 100 TB
        repeat-join workloads (pay the shuffle once at ingest, never
        again; the parquet analog of Iceberg's ``bucket(N, col)``
        partition transform). ``sort_by`` additionally orders rows
        within each bucket file, letting sort-merge joins skip their
        Sort too. Registered in the session catalog (bucketing metadata
        lives there, not in the files) at this catalog's root path;
        read back with :meth:`read_table`, not :meth:`read`."""
        writer = (
            df.write.format(self.format).mode(mode)
            .bucketBy(buckets, *bucket_by)
        )
        if sort_by:
            writer = writer.sortBy(*sort_by)
        for k, v in self.write_options.items():
            writer = writer.option(k, v)
        writer.option("path", self.path(name)).saveAsTable(name)

    def read_table(self, name: str) -> DataFrame:
        """Read a catalog-registered (e.g. bucketed) table — the
        catalog carries the bucketing spec that makes the scan's hash
        distribution visible to the planner."""
        return self.spark.table(name)

    def overwrite_partitions(self, df: DataFrame, name: str, partition_by: list[str]) -> None:
        """Dynamic partition overwrite — the idempotent-resume write primitive.

        Iceberg's overwrite-by-filter equivalent; on parquet we use Spark's
        dynamic partitionOverwriteMode so re-running a failed slice replaces
        only the partitions it owns (never blind-append on retry).
        """
        (
            df.write.format(self.format)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .save(self.path(name))
        )

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)


def normalize_to_schema(df: DataFrame, schema, strict: bool = False) -> DataFrame:
    """Normalize a batch to a known table schema before writing.

    The reference's parquet exporter must do this because OTAP treats
    columns as optional while a parquet writer needs every row group to
    carry every schema field in a fixed order
    (`crates/otap/src/parquet_exporter/schema.rs:1-60`
    `transform_to_known_schema`): missing columns are inserted as typed
    nulls, present columns are cast to the schema's type when
    compatible, and the output column order is exactly the schema's.
    Extra columns are dropped (``strict=True`` raises instead — the
    exporter's unknown-field error path).

    Nested struct fields are normalized recursively to any depth —
    missing sub-fields become typed nulls, extra sub-fields are dropped
    (or rejected under ``strict``), and sub-field order follows the
    target schema; struct-of-struct works the same at every level.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)

    def norm(src, src_type, field, path: str):
        """Normalization expression for one target field from a source
        column of ``src_type`` (recursing through struct levels)."""
        if isinstance(field.dataType, StructType) and isinstance(src_type, StructType):
            have_sub = {f.name: f for f in src_type.fields}
            if strict:
                target_names = {f.name for f in field.dataType.fields}
                unknown = [f"{path}.{n}" for n in have_sub if n not in target_names]
                if unknown:
                    raise ValueError(
                        f"unknown columns for target schema: {unknown}"
                    )
            sub = []
            for sf in field.dataType.fields:
                if sf.name in have_sub:
                    sub.append(
                        norm(src[sf.name], have_sub[sf.name].dataType, sf,
                             f"{path}.{sf.name}").alias(sf.name)
                    )
                else:
                    sub.append(F.lit(None).cast(sf.dataType).alias(sf.name))
            inner = F.struct(*sub)
            # a NULL source struct stays NULL (not a struct of nulls)
            return F.when(src.isNotNull(), inner) if field.nullable else inner
        return src.cast(field.dataType)

    have = {f.name: f for f in df.schema.fields}
    if strict:
        unknown = [c for c in df.columns if c not in {f.name for f in schema.fields}]
        if unknown:
            raise ValueError(f"unknown columns for target schema: {unknown}")

    out_cols = []
    for field in schema.fields:
        if field.name in have:
            out_cols.append(
                norm(F.col(field.name), have[field.name].dataType, field,
                     field.name).alias(field.name)
            )
        else:
            out_cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*out_cols)
