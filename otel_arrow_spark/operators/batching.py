"""Batch sizing: split oversized / concatenate undersized units of work.

The reference accumulates per-signal batches and flushes on
``send_batch_size`` (8192) or a 200 ms timer, splitting oversized
batches via ``send_batch_max_size``
(`crates/otap/src/otap_batch_processor.rs:36-100`; slicing kernel
`rust/otel-arrow-rust/src/otap/groups.rs:108-132`; concat `:132+`).

In Spark, batch sizing is partition sizing:

- **split**: bound rows per task/file (`repartition` to a computed
  partition count, or ``maxRecordsPerFile`` at the sink);
- **concat**: merge small partitions (``coalesce`` — no shuffle — or let
  AQE coalesce post-shuffle partitions, which is ON in the session
  factory).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def split_batches(df: DataFrame, max_rows: int, total_rows: int | None = None
                  ) -> DataFrame:
    """Repartition so no partition is expected to exceed ``max_rows``.

    ``total_rows`` avoids a count job when the caller already knows it
    (e.g. from lineage); round-robin repartition gives uniform sizes.
    """
    n = total_rows if total_rows is not None else df.count()
    parts = max(1, math.ceil(n / max_rows))
    return df.repartition(parts)


def concat_batches(df: DataFrame, target_partitions: int) -> DataFrame:
    """Merge small partitions without a shuffle (coalesce)."""
    return df.coalesce(max(1, target_partitions))


def write_with_batch_limit(df: DataFrame, path: str, max_rows_per_file: int,
                           partition_by: list[str] | None = None) -> None:
    """Sink-side split: ``maxRecordsPerFile`` bounds every output file
    (the ``send_batch_max_size`` analog at the storage boundary)."""
    w = df.write.mode("overwrite").option("maxRecordsPerFile", max_rows_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
