"""Sampling operators.

Zap-style log sampling — emit the first ``initial`` records per
(group, interval), then every ``thereafter``-th after that — mirrors the
reference's debug-processor sampler
(`crates/otap/src/debug_processor/sampling.rs:12-40`). The reference
keeps per-key counters in process memory; the distributed form is a
window rank (one shuffle on the group key, bounded state), which is also
deterministic across retries — counters are not.

Statistical sampling maps to Spark's native ``df.sample`` (seeded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zap_sample(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    initial: int = 2,
    thereafter: int = 10,
    interval: Column | None = None,
) -> DataFrame:
    """Keep first ``initial`` rows per (group, interval), then every
    ``thereafter``-th. ``interval`` defaults to the hour of ``ts``."""
    interval = interval if interval is not None else F.date_trunc("hour", "ts")
    w = Window.partitionBy(*group_cols, interval.alias("_ivl")).orderBy(
        *order_cols
    )
    rn = F.row_number().over(w)
    out = df.withColumn("sample_rank", rn)
    c = F.col("sample_rank")
    keep = (c <= initial) | (((c - F.lit(initial)) % F.lit(thereafter)) == 0)
    return out.filter(keep)


def stat_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli sample (per-partition independent; no shuffle)."""
    return df.sample(fraction=fraction, seed=seed)
