"""Ordered-sequence analytics: funnel step matching and gap
sessionization.

These are the two workhorse uses of KQL's stateful ``scan`` operator
(reference grammar: `rust/experimental/query_engine/kql-parser` tabular
operators; Kusto `scan` / `row_window_session`), re-expressed as
*window compositions* instead of a row-at-a-time state machine:

- ``funnel_steps`` — earliest ordered completion of N step predicates
  per key. Step i's timestamp is ``min(order_col WHERE pred_i AND
  order_col > t_{i-1})`` over the key partition — a set-min, so the
  result is deterministic without any sort, and each step is one
  unbounded-frame Window over the SAME partitioning: Catalyst plans one
  Exchange for the whole chain, and the final per-key aggregate reuses
  that partitioning (no second shuffle).
- ``sessionize`` — gap-based session assignment (the
  ``row_window_session(ts, ∞, gap)`` shape): a lag + a running count of
  gap-exceeding boundaries. The sum consumes the lag, so Catalyst
  sequences two Window operators — but they share one Exchange and one
  Sort (same partition+order), i.e. one shuffle, one sort, no Python
  (plan-asserted in tests).

Neither needs ``applyInPandas``: the predicates are Catalyst columns
(JVM codegen) and the "state" is expressible as chained window minima /
running sums. A general multi-instance ``scan`` (several concurrent
match attempts per key) is genuinely sequential and is intentionally
not emulated here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    steps: list[tuple[str, Column]],
) -> DataFrame:
    """Earliest ordered funnel completion per key.

    Returns one row per key with ``t_<step>`` (the step's timestamp in
    the earliest chain, NULL once the chain breaks) and
    ``steps_completed``. Strictly increasing ``order_col`` between
    steps: two steps can never match the same row, and ties cannot
    chain — which is what makes the result order-free (pure set
    minima), hence identical on any engine.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    w = Window.partitionBy(*keys)
    out = df
    prev: Column | None = None
    names = []
    for name, pred in steps:
        col = f"t_{name}"
        cond = pred if prev is None else (pred & (F.col(order_col) > prev))
        out = out.withColumn(
            col, F.min(F.when(cond, F.col(order_col))).over(w)
        )
        prev = F.col(col)
        names.append(col)
    # t_* are partition-constants; min() just collapses the partition.
    agg = [F.min(c).alias(c) for c in names]
    done = F.lit(0)
    for i, c in enumerate(names):
        done = F.when(F.col(c).isNotNull(), i + 1).otherwise(done)
    return out.groupBy(*keys).agg(*agg).withColumn(
        "steps_completed", done.cast("int")
    )


def funnel_oracle_sql(
    keys: list[str],
    order_col: str,
    steps: list[tuple[str, str]],
    table: str = "events",
) -> str:
    """ANSI-SQL twin of :func:`funnel_steps` (chained window CTEs)."""
    ks = ", ".join(keys)
    part = f"PARTITION BY {ks}"
    sel, prev_cte, prev_t = None, table, None
    ctes = []
    for i, (name, pred) in enumerate(steps):
        cond = pred if prev_t is None else f"({pred}) AND {order_col} > {prev_t}"
        t = f"t_{name}"
        ctes.append(
            f"w{i} AS (SELECT *, MIN(CASE WHEN {cond} THEN {order_col} END)"
            f" OVER ({part}) AS {t} FROM {prev_cte})"
        )
        prev_cte, prev_t = f"w{i}", t
    names = [f"t_{n}" for n, _ in steps]
    done = "CASE " + " ".join(
        f"WHEN MIN({c}) IS NOT NULL THEN {i + 1}"
        for i, c in reversed(list(enumerate(names)))
    ) + " ELSE 0 END"
    mins = ", ".join(f"MIN({c}) AS {c}" for c in names)
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT {ks}, {mins}, CAST({done} AS INTEGER) AS steps_completed"
        f" FROM {prev_cte} GROUP BY {ks}"
    )


def _is_timestamp(df: DataFrame, col: str) -> bool:
    return df.schema[col].dataType.typeName().startswith("timestamp")


def sessionize(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    gap_seconds: float,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key.

    Adds ``session_id`` (0-based, per key, in ``order_col`` order): a
    new session starts when the gap to the previous row exceeds
    ``gap_seconds``. ``tiebreak`` columns make the order total when
    ``order_col`` has duplicates (required for cross-engine
    determinism). One Window operator hosts both the lag and the
    running boundary count — one shuffle, one sort.
    """
    order = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(F.col(order_col)).over(w)
    # TIMESTAMP_NTZ cannot cast to double under ANSI; timestamp_diff
    # keeps microsecond precision on both timestamp flavors. Numeric
    # order columns subtract directly.
    if _is_timestamp(df, order_col):
        gap = F.timestamp_diff("MICROSECOND", prev_ts, F.col(order_col))
        limit = F.lit(float(gap_seconds) * 1_000_000.0)
    else:
        gap = F.col(order_col) - prev_ts
        limit = F.lit(float(gap_seconds))
    boundary = F.when(prev_ts.isNull() | (gap > limit), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        (F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.lit(1)).cast("bigint"),
    )


def session_stats(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    gap_seconds: float,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-key session summary: session count, rows, longest session
    span in seconds. The per-session aggregate groups by (keys,
    session_id) — a prefix of the window partitioning plus a derived
    column, so AQE keeps it co-partitioned; the per-key rollup is a
    second map-side-combinable aggregation."""
    s = sessionize(df, keys, order_col, gap_seconds, tiebreak)
    if _is_timestamp(df, order_col):
        span = (F.timestamp_diff(
            "MICROSECOND", F.min(F.col(order_col)), F.max(F.col(order_col))
        ).cast("double") / F.lit(1_000_000.0))
    else:
        span = (F.max(F.col(order_col)) - F.min(F.col(order_col))
                ).cast("double")
    per_session = s.groupBy(*keys, "session_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        span.alias("span_s"),
    )
    return per_session.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_rows").alias("n_rows"),
        F.round(F.max("span_s"), 6).alias("max_span_s"),
    )


def sessionize_oracle_sql(
    keys: list[str],
    order_col: str,
    gap_seconds: float,
    tiebreak: list[str] | None = None,
    table: str = "events",
) -> str:
    """ANSI-SQL twin of :func:`session_stats`."""
    ks = ", ".join(keys)
    order = ", ".join([order_col] + (tiebreak or []))
    w = f"PARTITION BY {ks} ORDER BY {order}"
    gap_us = float(gap_seconds) * 1_000_000.0
    return f"""
WITH b AS (
  SELECT *, CASE WHEN LAG({order_col}) OVER ({w}) IS NULL
                 OR date_diff('microsecond',
                              LAG({order_col}) OVER ({w}), {order_col})
                    > {gap_us}
            THEN 1 ELSE 0 END AS boundary
  FROM {table}
), s AS (
  SELECT *, CAST(SUM(boundary) OVER ({w} ROWS UNBOUNDED PRECEDING) - 1
                 AS BIGINT) AS session_id
  FROM b
), per_session AS (
  SELECT {ks}, session_id, COUNT(*) AS n_rows,
         date_diff('microsecond', MIN({order_col}), MAX({order_col}))
           / 1000000.0 AS span_s
  FROM s GROUP BY {ks}, session_id
)
SELECT {ks}, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       ROUND(MAX(span_s), 6) AS max_span_s
FROM per_session GROUP BY {ks}
"""


def sequence_detect(
    df: DataFrame,
    keys: list[str],
    timeline_col: str,
    max_step_window_sec: float,
    max_duration_sec: float,
    steps: list[tuple[str, Column]],
) -> DataFrame:
    """Earliest-anchored sequence detection per key (the Kusto
    ``sequence_detect`` plugin's shape, restricted to the earliest
    chain).

    Step 1 anchors at its earliest occurrence; each later step i takes
    ``min(timeline WHERE pred_i AND t_{i-1} < timeline <= t_{i-1} +
    max_step_window)``; rows where the full chain closed within
    ``max_duration`` survive. Like :func:`funnel_steps` this is pure
    set-minima over ONE key partitioning — one Exchange, no ordering
    sensitivity, no Python. Documented subset: Kusto's plugin can also
    find sequences whose step 1 is NOT the key's earliest (a later
    anchor can succeed where the earliest one times out) and can emit
    several sequences per key; anchored-earliest detection is the
    deterministic, shuffle-minimal core (the oracle mirrors it
    exactly), and multi-instance matching remains the province of the
    ``scan`` operator's state machine.

    Output: keys, ``<step>_<timeline>`` per step, ``duration_sec``.
    """
    if len(steps) < 2:
        raise ValueError("sequence_detect needs at least two steps")
    w = Window.partitionBy(*keys)
    step_us = int(max_step_window_sec * 1_000_000)
    dur_us = int(max_duration_sec * 1_000_000)
    out = df
    prev: Column | None = None
    names = []
    for name, pred in steps:
        col = f"{name}_{timeline_col}"
        t = F.col(timeline_col)
        if prev is None:
            cond = pred
        else:
            cond = pred & (t > prev) & (
                F.timestamp_diff("MICROSECOND", prev, t) <= step_us
            )
        out = out.withColumn(col, F.min(F.when(cond, t)).over(w))
        prev = F.col(col)
        names.append(col)
    res = out.groupBy(*keys).agg(*[F.min(c).alias(c) for c in names])
    first, last = F.col(names[0]), F.col(names[-1])
    dur = F.timestamp_diff("MICROSECOND", first, last)
    return (
        res.filter(last.isNotNull() & (dur <= dur_us))
        .withColumn("duration_sec",
                    (dur / F.lit(1_000_000)).cast("double"))
    )


def sequence_detect_oracle_sql(
    keys: list[str],
    timeline_col: str,
    max_step_window_sec: float,
    max_duration_sec: float,
    steps: list[tuple[str, str]],
    table: str = "events",
) -> str:
    """ANSI-SQL twin of :func:`sequence_detect` (chained window CTEs,
    microsecond arithmetic so both engines compare integers)."""
    ks = ", ".join(keys)
    part = f"PARTITION BY {ks}"
    step_us = int(max_step_window_sec * 1_000_000)
    dur_us = int(max_duration_sec * 1_000_000)
    ctes, prev_cte, prev_t = [], table, None
    names = []
    for i, (name, pred) in enumerate(steps):
        t = f"{name}_{timeline_col}"
        if prev_t is None:
            cond = pred
        else:
            cond = (
                f"({pred}) AND {timeline_col} > {prev_t} AND "
                f"date_diff('microsecond', {prev_t}, {timeline_col})"
                f" <= {step_us}"
            )
        ctes.append(
            f"w{i} AS (SELECT *, MIN(CASE WHEN {cond} THEN "
            f"{timeline_col} END) OVER ({part}) AS {t} FROM {prev_cte})"
        )
        prev_cte, prev_t = f"w{i}", t
        names.append(t)
    mins = ", ".join(f"MIN({c}) AS {c}" for c in names)
    first, last = f"MIN({names[0]})", f"MIN({names[-1]})"
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT {ks}, {mins}, CAST(date_diff('microsecond',"
        f" {first}, {last}) AS DOUBLE) / 1000000 AS duration_sec"
        f" FROM {prev_cte} GROUP BY {ks}"
        f" HAVING {last} IS NOT NULL AND"
        f" date_diff('microsecond', {first}, {last}) <= {dur_us}"
    )
