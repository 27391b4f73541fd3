"""KQL-subset tabular operators as thin DataFrame combinators.

The reference parses KQL into an IR of tabular expressions and interprets
them row-at-a-time (`rust/experimental/query_engine/kql-parser/src/
tabular_expressions.rs`; engine `engine-recordset/src/engine.rs`). Here each
tabular operator is a declarative DataFrame transformation, so Catalyst
replaces both the IR optimizer (constant folding,
`expressions/src/pipeline_expression.rs:75-88`) and the interpreter with an
optimized, codegen'd physical plan — filters push to the scan, projections
prune columns.

Parity map (reference parse rule → this function):
  where    tabular_expressions.rs:327-349  → where()
  extend   tabular_expressions.rs:20-46    → extend()
  project  tabular_expressions.rs:47-115   → project()
  project-keep    :116-190                 → project_keep()
  project-away    :191-265                 → project_away()
  project-rename  :266-326                 → project_rename()
  summarize       :350-490                 → summarize()
"""

from __future__ import annotations

from fnmatch import fnmatch

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_col(e: Column | str) -> Column:
    return e if isinstance(e, Column) else F.expr(e)


def where(df: DataFrame, predicate: Column | str) -> DataFrame:
    """KQL ``where`` — keep rows matching the predicate."""
    return df.filter(_to_col(predicate))


def discard(df: DataFrame, predicate: Column | str) -> tuple[DataFrame, DataFrame]:
    """Discard-with-capture: (kept, dropped) — the engine's partition of a
    record set into included vs dropped (`expressions/src/data_expressions.rs:57-60`,
    bridge `engine-recordset-otlp-bridge/src/bridge.rs:38-100`)."""
    p = _to_col(predicate)
    return df.filter(~p), df.filter(p)


def extend(df: DataFrame, **cols: Column | str) -> DataFrame:
    """KQL ``extend`` — add computed columns."""
    return df.withColumns({k: _to_col(v) for k, v in cols.items()})


def project(df: DataFrame, *cols: Column | str, **computed: Column | str) -> DataFrame:
    """KQL ``project`` — keep named columns plus computed assignments."""
    sel = [_to_col(c) if isinstance(c, Column) else F.col(c) for c in cols]
    sel += [_to_col(v).alias(k) for k, v in computed.items()]
    return df.select(*sel)


def project_keep(df: DataFrame, *patterns: str) -> DataFrame:
    """KQL ``project-keep`` — keep columns matching names or ``*`` wildcards."""
    keep = [c for c in df.columns if any(fnmatch(c, p) for p in patterns)]
    return df.select(*keep)


def project_away(df: DataFrame, *patterns: str) -> DataFrame:
    """KQL ``project-away`` — drop columns matching names/wildcards."""
    drop = [c for c in df.columns if any(fnmatch(c, p) for p in patterns)]
    return df.drop(*drop)


def project_reorder(df: DataFrame, *patterns: str) -> DataFrame:
    """KQL ``project-reorder`` — listed (wildcard) columns move to the
    front in pattern order; unlisted columns keep their original
    relative order after them. Pure projection, zero cost."""
    front: list[str] = []
    for pat in patterns:
        for c in df.columns:
            if fnmatch(c, pat) and c not in front:
                front.append(c)
    rest = [c for c in df.columns if c not in front]
    return df.select(*front, *rest)


def project_rename(df: DataFrame, **renames: str) -> DataFrame:
    """KQL ``project-rename`` — ``new_name=old_name`` pairs."""
    return df.withColumnsRenamed({old: new for new, old in renames.items()})


def summarize(
    df: DataFrame,
    by: list[Column | str] | None = None,
    cardinality_limit: int | None = None,
    **aggs: Column,
) -> DataFrame:
    """KQL ``summarize`` — hash aggregation over group-by expressions.

    ``aggs`` values are aggregate Columns (``F.count``, ``F.sum``…), keyed by
    output alias — matching the engine's Summary aggregations
    (`expressions/src/summary/summary_data_expression.rs:9-75`).

    ``cardinality_limit`` opts into the reference's hard group cap
    (default 8192 there, `engine-recordset/src/engine.rs:25-38`,
    `summaries.rs:52-56`): excess groups are dropped deterministically
    (highest-hash first). Spark's hash agg spills instead of dropping, so
    the default here is NO cap — pass a limit only when replicating
    reference semantics exactly.
    """
    keys = [_to_col(c).alias(f"_k{i}") if isinstance(c, str) and not c.isidentifier() else _to_col(c)
            for i, c in enumerate(by or [])]
    agged = df.groupBy(*keys).agg(*[v.alias(k) for k, v in aggs.items()])
    if cardinality_limit is not None:
        # Deterministic cap without a global window: orderBy(hash).limit(cap)
        # plans as TakeOrderedAndProject — per-partition top-K then a merge of
        # K-row slices on the driver side of the exchange, never a single-task
        # funnel of all groups. (Survives 100×: each task holds ≤cap rows.)
        # The hash is content-derived sha-256 (not xxhash64) so the kept
        # group set is reproducible by any engine; key columns break ties.
        key_names = agged.columns[: len(keys)]
        agged = (
            agged.orderBy(
                group_cap_hash(*key_names), *[F.col(k) for k in key_names]
            )
            .limit(cardinality_limit)
        )
    return agged


def group_cap_hash(*key_names: str) -> Column:
    """Engine-portable deterministic group hash for the cardinality cap:
    first 8 hex chars of sha-256 over the '|'-joined key strings, as a
    bigint. DuckDB equivalent:
    ``('0x' || substr(sha256(concat_ws('|', k::VARCHAR, …)), 1, 8))::BIGINT``.
    """
    joined = F.concat_ws("|", *[F.col(k).cast("string") for k in key_names])
    return F.conv(F.substring(F.sha2(joined, 256), 1, 8), 16, 10).cast("bigint")


def bin_(col: Column | str, width: str) -> Column:
    """KQL ``bin(ts, 1h)`` → event-time bucket.

    Time widths map to ``date_trunc``/``window``; numeric widths to
    ``floor(x/w)*w`` (math IR `expressions/src/scalars/math_scalar_expression.rs:13`).
    """
    c = _to_col(col)
    unit_map = {"1h": "hour", "1d": "day", "1m": "minute", "1s": "second"}
    if width in unit_map:
        return F.date_trunc(unit_map[width], c)
    import re as _re

    m = _re.fullmatch(r"(\d+(?:\.\d+)?)(ms|d|h|m|s)", str(width))
    if m:  # general time width: floor the fractional epoch to the bucket
        mult = {"d": 86400, "h": 3600, "m": 60, "s": 1, "ms": 0.001}[m.group(2)]
        secs = float(m.group(1)) * mult
        # cast chain keeps MICROSECOND precision (unix_timestamp truncates
        # to whole seconds, which would collapse every sub-second width
        # into the x.0 bucket); the intermediate cast("timestamp") makes
        # TIMESTAMP_NTZ inputs castable to double (session tz is UTC, so
        # the epoch is unshifted).
        epoch = c.cast("timestamp").cast("double")
        return F.timestamp_seconds(F.floor(epoch / F.lit(secs)) * F.lit(secs))
    try:
        w = float(width)
    except (TypeError, ValueError):
        from otel_arrow_spark.operators.kql_parser import KqlError

        raise KqlError(f"bin(): unrecognized width {width!r}")
    return F.floor(c / F.lit(w)) * F.lit(w)


def bin_at_(col: Column | str, width: str, anchor: Column) -> Column:
    """KQL ``bin_at(ts, 1h, anchor)`` — bucketing with an explicit grid
    anchor: ``anchor + floor((x - anchor)/w)*w``. Same microsecond-safe
    epoch arithmetic as :func:`bin_`; the anchor shifts the grid so
    buckets need not align to the epoch/midnight."""
    c = _to_col(col)
    import re as _re

    m = _re.fullmatch(r"(\d+(?:\.\d+)?)(ms|d|h|m|s)", str(width))
    if not m:
        from otel_arrow_spark.operators.kql_parser import KqlError

        raise KqlError(f"bin_at(): unrecognized time width {width!r}")
    mult = {"d": 86400, "h": 3600, "m": 60, "s": 1, "ms": 0.001}[m.group(2)]
    secs = float(m.group(1)) * mult
    ec = c.cast("timestamp").cast("double")
    ea = anchor.cast("timestamp").cast("double")
    return F.timestamp_seconds(
        F.floor((ec - ea) / F.lit(secs)) * F.lit(secs) + ea
    )
