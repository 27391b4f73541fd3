"""Traces + metrics star-schema tables derived from transcript turns.

The reference's unit of data is a per-signal *set* of Arrow tables:
traces = SPANS / SPAN_EVENTS / SPAN_LINKS (+ per-table attrs),
metrics = UNIVARIATE_METRICS + per-point-type data-point tables
(NUMBER / HISTOGRAM …) with exemplars
(`/root/reference/docs/data_model.md:309-416` traces,
`:19-237` metrics; payload slots `rust/otel-arrow-rust/src/otap.rs:278,406`).
OTLP reconstruction walks the star schema with cursor-based sort-merge
joins over `parent_id` (`rust/otel-arrow-rust/src/otlp/common.rs:467-570`).

Here the same model is derived from the transcripts table:

- **span** = a tool-call turn (``role='tool' AND tool IS NOT NULL`` — the
  router's `sink_traces` rule). A span closes at the next tool-call turn
  of the conversation, or at conversation end.
- **span event** = any non-span turn, attached to the nearest *preceding*
  span of its conversation (log records enclosed by the span).
- **span link** = "continuation" edge to the previous span of the same
  conversation that called the *same tool* (retry/continuation analog of
  OTLP span links).
- **metric point** = a metric-like turn (the router's `sink_metrics`
  rule); NUMBER_DATA_POINTS carry the turn's parsed numeric value,
  HISTOGRAM_DATA_POINTS aggregate points into fixed explicit-bound
  buckets, exemplars are high-value points linked back to the enclosing
  span (`docs/data_model.md:60-76` exemplar shape).

IDs are content-derived (sha-256 prefixes of ``conv_id[:turn_idx]``) so
they are deterministic across engines, retries, and partitionings — the
role the parquet exporter's ``PartitionSequenceIdGenerator`` plays for
uniqueness (`crates/otap/src/parquet_exporter/idgen.rs:30-102`) without
any sequential state.

Scale design (100 TB): :func:`signal_base` computes *every* per-turn
derived column — current/previous span, next-span time, conversation end
— in a **single Window operator** (one shuffle on ``conv_id`` + one
sort by ``turn_idx``; the four window expressions share the partition
and ordering, only frames differ). Everything downstream is either a
narrow projection/filter of that pass, a tiny-dimension broadcast join
(metric-name ids), or a map-side-combinable aggregation (histograms).
Mega-conversation skew: the window partition is a whole conversation;
conversations are bounded in practice (≤~10^6 turns), and the two-phase
range-bucketed pattern in `ordering.salted_window_rank` is the drop-in
replacement if they are not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Explicit histogram bucket bounds (reference: HISTOGRAM_DATA_POINTS carry
# explicit_bounds + bucket_counts lists, docs/data_model.md:100-147).
# len(bounds)+1 buckets: (-inf,10], (10,25], (25,50], (50,75], (75,90], (90,+inf)
HIST_BOUNDS = [10.0, 25.0, 50.0, 75.0, 90.0]

SPAN_KIND_CLIENT = 3          # OTLP SpanKind.CLIENT — a tool call
STATUS_UNSET, STATUS_OK, STATUS_ERROR = 0, 1, 2
EXEMPLAR_MIN_VALUE = 90.0     # points at/above this become exemplars


def _is_span() -> Column:
    return (F.col("role") == "tool") & F.col("tool").isNotNull()


def signal_keys(routed: DataFrame) -> DataFrame:
    """Narrow, per-row signal identity columns — ``trace_id`` and
    ``span_key`` (non-null on span turns), both content-derived sha-256
    prefixes. Shared by the batch window pass (:func:`signal_base`) and
    the streaming stateful derivation
    (`streaming.pipeline.streaming_spans`), so batch and stream assign
    identical ids by construction."""
    return routed.withColumns(
        {
            "trace_id": F.substring(F.sha2(F.col("conv_id"), 256), 1, 32),
            "span_key": F.when(
                _is_span(),
                F.substring(
                    F.sha2(
                        F.concat_ws(
                            ":", F.col("conv_id"),
                            F.col("turn_idx").cast("string"),
                        ),
                        256,
                    ),
                    1, 16,
                ),
            ),
        }
    )


def signal_base(routed: DataFrame) -> DataFrame:
    """Single-pass per-turn signal derivation over parsed+routed turns.

    Input: ``route_turns(parse_turns(transcripts))`` output (needs
    ``conv_id, turn_idx, role, tool, ts`` + parsed fields + ``sink``).

    Adds: ``trace_id``, ``span_key`` (non-null on span turns),
    ``cur_span_id`` (nearest preceding-or-self span), ``prev_span_id``
    (nearest strictly-preceding span), ``next_span_ts`` (start of the
    next span turn), ``conv_end_ts``. One Window operator total.
    """
    base = signal_keys(routed).withColumn(
        "_span_ts", F.when(_is_span(), F.col("ts"))
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return base.withColumns(
        {
            "cur_span_id": F.last("span_key", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            "prev_span_id": F.last("span_key", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            "next_span_ts": F.first("_span_ts", ignorenulls=True).over(
                w.rowsBetween(1, Window.unboundedFollowing)
            ),
            "conv_end_ts": F.max("ts").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        }
    ).drop("_span_ts")


# ---------------------------------------------------------------------------
# traces
# ---------------------------------------------------------------------------

def spans_table(base: DataFrame) -> DataFrame:
    """SPANS (`docs/data_model.md:318-340`): narrow filter+project of the
    signal_base pass. parent_span_id chains to the previous span of the
    conversation; duration runs to the next span start or conversation
    end; status derives from the parsed syslog severity (≤3 = error)."""
    end_ts = F.coalesce(F.col("next_span_ts"), F.col("conv_end_ts"))
    return base.filter(F.col("span_key").isNotNull()).select(
        F.col("trace_id"),
        F.col("span_key").alias("span_id"),
        F.col("prev_span_id").alias("parent_span_id"),
        F.coalesce(
            F.col("event_name"), F.concat(F.lit("tool:"), F.col("tool"))
        ).alias("name"),
        F.lit(SPAN_KIND_CLIENT).alias("kind"),
        F.col("ts").alias("start_ts"),
        end_ts.alias("end_ts"),
        F.timestamp_diff("MICROSECOND", F.col("ts"), end_ts).alias("duration_us"),
        F.when(F.col("severity").isNull(), STATUS_UNSET)
        .when(F.col("severity") <= 3, STATUS_ERROR)
        .otherwise(STATUS_OK)
        .alias("status_code"),
        F.col("tool"),
        F.col("host"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def span_events_table(base: DataFrame) -> DataFrame:
    """SPAN_EVENTS (`docs/data_model.md:341-360`): every non-span turn
    attached to the nearest preceding span (`parent_id` FK). Turns before
    the first span of a conversation have no enclosing span and are
    dropped (matching OTLP: events exist only inside a span)."""
    return base.filter(
        F.col("span_key").isNull() & F.col("cur_span_id").isNotNull()
    ).select(
        F.col("cur_span_id").alias("parent_span_id"),
        F.substring(
            F.sha2(
                F.concat_ws(
                    ":", F.col("conv_id"), F.col("turn_idx").cast("string")
                ),
                256,
            ),
            1, 16,
        ).alias("event_id"),
        F.coalesce(F.col("event_name"), F.col("format")).alias("name"),
        F.col("ts").alias("time_ts"),
        F.col("severity"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def span_links_table(spans: DataFrame) -> DataFrame:
    """SPAN_LINKS (`docs/data_model.md:361-380`): continuation edges —
    each span links to the previous span of the same conversation that
    called the same tool. Window partition is (conv_id, tool): strictly
    smaller partitions than the base pass, spans only. ``link_id`` is
    the content-derived primary key SPAN_LINK_ATTRS points back at
    (the id → parent_id FK of the closed star schema,
    `proto/.../arrow_service.proto:65-104` SPAN_LINK_ATTRS=45)."""
    w = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    return (
        spans.withColumns(
            {
                "linked_span_id": F.lag("span_id").over(w),
                "linked_turn_idx": F.lag("turn_idx").over(w),
            }
        )
        .filter(F.col("linked_span_id").isNotNull())
        .select(
            F.substring(
                F.sha2(
                    F.concat_ws(
                        ":", F.col("conv_id"),
                        F.col("turn_idx").cast("string"), F.lit("link"),
                    ),
                    256,
                ),
                1, 16,
            ).alias("link_id"),
            F.col("span_id").alias("parent_span_id"),
            F.col("trace_id").alias("linked_trace_id"),
            "linked_span_id",
            "linked_turn_idx",
            F.lit("continuation").alias("trace_state"),
            "conv_id",
            "turn_idx",
            "tool",
        )
    )


def span_attrs_table(base: DataFrame) -> DataFrame:
    """SPAN_ATTRS EAV (`docs/data_model.md:296-306` shape): the parsed
    kv attrs of span turns, tall-skinny with a type discriminant."""
    return base.filter(
        F.col("span_key").isNotNull() & F.col("attrs").isNotNull()
    ).select(
        F.col("span_key").alias("parent_id"),
        F.explode(F.col("attrs")).alias("key", "str_value"),
        F.lit("str").alias("value_type"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def span_event_attrs_table(base: DataFrame) -> DataFrame:
    """SPAN_EVENT_ATTRS EAV (`docs/data_model.md:296-306` shape;
    payload slot SPAN_EVENT_ATTRS=44 in the closed enum
    `proto/.../arrow_service.proto:65-104`): the parsed kv attrs of
    *event* turns, keyed by the same content-derived event_id
    :func:`span_events_table` assigns — the id → parent_id FK the OTLP
    reconstruction walks (`rust/otel-arrow-rust/src/otlp/common.rs:467-570`).
    Narrow filter + explode of the signal_base pass, no extra shuffle."""
    return base.filter(
        F.col("span_key").isNull()
        & F.col("cur_span_id").isNotNull()
        & F.col("attrs").isNotNull()
    ).select(
        F.substring(
            F.sha2(
                F.concat_ws(
                    ":", F.col("conv_id"), F.col("turn_idx").cast("string")
                ),
                256,
            ),
            1, 16,
        ).alias("parent_id"),
        F.explode(F.col("attrs")).alias("key", "str_value"),
        F.lit("str").alias("value_type"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def span_link_attrs_table(links: DataFrame) -> DataFrame:
    """SPAN_LINK_ATTRS EAV (payload slot 45): per-link attributes with
    the reference's sparse typed-value columns (`docs/data_model.md:
    296-306` — one nullable column per value type, discriminated by
    ``value_type``). Two attrs per link: the tool (str) and the turn
    gap to the linked span (int). Narrow projection of the LINKS
    relation — the link window already ran."""
    gap = (F.col("turn_idx") - F.col("linked_turn_idx")).cast("long")
    tool_row = links.select(
        F.col("link_id").alias("parent_id"),
        F.lit("link.tool").alias("key"),
        F.lit("str").alias("value_type"),
        F.col("tool").alias("str_value"),
        F.lit(None).cast("long").alias("int_value"),
        "conv_id",
        "turn_idx",
    )
    gap_row = links.select(
        F.col("link_id").alias("parent_id"),
        F.lit("link.gap_turns").alias("key"),
        F.lit("int").alias("value_type"),
        F.lit(None).cast("string").alias("str_value"),
        gap.alias("int_value"),
        "conv_id",
        "turn_idx",
    )
    return tool_row.unionByName(gap_row)


# ---------------------------------------------------------------------------
# resource / scope dimensions (shared by all signals)
# ---------------------------------------------------------------------------

def resource_dim(base: DataFrame) -> DataFrame:
    """RESOURCE dimension: distinct hosts with dense integer ids — the
    content-dedup the Go optimizer performs before encoding (identical
    resources share one id, `go/pkg/otel/logs/arrow/optimizer.go:63-106`).
    The distinct host set is tiny (device cardinality), so the global
    dense_rank window runs over a handful of rows. NULL hosts (malformed
    turns) are excluded — those records carry a NULL resource_id, the
    optional-column semantic (`docs/otap_basics.md:87-88`)."""
    w = Window.orderBy("host")
    return (
        base.filter(F.col("host").isNotNull())
        .select("host")
        .distinct()
        .withColumn("resource_id", F.dense_rank().over(w))
    )


def resource_attrs_table(resources: DataFrame) -> DataFrame:
    """RESOURCE_ATTRS EAV (payload slot 1): attributes of each distinct
    resource, parent_id = resource_id."""
    name_row = resources.select(
        F.col("resource_id").alias("parent_id"),
        F.lit("host.name").alias("key"),
        F.lit("str").alias("value_type"),
        F.col("host").alias("str_value"),
        F.lit(None).cast("long").alias("int_value"),
    )
    idx_row = resources.select(
        F.col("resource_id").alias("parent_id"),
        F.lit("host.index").alias("key"),
        F.lit("int").alias("value_type"),
        F.lit(None).cast("string").alias("str_value"),
        F.substring(F.col("host"), 6, 10).try_cast("long").alias("int_value"),
    )
    return name_row.unionByName(idx_row)


def scope_dim(base: DataFrame) -> DataFrame:
    """SCOPE dimension: distinct (app, format) pairs — the
    instrumentation-scope analog (the producing app + wire format play
    scope name/version). Dense ids over a tiny distinct set."""
    w = Window.orderBy("app", "format")
    return (
        base.filter(F.col("format") != "malformed")
        .select("app", "format")
        .distinct()
        .withColumn("scope_id", F.dense_rank().over(w))
    )


def scope_attrs_table(scopes: DataFrame) -> DataFrame:
    """SCOPE_ATTRS EAV (payload slot 2), parent_id = scope_id."""
    name_row = scopes.select(
        F.col("scope_id").alias("parent_id"),
        F.lit("scope.name").alias("key"),
        F.lit("str").alias("value_type"),
        F.col("app").alias("str_value"),
    )
    fmt_row = scopes.select(
        F.col("scope_id").alias("parent_id"),
        F.lit("format").alias("key"),
        F.lit("str").alias("value_type"),
        F.col("format").alias("str_value"),
    )
    return name_row.unionByName(fmt_row)


# ---------------------------------------------------------------------------
# logs signal (LOGS + LOG_ATTRS — the 4-table logs star schema,
# docs/otap_basics.md:55-68, data_model.md:239-307)
# ---------------------------------------------------------------------------

SEVERITY_TEXT = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]


def logs_table(base: DataFrame, resources: DataFrame,
               scopes: DataFrame) -> DataFrame:
    """LOGS (`docs/data_model.md:248-273`): log-routed turns with
    resource_id / scope_id FKs into the shared dimensions (broadcast
    joins — both dims are tiny) and the (trace_id, span_id) correlation
    columns OTLP log records carry. log_id is content-derived like every
    id here (`parquet_exporter/idgen.rs:30-102` uniqueness role)."""
    logs = base.filter(F.col("sink") == "sink_logs").select(
        F.substring(
            F.sha2(
                F.concat_ws(
                    ":", F.col("conv_id"), F.col("turn_idx").cast("string")
                ),
                256,
            ),
            1, 16,
        ).alias("log_id"),
        F.col("ts").alias("time_ts"),
        F.col("severity").alias("severity_number"),
        F.element_at(
            F.array(*[F.lit(s) for s in SEVERITY_TEXT]),
            F.col("severity") + 1,
        ).alias("severity_text"),
        F.col("event_name"),
        F.col("body"),
        F.col("trace_id"),
        F.col("cur_span_id").alias("span_id"),
        F.col("host"),
        F.col("app"),
        F.col("format"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )
    return (
        logs.join(F.broadcast(resources), "host", "left")
        .join(F.broadcast(scopes), ["app", "format"], "left")
        .select(
            "log_id", "resource_id", "scope_id", "time_ts",
            "severity_number", "severity_text", "event_name", "body",
            "trace_id", "span_id", "conv_id", "turn_idx",
        )
    )


def log_attrs_table(base: DataFrame) -> DataFrame:
    """LOG_ATTRS EAV (payload slot 31), parent_id = log_id."""
    return base.filter(
        (F.col("sink") == "sink_logs") & F.col("attrs").isNotNull()
    ).select(
        F.substring(
            F.sha2(
                F.concat_ws(
                    ":", F.col("conv_id"), F.col("turn_idx").cast("string")
                ),
                256,
            ),
            1, 16,
        ).alias("parent_id"),
        F.explode(F.col("attrs")).alias("key", "str_value"),
        F.lit("str").alias("value_type"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def logs_from_span_events(events: DataFrame, spans: DataFrame) -> DataFrame:
    """The logs/traces duality: reconstruct LOGS-shaped records from
    SPAN_EVENTS — span events ARE log records enclosed by a span, so a
    consumer can round-trip them back into the logs signal (the
    reference's OTLP reconstruction produces both views from the same
    star schema, `rust/otel-arrow-rust/src/otlp/common.rs:467-570`).
    One broadcast-free equi-join on the span_id FK to recover trace
    linkage; everything else is projection."""
    sp = spans.select("span_id", "trace_id", F.col("tool").alias("span_tool"))
    return (
        events.join(sp, events.parent_span_id == sp.span_id)
        .select(
            F.col("event_id").alias("log_id"),
            F.col("time_ts"),
            F.col("severity").alias("severity_number"),
            F.col("name").alias("event_name"),
            "trace_id",
            F.col("parent_span_id").alias("span_id"),
            "span_tool",
            "conv_id",
            "turn_idx",
        )
    )


def exemplar_attrs_table(
    points: DataFrame, min_value: float = EXEMPLAR_MIN_VALUE
) -> DataFrame:
    """Exemplar-attrs EAV (metrics payload closure,
    `docs/data_model.md:60-76`): the parsed attrs of exemplar points,
    parent_id = the exemplar's point_id."""
    return points.filter(
        F.col("value").isNotNull()
        & (F.col("value") >= min_value)
        & F.col("attrs").isNotNull()
    ).select(
        F.col("point_id").alias("parent_id"),
        F.explode(F.col("attrs")).alias("key", "str_value"),
        F.lit("str").alias("value_type"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def trace_rollup(spans: DataFrame, events: DataFrame) -> DataFrame:
    """Per-trace reconstruction rollup: the aggregate a consumer computes
    after the sort-merge reconstruction walk (`otlp/common.rs:467-570`).
    Two partial-aggregated branches merged on trace_id — the span branch
    carries per-trace span stats, the event branch per-trace event counts
    (events join spans on parent_id first, the `id → parent_id` FK)."""
    per_span_events = events.groupBy("parent_span_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    joined = spans.join(
        per_span_events,
        spans.span_id == per_span_events.parent_span_id,
        "left",
    )
    return joined.groupBy("trace_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.coalesce(F.col("n_events"), F.lit(0))).alias("n_events"),
        F.sum("duration_us").alias("total_duration_us"),
        F.min("start_ts").alias("trace_start"),
        F.max("end_ts").alias("trace_end"),
        F.sum(
            (F.col("status_code") == STATUS_ERROR).cast("long")
        ).alias("n_error_spans"),
    )


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def metric_points(base: DataFrame) -> DataFrame:
    """Per-turn metric observations (pre-typed NUMBER_DATA_POINTS).

    rfc5424 metric turns carry their value in the ``code`` attr; CEF
    turns use the CEF severity as a counter-ish value (reference: the
    sparse typed value columns of data points,
    `docs/data_model.md:19-59`). Value stays nullable — absent/invalid
    values are kept as NULL points, mirroring optional columns."""
    value = F.when(
        F.col("format") == "rfc5424",
        F.try_element_at(F.col("attrs"), F.lit("code")).try_cast("double"),
    ).otherwise(F.col("severity").cast("double"))
    return base.filter(F.col("sink") == "sink_metrics").select(
        F.substring(
            F.sha2(
                F.concat_ws(
                    ":", F.col("conv_id"), F.col("turn_idx").cast("string")
                ),
                256,
            ),
            1, 16,
        ).alias("point_id"),
        F.when(F.col("format") == "rfc5424", F.col("event_name"))
        .otherwise(F.concat(F.lit("cef."), F.col("event_name")))
        .alias("metric_name"),
        value.alias("value"),
        F.col("ts").alias("time_ts"),
        F.col("host"),
        F.col("trace_id"),
        F.col("cur_span_id").alias("span_id"),
        F.col("attrs"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def univariate_metrics(points: DataFrame) -> DataFrame:
    """UNIVARIATE_METRICS dimension (`docs/data_model.md:19-40`):
    distinct metric names with dense integer ids. The distinct set is
    tiny (metric-name cardinality), so the global dense_rank window runs
    over a handful of rows — same pattern as resource dedup
    (`go/pkg/otel/logs/arrow/optimizer.go:63-106`)."""
    w = Window.orderBy("metric_name")
    return (
        points.select("metric_name")
        .distinct()
        .withColumn("metric_id", F.dense_rank().over(w))
        .withColumn(
            "metric_type",
            F.when(F.col("metric_name").startswith("cef."), "sum")
            .otherwise("gauge"),
        )
        .withColumn("unit", F.lit("1"))
    )


def number_data_points(points: DataFrame, metrics: DataFrame) -> DataFrame:
    """NUMBER_DATA_POINTS (`docs/data_model.md:41-59`): points joined to
    their metric's integer id via a broadcast of the tiny dimension."""
    return points.join(
        F.broadcast(metrics.select("metric_name", "metric_id")), "metric_name"
    ).select(
        "point_id",
        F.col("metric_id").alias("parent_id"),
        "metric_name",
        "time_ts",
        "value",
        F.lit(0).alias("flags"),
        "conv_id",
        "turn_idx",
    )


def _bucket_count_cols(v: Column, bounds: list[float]) -> list[Column]:
    """One sum-of-indicator per bucket — map-side combinable, no UDF."""
    cols = [F.sum((v <= bounds[0]).cast("long"))]
    for lo, hi in zip(bounds, bounds[1:]):
        cols.append(F.sum(((v > lo) & (v <= hi)).cast("long")))
    cols.append(F.sum((v > bounds[-1]).cast("long")))
    return cols


def histogram_data_points(
    points: DataFrame, bounds: list[float] = HIST_BOUNDS
) -> DataFrame:
    """HISTOGRAM_DATA_POINTS (`docs/data_model.md:100-147`): per
    (metric, host, hour) — count/sum/min/max + fixed explicit-bound
    bucket_counts. Pure hash aggregation with map-side partials; the
    bucket counts are sums of indicator expressions (whole-stage
    codegen), not a UDF histogram."""
    v = F.col("value")
    return (
        points.filter(v.isNotNull())
        .groupBy(
            "metric_name",
            "host",
            F.date_trunc("hour", F.col("time_ts")).alias("hour"),
        )
        .agg(
            F.count(v).alias("point_count"),
            F.round(F.sum(v), 6).alias("sum_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
            F.array(*_bucket_count_cols(v, bounds)).alias("bucket_counts"),
        )
        .withColumn(
            "explicit_bounds", F.array(*[F.lit(b) for b in bounds])
        )
    )


def merge_histograms(hist: DataFrame, n_buckets: int = len(HIST_BOUNDS) + 1) -> DataFrame:
    """Histogram bucket-merge aggregate: merge per-host histograms into
    per-(metric, hour) histograms — element-wise bucket addition plus the
    usual additive/min/max merges. This is the distributive re-aggregation
    that makes histogram points mergeable at any rollup level (the
    property the reference's histogram point encoding preserves,
    `docs/data_model.md:100-147`)."""
    merged_buckets = F.array(
        *[
            F.sum(F.element_at(F.col("bucket_counts"), i + 1))
            for i in range(n_buckets)
        ]
    )
    return hist.groupBy("metric_name", "hour").agg(
        F.sum("point_count").alias("point_count"),
        F.round(F.sum("sum_value"), 6).alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        merged_buckets.alias("bucket_counts"),
        F.countDistinct("host").alias("n_hosts"),
    )


EXP_HIST_BUCKETS = 7  # base-2 indices 0..6 cover the (1, 128] value domain


def exp_histogram_data_points(
    points: DataFrame, n_buckets: int = EXP_HIST_BUCKETS
) -> DataFrame:
    """EXP_HISTOGRAM_DATA_POINTS (`docs/data_model.md:152-237`): base-2
    exponential buckets at scale 0 with the OTel **lower-exclusive**
    boundary convention: bucket k covers (2^k, 2^(k+1)], so an exact
    power of two v = 2^k lands in bucket k-1, and v ∈ [0, 1] lands in
    ``zero_count`` (1 = 2^0 belongs below the first tracked bucket).

    The index is ceil(log2(v)) - 1, computed EXACTLY with integer
    arithmetic — bit-length minus one, minus one more when v is an
    exact integer power of two (``v == trunc(v) AND (b & (b-1)) == 0``)
    — no floating-point log, so the bucketing is reproducible
    bit-for-bit by any engine (a float log differs in the last ulp
    across math libraries exactly at bucket boundaries). Indices ≥
    ``n_buckets`` land in the overflow bucket (last array slot)."""
    v = F.col("value")
    v_int = v.try_cast("bigint")  # Spark try_cast truncates toward zero
    is_pow2 = (v == v_int.cast("double")) & (
        v_int.bitwiseAND(v_int - 1) == 0
    )
    idx = F.when(
        v > 1,
        F.length(F.bin(v_int)) - F.lit(1)
        - F.when(is_pow2, 1).otherwise(0),
    )
    # when/otherwise (not a bare boolean cast): idx is NULL for v < 1 and
    # a NULL indicator would make an all-sub-1 group sum to NULL, not 0
    bucket_cols = [
        F.sum(F.when(idx == i, 1).otherwise(0).cast("long")).alias(f"_b{i}")
        for i in range(n_buckets)
    ] + [
        F.sum(F.when(idx >= n_buckets, 1).otherwise(0).cast("long")).alias("_bovf")
    ]
    return (
        points.filter(v.isNotNull())
        .groupBy(
            "metric_name",
            "host",
            F.date_trunc("hour", F.col("time_ts")).alias("hour"),
        )
        .agg(
            F.count(v).alias("point_count"),
            F.sum(((v >= 0) & (v <= 1)).cast("long")).alias("zero_count"),
            F.round(F.sum(v), 6).alias("sum_value"),
            *bucket_cols,
        )
        .select(
            "metric_name", "host", "hour", "point_count", "zero_count",
            "sum_value",
            F.array(
                *[F.col(f"_b{i}") for i in range(n_buckets)], F.col("_bovf")
            ).alias("bucket_counts"),
            F.lit(0).alias("scale"),
        )
    )


def merge_exp_histograms(
    hist: DataFrame, n_buckets: int = EXP_HIST_BUCKETS + 1
) -> DataFrame:
    """Merge per-host exponential histograms per (metric, hour) —
    same-scale merge is element-wise bucket addition (the distributive
    property the exponential encoding is designed for; cross-scale merge
    would first downscale by halving adjacent buckets)."""
    merged = F.array(
        *[
            F.sum(F.element_at(F.col("bucket_counts"), i + 1))
            for i in range(n_buckets)
        ]
    )
    return hist.groupBy("metric_name", "hour").agg(
        F.sum("point_count").alias("point_count"),
        F.sum("zero_count").alias("zero_count"),
        F.round(F.sum("sum_value"), 6).alias("sum_value"),
        merged.alias("bucket_counts"),
        F.countDistinct("host").alias("n_hosts"),
    )


def summary_data_points(points: DataFrame, exact: bool = True,
                        accuracy: int = 10000) -> DataFrame:
    """SUMMARY_DATA_POINTS (`docs/data_model.md:148-151`): count/sum +
    quantile values per (metric, hour).

    ``exact=True`` (the oracle-gated default) uses exact
    linear-interpolation percentiles — deterministic and reproducible
    across engines, but the aggregation buffers every value of a group,
    so a hot (metric, hour) group at 100 TB holds the whole group in one
    buffer. ``exact=False`` is the scale path: ``percentile_approx``
    (Greenwald-Khanna sketch, bounded memory ∝ ``accuracy`` regardless
    of group size, mergeable map-side) — same plan shape, bounded
    state."""
    v = F.col("value")
    if exact:
        def q(p: float) -> Column:
            return F.percentile(v, F.lit(p))
    else:
        def q(p: float) -> Column:
            return F.percentile_approx(v, F.lit(p), F.lit(accuracy))
    return (
        points.filter(v.isNotNull())
        .groupBy(
            "metric_name",
            F.date_trunc("hour", F.col("time_ts")).alias("hour"),
        )
        .agg(
            F.count(v).alias("point_count"),
            F.round(F.sum(v), 6).alias("sum_value"),
            F.round(q(0.5), 6).alias("q50"),
            F.round(q(0.9), 6).alias("q90"),
            F.round(q(0.99), 6).alias("q99"),
        )
    )


def exemplars_table(
    points: DataFrame, min_value: float = EXEMPLAR_MIN_VALUE
) -> DataFrame:
    """Exemplars (`docs/data_model.md:60-76`): high-value observations
    carrying their (trace_id, span_id) linkage back into the trace
    star-schema — the cross-signal FK the reference models as exemplar
    columns on data points."""
    return points.filter(
        F.col("value").isNotNull() & (F.col("value") >= min_value)
    ).select(
        F.col("point_id").alias("parent_point_id"),
        "metric_name",
        "value",
        F.col("time_ts"),
        "trace_id",
        "span_id",
        "conv_id",
        "turn_idx",
    )
