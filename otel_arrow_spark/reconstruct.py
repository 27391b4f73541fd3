"""OTLP reconstruction: star-schema tables → nested span records.

The reference's consumers rebuild nested OTLP entities from the flat
OTAP star schema by sorting the root batch and advancing cursors through
child batches sorted by ``parent_id`` — a streaming sort-merge join
(`rust/otel-arrow-rust/src/otlp/common.rs:467-570` ``SortedBatchCursor``
/ ``ChildIndexIter``; logs encoder `otlp/logs.rs:205-515`). Its
correctness gate is vPath-set equivalence of the round-tripped records
against the originals (`docs/validation_process.md:12-33`,
`go/pkg/otel/assert/equiv.go:99-150`).

Here the same reconstruction is declarative: each child table collapses
to one sorted array per parent (``collect_list`` + ``array_sort`` —
deterministic because the leading struct field is the unique
``turn_idx``), then the parent relation picks the arrays up with plain
``parent_id`` equi-joins — Catalyst chooses sort-merge or broadcast per
side size, which *is* the cursor walk, distributed. Every join key is
content-derived, so the reconstruction is stable across partitionings
and retries.

Scale shape: one shuffle per child table (the groupBy on parent id,
map-side partial where possible) + the final joins on span_id. No
window over the full relation, no driver-side nesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attrs_array(attrs: DataFrame, out_name: str) -> DataFrame:
    """EAV rows → one deterministic (key-sorted) array per parent_id."""
    return attrs.groupBy("parent_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("key"), F.col("str_value")))
        ).alias(out_name)
    )


def reconstruct_spans(
    spans: DataFrame,
    span_events: DataFrame,
    span_links: DataFrame,
    span_attrs: DataFrame,
    span_event_attrs: DataFrame,
) -> DataFrame:
    """Nested span records: each span with its sorted events (each event
    carrying its own sorted attrs), links, and attrs — the OTLP shape a
    downstream consumer would re-serialize.

    Output: the SPANS columns plus ``events`` / ``links`` / ``attrs``
    array columns (empty arrays when a span has no children, matching
    OTLP's always-present-possibly-empty lists).
    """
    ev_attrs = _attrs_array(span_event_attrs, "attrs")
    events_nested = (
        span_events.join(
            ev_attrs,
            span_events.event_id == ev_attrs.parent_id,
            "left",
        )
        .select(
            "parent_span_id",
            F.struct(
                F.col("turn_idx"),
                F.col("event_id"),
                F.col("name"),
                F.col("severity"),
                F.coalesce(
                    F.col("attrs"),
                    F.array().cast(
                        "array<struct<key: string, str_value: string>>"
                    ),
                ).alias("attrs"),
            ).alias("ev"),
        )
        .groupBy("parent_span_id")
        .agg(F.array_sort(F.collect_list("ev")).alias("events"))
    )
    links_nested = span_links.select(
        "parent_span_id",
        F.struct(
            F.col("linked_turn_idx"),
            F.col("link_id"),
            F.col("linked_span_id"),
            F.col("trace_state"),
        ).alias("lk"),
    ).groupBy("parent_span_id").agg(
        F.array_sort(F.collect_list("lk")).alias("links")
    )
    attrs_nested = _attrs_array(span_attrs, "attrs")

    out = (
        spans.join(
            events_nested,
            spans.span_id == events_nested.parent_span_id,
            "left",
        )
        .drop(events_nested.parent_span_id)
        .join(
            links_nested,
            spans.span_id == links_nested.parent_span_id,
            "left",
        )
        .drop(links_nested.parent_span_id)
        .join(attrs_nested, spans.span_id == attrs_nested.parent_id, "left")
        .drop("parent_id")
    )
    return out.withColumns(
        {
            "events": F.coalesce(
                F.col("events"),
                F.array().cast(
                    "array<struct<turn_idx: int, event_id: string, "
                    "name: string, severity: int, "
                    "attrs: array<struct<key: string, str_value: string>>>>"
                ),
            ),
            "links": F.coalesce(
                F.col("links"),
                F.array().cast(
                    "array<struct<linked_turn_idx: int, link_id: string, "
                    "linked_span_id: string, trace_state: string>>"
                ),
            ),
            "attrs": F.coalesce(
                F.col("attrs"),
                F.array().cast(
                    "array<struct<key: string, str_value: string>>"
                ),
            ),
        }
    )


def span_vpaths(nested: DataFrame) -> DataFrame:
    """Flatten reconstructed nested spans to the vPath relation: one
    ``(path, value)`` string row per leaf — the Spark rendition of the
    reference's vPath extraction (`go/pkg/otel/assert/equiv.go:215-330`).
    Paths address by content-derived ids, never list position, so the
    set is invariant to batch re-organization — exactly the equivalence
    the reference's Equiv asserts."""
    span_prefix = F.concat_ws("/", F.col("trace_id"), F.col("span_id"))

    def leaf(suffix, value):
        return F.concat_ws(
            "=", F.concat(span_prefix, F.lit(suffix)), value.cast("string")
        )

    scalars = nested.select(
        F.explode(
            F.array(
                leaf("/name", F.col("name")),
                leaf("/status", F.col("status_code")),
                leaf("/parent", F.coalesce(F.col("parent_span_id"), F.lit("-"))),
            )
        ).alias("vpath")
    )
    span_attr_paths = nested.select(
        F.explode("attrs").alias("a"), span_prefix.alias("p")
    ).select(
        F.concat_ws(
            "=",
            F.concat_ws("/", F.col("p"), F.lit("attr"), F.col("a.key")),
            F.col("a.str_value"),
        ).alias("vpath")
    )
    ev = nested.select(F.explode("events").alias("e"), span_prefix.alias("p"))
    event_paths = ev.select(
        F.concat_ws(
            "=",
            F.concat_ws("/", F.col("p"), F.lit("event"), F.col("e.event_id"),
                        F.lit("name")),
            F.col("e.name"),
        ).alias("vpath")
    )
    event_attr_paths = ev.select(
        F.explode("e.attrs").alias("a"),
        F.concat_ws("/", F.col("p"), F.lit("event"), F.col("e.event_id")).alias("ep"),
    ).select(
        F.concat_ws(
            "=",
            F.concat_ws("/", F.col("ep"), F.lit("attr"), F.col("a.key")),
            F.col("a.str_value"),
        ).alias("vpath")
    )
    link_paths = nested.select(
        F.explode("links").alias("l"), span_prefix.alias("p")
    ).select(
        F.concat_ws(
            "=",
            F.concat_ws("/", F.col("p"), F.lit("link"), F.col("l.link_id")),
            F.col("l.linked_span_id"),
        ).alias("vpath")
    )
    return (
        scalars.unionByName(span_attr_paths)
        .unionByName(event_paths)
        .unionByName(event_attr_paths)
        .unionByName(link_paths)
    )


def reconstruct_metrics(
    metrics: DataFrame,
    number_points: DataFrame,
    exemplars: DataFrame,
    exemplar_attrs: DataFrame,
) -> DataFrame:
    """Nested OTLP metric records from the metrics star: each
    UNIVARIATE_METRICS row with its sorted data points, each point
    carrying its exemplars (each exemplar its sorted attrs) — the
    metrics analog of :func:`reconstruct_spans`, mirroring the
    reference's metrics OTLP encoders
    (`rust/otel-arrow-rust/src/otlp/metrics/mod.rs` data-point cursor
    walk + `otlp/metrics/data_points.rs` exemplar/attr attachment).

    Same declarative shape: one groupBy per child level (exemplar attrs
    → exemplars → points), sorted arrays via ``array_sort`` on a struct
    whose leading fields ``(conv_id, turn_idx)`` are unique, then plain
    FK equi-joins upward. One shuffle per level, no windows, no driver
    nesting — Catalyst broadcasts the tiny metrics dim side.

    Output: UNIVARIATE_METRICS columns plus a ``points`` array column
    (possibly-empty, never NULL, matching OTLP's always-present lists).
    """
    ex_attrs = _attrs_array(exemplar_attrs, "attrs")
    empty_attrs = F.array().cast(
        "array<struct<key: string, str_value: string>>"
    )
    ex_nested = (
        exemplars.join(
            ex_attrs,
            exemplars.parent_point_id == ex_attrs.parent_id,
            "left",
        )
        .select(
            "parent_point_id",
            F.struct(
                F.col("turn_idx"),
                F.col("value"),
                F.col("trace_id"),
                F.col("span_id"),
                F.coalesce(F.col("attrs"), empty_attrs).alias("attrs"),
            ).alias("ex"),
        )
        .groupBy("parent_point_id")
        .agg(F.array_sort(F.collect_list("ex")).alias("exemplars"))
    )
    empty_ex = F.array().cast(
        ex_nested.schema["exemplars"].dataType.simpleString()
    )
    pts_nested = (
        number_points.join(
            ex_nested,
            number_points.point_id == ex_nested.parent_point_id,
            "left",
        )
        .select(
            F.col("parent_id"),
            F.struct(
                F.col("conv_id"),
                F.col("turn_idx"),
                F.col("point_id"),
                F.col("time_ts"),
                F.col("value"),
                F.col("flags"),
                F.coalesce(F.col("exemplars"), empty_ex).alias("exemplars"),
            ).alias("pt"),
        )
        .groupBy("parent_id")
        .agg(F.array_sort(F.collect_list("pt")).alias("points"))
    )
    empty_pts = F.array().cast(
        pts_nested.schema["points"].dataType.simpleString()
    )
    return (
        metrics.join(
            pts_nested, metrics.metric_id == pts_nested.parent_id, "left"
        )
        .drop("parent_id")
        .withColumn("points", F.coalesce(F.col("points"), empty_pts))
    )


def reconstruct_logs(
    logs: DataFrame,
    log_attrs: DataFrame,
    resources: DataFrame,
    scopes: DataFrame,
) -> DataFrame:
    """Nested OTLP log payloads from the logs star: one row per
    (resource, scope) pair carrying the sorted array of its log records,
    each record with its sorted attrs — the ResourceLogs → ScopeLogs →
    LogRecord nesting the reference's logs OTLP encoder rebuilds
    (`rust/otel-arrow-rust/src/otlp/logs.rs:205-515` cursor walk over
    LOGS sorted by id with LOG_ATTRS advanced by ``parent_id``).

    Same declarative shape as :func:`reconstruct_spans`: one groupBy per
    child level (attrs → records), ``array_sort`` determinism from the
    leading unique ``log_id``, tiny dims picked up by broadcast joins.
    Scale: the only shuffles are the two groupBys (both map-side
    partial); group count is |resources|×|scopes| — the OTLP batch
    layout, not a skew risk, because the records array per group is
    bounded by what a single ResourceLogs message would carry anyway
    (at 100 TB the upstream would partition by time/slice first, as
    ``run_pipeline`` does).
    """
    attrs_nested = _attrs_array(log_attrs, "attrs")
    empty_attrs = F.array().cast(
        "array<struct<key: string, str_value: string>>"
    )
    recs = (
        logs.join(
            attrs_nested, logs.log_id == attrs_nested.parent_id, "left"
        )
        .select(
            "resource_id",
            "scope_id",
            F.struct(
                F.col("log_id"),
                F.col("time_ts"),
                F.col("severity_number"),
                F.col("severity_text"),
                F.col("event_name"),
                F.col("body"),
                F.col("trace_id"),
                F.col("span_id"),
                F.coalesce(F.col("attrs"), empty_attrs).alias("attrs"),
            ).alias("rec"),
        )
        .groupBy("resource_id", "scope_id")
        .agg(F.array_sort(F.collect_list("rec")).alias("records"))
    )
    return (
        recs.join(F.broadcast(resources), "resource_id", "left")
        .join(F.broadcast(scopes), "scope_id", "left")
        .select(
            "resource_id", "scope_id", "host", "app", "format", "records"
        )
    )


def log_vpaths(nested: DataFrame) -> DataFrame:
    """Reconstructed nested logs → the vPath relation: one
    ``(path=value)`` string row per leaf, addressed by the
    content-derived ``log_id`` — never list position or dense dim id —
    so the set is invariant to batch/partition re-organization, the
    logs rendition of the reference's Equiv gate
    (`go/pkg/otel/assert/equiv.go:99-150`)."""
    rec = nested.select(
        F.coalesce(F.col("host"), F.lit("-")).alias("res_host"),
        F.concat_ws(
            ":",
            F.coalesce(F.col("app"), F.lit("-")),
            F.coalesce(F.col("format"), F.lit("-")),
        ).alias("scope_key"),
        F.explode("records").alias("r"),
    )
    rid = F.col("r.log_id")

    def leaf(suffix, value):
        return F.concat_ws(
            "=",
            F.concat(rid, F.lit(suffix)),
            F.coalesce(value.cast("string"), F.lit("-")),
        )

    scalars = rec.select(
        F.explode(
            F.array(
                leaf("/res", F.col("res_host")),
                leaf("/scope", F.col("scope_key")),
                leaf("/sev", F.col("r.severity_number")),
                leaf("/sevtext", F.col("r.severity_text")),
                leaf("/event", F.col("r.event_name")),
                leaf("/body", F.col("r.body")),
                leaf("/trace", F.col("r.trace_id")),
                leaf("/span", F.col("r.span_id")),
            )
        ).alias("vpath")
    )
    attr_paths = rec.select(
        F.explode("r.attrs").alias("a"), rid.alias("p")
    ).select(
        F.concat_ws(
            "=",
            F.concat_ws("/", F.col("p"), F.lit("attr"), F.col("a.key")),
            F.col("a.str_value"),
        ).alias("vpath")
    )
    return scalars.unionByName(attr_paths)


def metric_vpaths(nested: DataFrame) -> DataFrame:
    """Reconstructed nested metrics → the vPath relation: one
    ``(path=value)`` string row per leaf, addressed by content-derived
    ids (metric name, point id) — never list position — so the set is
    invariant to batch/partition re-organization, the same equivalence
    the reference's Equiv asserts for metrics
    (`go/pkg/otel/assert/equiv.go:99-150`)."""
    m = F.col("metric_name")
    scalars = nested.select(
        F.explode(
            F.array(
                F.concat_ws("=", F.concat(m, F.lit("/type")),
                            F.col("metric_type")),
                F.concat_ws("=", F.concat(m, F.lit("/unit")), F.col("unit")),
            )
        ).alias("vpath")
    )
    pts = nested.select(F.explode("points").alias("p"), m.alias("m"))
    pp = F.concat_ws("/", F.col("m"), F.lit("point"), F.col("p.point_id"))
    point_paths = pts.select(
        F.concat_ws(
            "=",
            F.concat(pp, F.lit("/value")),
            F.coalesce(F.col("p.value").cast("string"), F.lit("-")),
        ).alias("vpath")
    )
    ex = pts.select(F.explode("p.exemplars").alias("e"), pp.alias("pp"))
    ex_paths = ex.select(
        F.explode(
            F.array(
                F.concat_ws("=", F.concat(F.col("pp"), F.lit("/exemplar/trace")),
                            F.col("e.trace_id")),
                F.concat_ws("=", F.concat(F.col("pp"), F.lit("/exemplar/span")),
                            F.coalesce(F.col("e.span_id"), F.lit("-"))),
                F.concat_ws("=", F.concat(F.col("pp"), F.lit("/exemplar/value")),
                            F.col("e.value").cast("string")),
            )
        ).alias("vpath")
    )
    ex_attr_paths = ex.select(
        F.explode("e.attrs").alias("a"), F.col("pp")
    ).select(
        F.concat_ws(
            "=",
            F.concat_ws("/", F.col("pp"), F.lit("exemplar"), F.lit("attr"),
                        F.col("a.key")),
            F.col("a.str_value"),
        ).alias("vpath")
    )
    return (
        scalars.unionByName(point_paths)
        .unionByName(ex_paths)
        .unionByName(ex_attr_paths)
    )
