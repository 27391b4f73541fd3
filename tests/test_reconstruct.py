"""OTLP round-trip equivalence gate.

The reference's core correctness discipline: encode OTLP→OTAP→OTLP over
randomized data and assert *set equality of value paths* (vPaths) —
invariant to field order and batch re-organization
(`/root/reference/docs/validation_process.md:12-33`,
`go/pkg/otel/assert/equiv.go:99-150`, vPath extraction `:215-330`).

The rebuild's analog: shred turns into the traces star schema
(signals.py), reconstruct nested span records with the parent_id joins
(reconstruct.py — the sort-merge cursor walk,
`rust/otel-arrow-rust/src/otlp/common.rs:467-570`), flatten to vPaths,
and assert set equality against a DIRECT derivation — an independent
pure-Python walk over the parsed turns that never sees the star schema.
Any bug in the shred (wrong event attachment, dropped attr rows, broken
link windows) or the reconstruction joins breaks the set equality.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def base(spark, transcripts):
    from otel_arrow_spark.parse import parse_turns
    from otel_arrow_spark.router import route_turns
    from otel_arrow_spark.signals import signal_base

    return signal_base(route_turns(parse_turns(transcripts))).cache()


def _reconstructed_vpaths(base) -> set[str]:
    from otel_arrow_spark.reconstruct import reconstruct_spans, span_vpaths
    from otel_arrow_spark.signals import (
        span_attrs_table, span_event_attrs_table, span_events_table,
        span_links_table, spans_table,
    )

    spans = spans_table(base)
    nested = reconstruct_spans(
        spans,
        span_events_table(base),
        span_links_table(spans),
        span_attrs_table(base),
        span_event_attrs_table(base),
    )
    return {r.vpath for r in span_vpaths(nested).collect()}


def _direct_vpaths(base) -> set[str]:
    """Independent derivation: collect the parsed turns and nest them in
    plain Python — per-conversation walk tracking the current span and
    the last span per tool, never touching signals.py's window logic."""
    rows = base.select(
        "conv_id", "turn_idx", "role", "tool", "format",
        "event_name", "severity", "attrs",
    ).collect()
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)

    exp: set[str] = set()
    for conv_id, turns in by_conv.items():
        turns.sort(key=lambda r: r.turn_idx)
        trace_id = _sha(conv_id)[:32]
        cur_span = None
        last_by_tool: dict[str, str] = {}
        for r in turns:
            is_span = r.role == "tool" and r.tool is not None
            if is_span:
                span_id = _sha(f"{conv_id}:{r.turn_idx}")[:16]
                prefix = f"{trace_id}/{span_id}"
                name = r.event_name if r.event_name is not None else f"tool:{r.tool}"
                status = 0 if r.severity is None else (2 if r.severity <= 3 else 1)
                parent = cur_span if cur_span is not None else "-"
                exp.add(f"{prefix}/name={name}")
                exp.add(f"{prefix}/status={status}")
                exp.add(f"{prefix}/parent={parent}")
                for k, v in (r.attrs or {}).items():
                    exp.add(f"{prefix}/attr/{k}={v}")
                linked = last_by_tool.get(r.tool)
                if linked is not None:
                    link_id = _sha(f"{conv_id}:{r.turn_idx}:link")[:16]
                    exp.add(f"{prefix}/link/{link_id}={linked}")
                last_by_tool[r.tool] = span_id
                cur_span = span_id
            elif cur_span is not None:
                event_id = _sha(f"{conv_id}:{r.turn_idx}")[:16]
                prefix = f"{trace_id}/{cur_span}/event/{event_id}"
                name = r.event_name if r.event_name is not None else r.format
                exp.add(f"{prefix}/name={name}")
                for k, v in (r.attrs or {}).items():
                    exp.add(f"{prefix}/attr/{k}={v}")
    return exp


def test_otlp_roundtrip_vpath_set_equality(base):
    got = _reconstructed_vpaths(base)
    exp = _direct_vpaths(base)
    missing = exp - got
    extra = got - exp
    assert not missing and not extra, (
        f"{len(missing)} missing (e.g. {sorted(missing)[:3]}), "
        f"{len(extra)} extra (e.g. {sorted(extra)[:3]})"
    )
    assert len(got) > 1000  # the fixture must actually exercise the walk


def test_roundtrip_catches_reorganized_batches(base):
    """The vPath set is invariant to partitioning/batch layout — the
    property the reference's Equiv is designed around."""
    shuffled = base.repartition(13)
    assert _reconstructed_vpaths(shuffled) == _reconstructed_vpaths(base)


def test_reconstructed_children_are_ordered_and_complete(base):
    from otel_arrow_spark.reconstruct import reconstruct_spans
    from otel_arrow_spark.signals import (
        span_attrs_table, span_event_attrs_table, span_events_table,
        span_links_table, spans_table,
    )

    spans = spans_table(base)
    events = span_events_table(base)
    nested = reconstruct_spans(
        spans, events, span_links_table(spans),
        span_attrs_table(base), span_event_attrs_table(base),
    ).cache()
    # every event lands in exactly one span's array, in turn order
    n_nested = nested.select(
        F.sum(F.size("events")).alias("n")
    ).collect()[0].n
    assert n_nested == events.count()
    bad_order = nested.filter(
        F.exists(
            F.zip_with(
                F.col("events"),
                F.slice(F.col("events"), 2, 100000),
                lambda a, b: a.getField("turn_idx") >= b.getField("turn_idx"),
            ),
            lambda x: x,
        )
    )
    assert bad_order.count() == 0
    nested.unpersist()


# ---------------------------------------------------------------------------
# metrics round-trip (the metrics analog of the span vPath gate;
# reference encoders `rust/otel-arrow-rust/src/otlp/metrics/*`)
# ---------------------------------------------------------------------------

def _reconstructed_metric_vpaths(base) -> set[str]:
    from otel_arrow_spark.reconstruct import metric_vpaths, reconstruct_metrics
    from otel_arrow_spark.signals import (
        exemplar_attrs_table, exemplars_table, metric_points,
        number_data_points, univariate_metrics,
    )

    pts = metric_points(base)
    dim = univariate_metrics(pts)
    nested = reconstruct_metrics(
        dim,
        number_data_points(pts, dim),
        exemplars_table(pts),
        exemplar_attrs_table(pts),
    )
    return {r.vpath for r in metric_vpaths(nested).collect()}


def _direct_metric_vpaths(base) -> set[str]:
    """Independent derivation: pure-Python walk over the parsed turns —
    tracks the current span per conversation (for exemplar span
    linkage) and derives metric names/values/exemplars straight from
    the turn fields, never touching signals.py's star-schema logic."""
    from otel_arrow_spark.signals import EXEMPLAR_MIN_VALUE

    rows = base.select(
        "conv_id", "turn_idx", "role", "tool", "format",
        "event_name", "severity", "attrs", "sink",
    ).collect()
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)

    def tryfloat(s):
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    exp: set[str] = set()
    names: set[str] = set()
    for conv_id, turns in by_conv.items():
        turns.sort(key=lambda r: r.turn_idx)
        trace_id = _sha(conv_id)[:32]
        cur_span = None
        for r in turns:
            if r.role == "tool" and r.tool is not None:
                cur_span = _sha(f"{conv_id}:{r.turn_idx}")[:16]
            if r.sink != "sink_metrics":
                continue
            name = (
                r.event_name if r.format == "rfc5424"
                else f"cef.{r.event_name}"
            )
            names.add(name)
            value = (
                tryfloat((r.attrs or {}).get("code"))
                if r.format == "rfc5424"
                else (float(r.severity) if r.severity is not None else None)
            )
            pid = _sha(f"{conv_id}:{r.turn_idx}")[:16]
            pp = f"{name}/point/{pid}"
            exp.add(f"{pp}/value={value if value is not None else '-'}")
            if value is not None and value >= EXEMPLAR_MIN_VALUE:
                exp.add(f"{pp}/exemplar/trace={trace_id}")
                exp.add(f"{pp}/exemplar/span={cur_span or '-'}")
                exp.add(f"{pp}/exemplar/value={value}")
                for k, v in (r.attrs or {}).items():
                    exp.add(f"{pp}/exemplar/attr/{k}={v}")
    for name in names:
        mtype = "sum" if name.startswith("cef.") else "gauge"
        exp.add(f"{name}/type={mtype}")
        exp.add(f"{name}/unit=1")
    return exp


def test_otlp_metrics_roundtrip_vpath_set_equality(base):
    got = _reconstructed_metric_vpaths(base)
    exp = _direct_metric_vpaths(base)
    missing = exp - got
    extra = got - exp
    assert not missing and not extra, (
        f"{len(missing)} missing (e.g. {sorted(missing)[:3]}), "
        f"{len(extra)} extra (e.g. {sorted(extra)[:3]})"
    )
    assert len(got) > 500  # the fixture must actually exercise the walk


def test_metrics_roundtrip_catches_reorganized_batches(base):
    shuffled = base.repartition(17)
    assert (
        _reconstructed_metric_vpaths(shuffled)
        == _reconstructed_metric_vpaths(base)
    )


# ---------------------------------------------------------------------------
# logs round-trip (ResourceLogs → ScopeLogs → LogRecord nesting;
# reference encoder `rust/otel-arrow-rust/src/otlp/logs.rs:205-515`)
# ---------------------------------------------------------------------------

def _reconstructed_log_vpaths(base) -> set[str]:
    from otel_arrow_spark.reconstruct import log_vpaths, reconstruct_logs
    from otel_arrow_spark.signals import (
        log_attrs_table, logs_table, resource_dim, scope_dim,
    )

    res, scp = resource_dim(base), scope_dim(base)
    nested = reconstruct_logs(
        logs_table(base, res, scp), log_attrs_table(base), res, scp
    )
    return {r.vpath for r in log_vpaths(nested).collect()}


def _direct_log_vpaths(base) -> set[str]:
    """Independent derivation: pure-Python walk over the parsed turns —
    tracks the current span per conversation for the (trace, span)
    correlation columns and renders each sink_logs turn's leaves
    straight from the turn fields, never touching signals.py's
    star-schema or dim logic."""
    from otel_arrow_spark.signals import SEVERITY_TEXT

    rows = base.select(
        "conv_id", "turn_idx", "role", "tool", "sink", "severity",
        "event_name", "body", "host", "app", "format", "attrs",
    ).collect()
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)

    exp: set[str] = set()
    for conv_id, turns in by_conv.items():
        turns.sort(key=lambda r: r.turn_idx)
        trace_id = _sha(conv_id)[:32]
        cur_span = None
        for r in turns:
            if r.role == "tool" and r.tool is not None:
                cur_span = _sha(f"{conv_id}:{r.turn_idx}")[:16]
            if r.sink != "sink_logs":
                continue
            lid = _sha(f"{conv_id}:{r.turn_idx}")[:16]
            sevtext = (
                SEVERITY_TEXT[r.severity] if r.severity is not None else None
            )
            exp.add(f"{lid}/res={r.host if r.host is not None else '-'}")
            exp.add(f"{lid}/scope={r.app or '-'}:{r.format or '-'}")
            exp.add(f"{lid}/sev={r.severity if r.severity is not None else '-'}")
            exp.add(f"{lid}/sevtext={sevtext if sevtext is not None else '-'}")
            exp.add(
                f"{lid}/event="
                f"{r.event_name if r.event_name is not None else '-'}"
            )
            exp.add(f"{lid}/body={r.body if r.body is not None else '-'}")
            exp.add(f"{lid}/trace={trace_id}")
            exp.add(f"{lid}/span={cur_span or '-'}")
            for k, v in (r.attrs or {}).items():
                exp.add(f"{lid}/attr/{k}={v}")
    return exp


def test_otlp_logs_roundtrip_vpath_set_equality(base):
    got = _reconstructed_log_vpaths(base)
    exp = _direct_log_vpaths(base)
    missing = exp - got
    extra = got - exp
    assert not missing and not extra, (
        f"{len(missing)} missing (e.g. {sorted(missing)[:3]}), "
        f"{len(extra)} extra (e.g. {sorted(extra)[:3]})"
    )
    assert len(got) > 500  # the fixture must actually exercise the walk


def test_logs_roundtrip_catches_reorganized_batches(base):
    shuffled = base.repartition(19)
    assert (
        _reconstructed_log_vpaths(shuffled) == _reconstructed_log_vpaths(base)
    )


def test_reconstructed_log_records_are_ordered_and_complete(base):
    from otel_arrow_spark.reconstruct import reconstruct_logs
    from otel_arrow_spark.signals import (
        log_attrs_table, logs_table, resource_dim, scope_dim,
    )

    res, scp = resource_dim(base), scope_dim(base)
    logs = logs_table(base, res, scp)
    attrs = log_attrs_table(base)
    nested = reconstruct_logs(logs, attrs, res, scp).cache()
    # every log record lands in exactly one group's array
    n_nested = nested.select(
        F.sum(F.size("records")).alias("n")
    ).collect()[0].n
    assert n_nested == logs.count()
    # attrs closure: total nested attrs == LOG_ATTRS rows
    n_attrs = nested.select(
        F.sum(
            F.aggregate(
                "records", F.lit(0),
                lambda a, r: a + F.size(r.getField("attrs")),
            )
        ).alias("n")
    ).collect()[0].n
    assert n_attrs == attrs.count()
    # arrays sorted by the leading unique log_id
    bad_order = nested.filter(
        F.exists(
            F.zip_with(
                F.col("records"),
                F.slice(F.col("records"), 2, 1000000),
                lambda a, b: a.getField("log_id") >= b.getField("log_id"),
            ),
            lambda x: x,
        )
    )
    assert bad_order.count() == 0
    nested.unpersist()


def test_reconstructed_points_are_ordered_and_complete(base):
    from otel_arrow_spark.reconstruct import reconstruct_metrics
    from otel_arrow_spark.signals import (
        exemplar_attrs_table, exemplars_table, metric_points,
        number_data_points, univariate_metrics,
    )

    pts = metric_points(base)
    dim = univariate_metrics(pts)
    nested = reconstruct_metrics(
        dim,
        number_data_points(pts, dim),
        exemplars_table(pts),
        exemplar_attrs_table(pts),
    ).cache()
    # every data point lands in exactly one metric's array
    n_nested = nested.select(
        F.sum(F.size("points")).alias("n")
    ).collect()[0].n
    assert n_nested == pts.count()
    # arrays sorted by (conv_id, turn_idx)
    bad_order = nested.filter(
        F.exists(
            F.zip_with(
                F.col("points"),
                F.slice(F.col("points"), 2, 1000000),
                # field-wise, NOT struct >= struct: zip_with pads the
                # tail with NULL and struct ordering ranks NULLs FIRST,
                # so struct(a) >= struct(NULL,NULL) is TRUE; field
                # comparisons yield NULL there, which exists() skips
                lambda a, b: (
                    a.getField("conv_id") > b.getField("conv_id")
                ) | (
                    (a.getField("conv_id") == b.getField("conv_id"))
                    & (a.getField("turn_idx") >= b.getField("turn_idx"))
                ),
            ),
            lambda x: x,
        )
    )
    assert bad_order.count() == 0
    # exemplar closure: total nested exemplars == exemplars_table rows
    n_ex = nested.select(
        F.sum(
            F.aggregate(
                "points", F.lit(0),
                lambda a, p: a + F.size(p.getField("exemplars")),
            )
        ).alias("n")
    ).collect()[0].n
    assert n_ex == exemplars_table(pts).count()
    nested.unpersist()
