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
