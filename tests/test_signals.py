"""Traces/metrics star-schema invariants (signals.py).

Mirrors the reference's round-trip discipline: the star schema must
reconstruct consistently through its `id → parent_id` FKs
(`docs/validation_process.md:12-33`; reconstruction joins
`rust/otel-arrow-rust/src/otlp/common.rs:467-570`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def base(spark, transcripts):
    from otel_arrow_spark.parse import parse_turns
    from otel_arrow_spark.router import route_turns
    from otel_arrow_spark.signals import signal_base

    return signal_base(route_turns(parse_turns(transcripts))).cache()


@pytest.fixture(scope="module")
def spans(base):
    from otel_arrow_spark.signals import spans_table

    return spans_table(base).cache()


@pytest.fixture(scope="module")
def events(base):
    from otel_arrow_spark.signals import span_events_table

    return span_events_table(base).cache()


def test_span_ids_unique_and_content_derived(spans):
    n = spans.count()
    assert n > 0
    assert spans.select("span_id").distinct().count() == n
    # content-derived: 16 hex chars (8-byte span id analog)
    bad = spans.filter(~F.col("span_id").rlike("^[0-9a-f]{16}$")).count()
    assert bad == 0
    assert spans.filter(~F.col("trace_id").rlike("^[0-9a-f]{32}$")).count() == 0


def test_span_parent_chain(spark, spans):
    """parent_span_id chains to the previous span of the conversation:
    exactly one root (null parent) per conversation-with-spans, and every
    non-null parent resolves to a span of the same trace."""
    roots = spans.filter(F.col("parent_span_id").isNull())
    per_conv = roots.groupBy("conv_id").count().filter(F.col("count") != 1)
    assert per_conv.count() == 0

    parents = spans.select(
        F.col("parent_span_id").alias("pid"), F.col("trace_id").alias("tid")
    ).filter(F.col("pid").isNotNull())
    resolved = parents.join(
        spans.select("span_id", "trace_id"),
        (parents.pid == spans.span_id) & (parents.tid == spans.trace_id),
        "left_anti",
    )
    assert resolved.count() == 0


def test_span_durations_cover_conversation(spans):
    assert spans.filter(F.col("duration_us") < 0).count() == 0
    # end_ts never precedes start_ts and equals the next span's start
    # for non-last spans (checked via self-join on the chain)
    child = spans.select(
        F.col("parent_span_id").alias("pid"),
        F.col("start_ts").alias("child_start"),
    ).filter(F.col("pid").isNotNull())
    joined = spans.join(child, spans.span_id == child.pid)
    mismatch = joined.filter(F.col("end_ts") != F.col("child_start"))
    assert mismatch.count() == 0


def test_events_attach_to_enclosing_span(base, spans, events):
    """Every event's parent span exists, and the event's turn falls in
    the span's (turn_idx, next-span turn_idx) interval."""
    dangling = events.join(
        spans.select("span_id"),
        events.parent_span_id == spans.span_id,
        "left_anti",
    )
    assert dangling.count() == 0

    sp = spans.select(
        F.col("span_id").alias("sid"),
        F.col("conv_id").alias("sconv"),
        F.col("turn_idx").alias("sturn"),
    )
    j = events.join(sp, events.parent_span_id == sp.sid)
    assert j.filter(
        (F.col("conv_id") != F.col("sconv")) | (F.col("turn_idx") <= F.col("sturn"))
    ).count() == 0

    # events + spans together account for every turn with a preceding span
    n_turns_covered = base.filter(F.col("cur_span_id").isNotNull()).count()
    assert events.count() + spans.count() == n_turns_covered


def test_links_are_same_tool_continuations(spans):
    from otel_arrow_spark.signals import span_links_table

    links = span_links_table(spans)
    sp = spans.select(
        F.col("span_id").alias("lsid"),
        F.col("tool").alias("ltool"),
        F.col("conv_id").alias("lconv"),
    )
    j = links.join(sp, links.linked_span_id == sp.lsid)
    assert j.count() == links.count()  # every link resolves
    assert j.filter(
        (F.col("tool") != F.col("ltool"))
        | (F.col("conv_id") != F.col("lconv"))
        | (F.col("linked_turn_idx") >= F.col("turn_idx"))
    ).count() == 0


def test_histogram_merge_is_lossless(base):
    """Merged histograms must equal a direct aggregation of the points —
    the distributive-merge property of histogram data points."""
    from otel_arrow_spark.signals import (
        HIST_BOUNDS, histogram_data_points, merge_histograms, metric_points,
    )

    points = metric_points(base).cache()
    merged = merge_histograms(histogram_data_points(points))
    direct = (
        points.filter(F.col("value").isNotNull())
        .groupBy("metric_name", F.date_trunc("hour", "time_ts").alias("hour"))
        .agg(
            F.count("value").alias("point_count"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    m = {
        (r.metric_name, r.hour): (r.point_count, r.sum_value, r.min_value, r.max_value)
        for r in merged.collect()
    }
    d = {
        (r.metric_name, r.hour): (r.point_count, r.sum_value, r.min_value, r.max_value)
        for r in direct.collect()
    }
    assert m == d and len(m) > 0

    # bucket counts sum to point_count in every merged histogram
    bad = merged.filter(
        F.aggregate(
            "bucket_counts", F.lit(0).cast("long"), lambda acc, x: acc + x
        )
        != F.col("point_count")
    )
    assert bad.count() == 0
    assert len(HIST_BOUNDS) + 1 == 6


def test_exemplars_link_into_traces(base, spans):
    from otel_arrow_spark.signals import exemplars_table, metric_points

    points = metric_points(base)
    ex = exemplars_table(points)
    assert ex.filter(F.col("value") < 90).count() == 0
    # exemplars with a span linkage resolve into the spans table
    linked = ex.filter(F.col("span_id").isNotNull())
    dangling = linked.join(
        spans.select("span_id"), "span_id", "left_anti"
    )
    assert dangling.count() == 0


def test_signal_base_single_window_exchange(spark, transcripts):
    """Scale guard: the whole per-turn derivation must be ONE Window
    operator (one shuffle on conv_id, one sort) — four frames sharing a
    partition/order, not four exchanges. (Built uncached: a cached
    fixture's InMemoryRelation echoes its child plan in toString.)"""
    from otel_arrow_spark.parse import parse_turns
    from otel_arrow_spark.router import route_turns
    from otel_arrow_spark.signals import signal_base

    fresh = signal_base(route_turns(parse_turns(transcripts.localCheckpoint())))
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    n_window_ops = sum(
        1 for line in plan.splitlines() if line.lstrip(" +-:*(").startswith("Window ")
    )
    assert n_window_ops == 1, plan


def test_exp_histogram_merge_is_lossless(base):
    """Same-scale exponential-histogram merge = direct aggregation, and
    bucket sums + zero_count account for every point."""
    from otel_arrow_spark.signals import (
        exp_histogram_data_points, merge_exp_histograms, metric_points,
    )

    points = metric_points(base)
    merged = merge_exp_histograms(exp_histogram_data_points(points))
    direct = (
        points.filter(F.col("value").isNotNull())
        .groupBy("metric_name", F.date_trunc("hour", "time_ts").alias("hour"))
        .agg(F.count("value").alias("point_count"))
    )
    m = {(r.metric_name, r.hour): r.point_count for r in merged.collect()}
    d = {(r.metric_name, r.hour): r.point_count for r in direct.collect()}
    assert m == d and m
    bad = merged.filter(
        F.aggregate("bucket_counts", F.lit(0).cast("long"), lambda a, x: a + x)
        + F.col("zero_count")
        != F.col("point_count")
    )
    assert bad.count() == 0


def test_exp_bucket_index_lower_exclusive_boundaries(spark):
    """OTel exponential-histogram boundary convention at scale 0: bucket
    k covers (2^k, 2^(k+1)], so v = 2^k lands in bucket k-1 and v ≤ 1
    lands in zero_count. Computed with integer bit-length arithmetic —
    exact at every power-of-2 boundary (where float log is one ulp away
    from wrong)."""
    vals = [0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 7.0, 8.0, 8.5, 127.0, 128.0, 1024.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    v = F.col("value")
    v_int = v.try_cast("bigint")
    is_pow2 = (v == v_int.cast("double")) & (v_int.bitwiseAND(v_int - 1) == 0)
    idx = F.when(
        v > 1,
        F.length(F.bin(v_int)) - F.lit(1) - F.when(is_pow2, 1).otherwise(0),
    )
    got = {r.value: r.idx for r in df.select("value", idx.alias("idx")).collect()}
    import math

    def expect(x: float):
        if x <= 1:
            return None  # zero bucket
        return int(math.ceil(math.log2(x))) - 1

    assert got == {x: expect(x) for x in vals}
    # spot the boundary cases the convention is about
    assert got[2.0] == 0 and got[3.0] == 1 and got[4.0] == 1
    assert got[8.0] == 2 and got[8.5] == 3
    assert got[128.0] == 6 and got[1.0] is None


def test_exp_histogram_pow2_values_respect_boundaries(spark):
    """End-to-end: points at exact powers of two bucket lower-exclusively
    through exp_histogram_data_points."""
    from otel_arrow_spark.signals import exp_histogram_data_points

    rows = [
        ("m", "h", "2026-01-01 00:10:00", v)
        for v in [0.0, 1.0, 2.0, 2.5, 4.0, 64.0, 128.0, 129.0, 500.0]
    ]
    pts = spark.createDataFrame(
        rows, "metric_name string, host string, s string, value double"
    ).withColumn("time_ts", F.col("s").cast("timestamp"))
    out = exp_histogram_data_points(pts).collect()
    assert len(out) == 1
    r = out[0]
    # 0.0 and 1.0 → zero_count; 2.0 → bucket 0; 2.5, 4.0 → bucket 1;
    # 64.0 → bucket 5; 128.0 → bucket 6; 129.0, 500.0 → overflow
    assert r.zero_count == 2
    assert list(r.bucket_counts) == [1, 2, 0, 0, 0, 1, 1, 2]
    assert r.point_count == 9


# ---------------------------------------------------------------------------
# star-schema closure (SPAN_EVENT_ATTRS / SPAN_LINK_ATTRS / resource+scope /
# LOGS / exemplar attrs) — payload closure per arrow_service.proto:65-104
# ---------------------------------------------------------------------------

def test_event_attrs_point_at_real_events(base, events):
    from otel_arrow_spark.signals import span_event_attrs_table

    ea = span_event_attrs_table(base)
    dangling = ea.join(
        events, ea.parent_id == events.event_id, "left_anti"
    )
    assert dangling.count() == 0
    assert ea.count() > 0


def test_link_attrs_typed_and_complete(base, spans):
    from otel_arrow_spark.signals import span_link_attrs_table, span_links_table

    links = span_links_table(spans).cache()
    la = span_link_attrs_table(links).cache()
    n_links = links.count()
    # exactly two attrs per link: one str (tool), one int (gap)
    assert la.count() == 2 * n_links
    per_type = {r.value_type: r.n for r in la.groupBy("value_type")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_type == {"str": n_links, "int": n_links}
    # sparse typed columns: exactly one value column non-null per row
    bad = la.filter(
        (F.col("str_value").isNotNull().cast("int")
         + F.col("int_value").isNotNull().cast("int")) != 1
    )
    assert bad.count() == 0
    # the int attr is the turn gap, always positive
    assert la.filter(
        (F.col("key") == "link.gap_turns") & (F.col("int_value") <= 0)
    ).count() == 0
    links.unpersist(); la.unpersist()


def test_logs_star_fks_resolve(base):
    from otel_arrow_spark.signals import (
        logs_table, resource_dim, scope_dim,
    )

    res, scp = resource_dim(base), scope_dim(base)
    logs = logs_table(base, res, scp).cache()
    n = logs.count()
    assert n > 0
    # every log record resolves both dims (log turns always parse host/app)
    assert logs.filter(F.col("resource_id").isNull()).count() == 0
    assert logs.filter(F.col("scope_id").isNull()).count() == 0
    # severity_text tracks severity_number through the syslog name table
    err = logs.filter(
        (F.col("severity_number") == 3) & (F.col("severity_text") != "err")
    )
    assert err.count() == 0
    # logs carry trace correlation: span_id resolves when inside a span
    assert logs.filter(F.col("trace_id").isNull()).count() == 0
    logs.unpersist()


def test_resource_scope_dims_are_dense_and_stable(base):
    from otel_arrow_spark.signals import (
        resource_attrs_table, resource_dim, scope_attrs_table, scope_dim,
    )

    res = resource_dim(base).collect()
    ids = sorted(r.resource_id for r in res)
    assert ids == list(range(1, len(res) + 1))  # dense, 1-based
    # content-derived: same host always same id across derivations
    res2 = {r.host: r.resource_id for r in resource_dim(base).collect()}
    assert {r.host: r.resource_id for r in res} == res2
    ra = resource_attrs_table(resource_dim(base))
    assert ra.count() == 2 * len(res)
    scp = scope_dim(base)
    sa = scope_attrs_table(scp)
    assert sa.count() == 2 * scp.count()


def test_span_events_to_logs_duality(base, spans, events):
    from otel_arrow_spark.signals import logs_from_span_events

    logs = logs_from_span_events(events, spans)
    # every span event round-trips to exactly one log record
    assert logs.count() == events.count()
    assert logs.filter(F.col("trace_id").isNull()).count() == 0


def test_exemplar_attrs_subset_of_exemplars(base):
    from otel_arrow_spark.signals import (
        exemplar_attrs_table, exemplars_table, metric_points,
    )

    points = metric_points(base).cache()
    ex_ids = {r.parent_point_id for r in exemplars_table(points).collect()}
    ea = exemplar_attrs_table(points).collect()
    assert ea and {r.parent_id for r in ea} <= ex_ids
    points.unpersist()


def test_summary_percentiles_exact_vs_approx(base):
    """`summary_data_points(exact=False)` is the bounded-memory scale
    path (Greenwald-Khanna sketch, state ∝ accuracy, mergeable map-side)
    vs the oracle-gated exact path that buffers whole groups. Same
    schema, same groups; and the GK guarantee is a RANK bound, not a
    value bound — the sketch returns a real group element whose rank is
    within ε·n of the target. So the assertion is the rank bound itself
    (±1 rank of slack on top of ε·n ≈ 0 at this accuracy): counting the
    group's values below/at the approx answer must bracket the target
    rank p·n. Value- or interpolation-based tolerances are wrong here —
    element spacing is data-dependent and tiny groups interpolate
    between elements."""
    from otel_arrow_spark.signals import metric_points, summary_data_points

    pts = metric_points(base).cache()
    exact = summary_data_points(pts, exact=True)
    approx = summary_data_points(pts, exact=False)
    assert exact.columns == approx.columns
    assert exact.count() == approx.count()

    v = F.col("value")
    keyed = pts.filter(v.isNotNull()).select(
        "metric_name",
        F.date_trunc("hour", F.col("time_ts")).alias("hour"),
        "value",
    )
    j = keyed.join(
        approx.select("metric_name", "hour", "q50", "q99"),
        ["metric_name", "hour"],
    )
    eps = 1e-6
    ranks = j.groupBy("metric_name", "hour").agg(
        F.count(v).alias("n"),
        F.sum((v < F.col("q50") - eps).cast("long")).alias("lt50"),
        F.sum((v <= F.col("q50") + eps).cast("long")).alias("le50"),
        F.sum((v < F.col("q99") - eps).cast("long")).alias("lt99"),
        F.sum((v <= F.col("q99") + eps).cast("long")).alias("le99"),
    )
    # element rank interval (lt, le] must overlap [floor(p·n), ceil(p·n)+1]
    def _ok(p: float, lt, le):
        t = F.col("n") * p
        return (F.col(lt) <= F.ceil(t)) & (F.col(le) >= F.floor(t))

    bad = ranks.filter(
        ~_ok(0.5, "lt50", "le50") | ~_ok(0.99, "lt99", "le99")
    ).count()
    assert bad == 0
    pts.unpersist()
