"""Physical-plan guardrails over EVERY driver-gated query.

The static source guard (`test_vectorized_only.py`) proves no scalar
Python UDFs exist in the package; this file audits what Catalyst
actually PLANS for each `__spark_entry__.queries()` entry — the same
checks the round reviews apply by hand (VERDICT r2 "plan audit": no
cartesian products, no row-at-a-time Python in any gated query plan),
kept green mechanically from now on.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    from otel_arrow_spark.dataops.dedup import release_caches

    release_caches()
    return out


def test_no_cartesian_products(plans):
    """A CartesianProduct (both sides large, no keys) is never an
    acceptable physical strategy at 100 TB; the blocked/bucketed
    variants exist precisely to avoid it. BroadcastNestedLoopJoin over
    an explicitly broadcast-sized side is allowed (brute-force ANN
    baseline) — that is a different operator string."""
    bad = sorted(n for n, p in plans.items() if "CartesianProduct" in p)
    assert not bad, f"cartesian product planned in: {bad}"


def test_no_row_python_in_plans(plans):
    """BatchEvalPython is the row-at-a-time Python operator (pickled
    rows both ways). Arrow-vectorized operators (ArrowEvalPython,
    FlatMapGroupsInPandas, MapInPandas/Arrow) are the sanctioned Python
    seams; none of the gated queries should need even those — they are
    all JVM-side — but only the row-serialized form is forbidden here."""
    bad = sorted(n for n, p in plans.items() if "BatchEvalPython" in p)
    assert not bad, f"row-at-a-time Python planned in: {bad}"


def test_gated_queries_are_jvm_side(plans):
    """Stronger form of the above, asserted as an inventory: every gated
    query's plan is entirely JVM-side today (zero Python eval operators
    of any kind). If a future query legitimately needs a pandas seam,
    add it to the allowlist with a comment saying why."""
    allow: set[str] = {
        # the multimodal codec seam: features over opaque binary
        # payloads via Arrow-batched mapInPandas — the one place the
        # brief sanctions a pandas stage (image/audio decode libs are a
        # runtime swap-in; the Spark-side plumbing is what's under test)
        "media_byte_features",
        # the KQL `scan` operator: sequential per-group state machine
        # (steps may reference arbitrary prior-match state) — inherently
        # order-dependent imperative logic, run as ONE Arrow-batched
        # applyInPandas per serialize-group; step predicates are
        # evaluated JVM-side into boolean flag columns first, so the
        # pandas stage only walks precomputed flags
        # (operators/kql_parser.py, the `scan` stage).
        # The property test (test_scan_property.py) proves it against an
        # in-driver reference simulation.
        "kql_text_scan_matches",
        # same seam, with declare(...) state variables — accumulator
        # assignments and state-referencing predicates are inherently
        # prefix-dependent (see test_scan_declare_property_vs_reference)
        "kql_text_scan_declare",
        # the zlib/gzip ↔ base64 codec quartet: Catalyst has no
        # deflate expression, so the codec runs as an Arrow-batched
        # pandas_udf (kql_parser._b64_codec_udf) — per-value pure
        # compute, no shuffle/state; degradation + round-trip are
        # value-gated by the DuckDB oracle
        "kql_compress_roundtrip",
        # same codec seam: RFC-3492 punycode (Python's punycode codec;
        # no Catalyst twin) and parse_xml's XML→JSON step — per-value
        # pure compute, value-gated by the DuckDB oracle
        "kql_scalar_suite11",
    }
    python_ops = ("ArrowEvalPython", "FlatMapGroupsInPandas",
                  "MapInPandas", "BatchEvalPython")
    bad = sorted(
        n for n, p in plans.items()
        if n not in allow and any(op in p for op in python_ops)
    )
    assert not bad, f"python eval operators planned in: {bad}"
