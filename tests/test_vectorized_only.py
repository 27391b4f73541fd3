"""Guardrail: no row-at-a-time Python UDFs anywhere in the package
(input_hint: vectorized pandas/Arrow UDFs only; SURVEY §7.3 risk 5)."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "otel_arrow_spark"

FORBIDDEN = [
    re.compile(r"\bF\.udf\("),
    re.compile(r"^\s*@udf\b", re.M),
    re.compile(r"\bfunctions\.udf\("),
    re.compile(r"\.rdd\b"),  # no RDD hot paths either
    re.compile(r"\bcollect\(\)\s*\)?\s*for\b"),  # driver-side loops over collect
]

# The ONE sanctioned exception: a driver loop over a collect whose result
# is bounded by construction (k·dim centroid matrix per k-means
# iteration — the Spark ML KMeans driver-loop shape, never data-sized).
# It must be explicitly annotated at the collect site; anything
# unannotated still fails.
ALLOW_MARK = "# bounded-driver-collect"


def test_no_scalar_udfs_or_rdds():
    offenders = []
    for py in PKG.rglob("*.py"):
        src = "\n".join(
            line for line in py.read_text().splitlines()
            if ALLOW_MARK not in line
        )
        for pat in FORBIDDEN:
            if pat.search(src):
                offenders.append((str(py), pat.pattern))
    assert not offenders, offenders
