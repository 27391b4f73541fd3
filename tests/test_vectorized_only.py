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


def test_no_scalar_udfs_or_rdds():
    offenders = []
    for py in PKG.rglob("*.py"):
        src = py.read_text()
        for pat in FORBIDDEN:
            if pat.search(src):
                offenders.append((str(py), pat.pattern))
    assert not offenders, offenders
