"""Independent pandas reimplementation of parse→enrich→route.

The correctness oracle for the Spark pipeline, mirroring the reference's
equivalence discipline (`/root/reference/docs/validation_process.md:12-33`,
`go/pkg/otel/assert/equiv.go:99-150`): a second, structurally different
implementation whose outputs the Spark pipeline must match set-wise.
Deliberately row-at-a-time / pandas — NOT shared code with the engine.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

V1 = re.compile(r'^<(\d{1,3})>1 (\S+) (\S+) (\S+) (\S+) (\S+) \[kv@0 ([^\]]*)\] (.*)$', re.S)
V2 = re.compile(r'^<(\d{1,3})>([A-Z][a-z]{2}) ([ 0-9]?\d) (\d{2}:\d{2}:\d{2}) (\S+) ([^:]+): (.*)$', re.S)
V3 = re.compile(r'^CEF:0\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|(.*)$', re.S)
KV1 = re.compile(r'(\w+)="([^"]*)"')
KV3 = re.compile(r"(\w+)=([^ ]*)")


def parse_row(text: str) -> dict:
    m = V1.match(text)
    if m:
        pri = int(m.group(1))
        return {
            "format": "rfc5424", "facility": pri // 8, "severity": pri % 8,
            "host": m.group(3), "app": m.group(4), "event_name": m.group(6),
            "body": m.group(8), "attrs": dict(KV1.findall(m.group(7))),
        }
    m = V2.match(text)
    if m:
        pri = int(m.group(1))
        return {
            "format": "rfc3164", "facility": pri // 8, "severity": pri % 8,
            "host": m.group(5), "app": m.group(6), "event_name": None,
            "body": m.group(7), "attrs": None,
        }
    m = V3.match(text)
    if m:
        sev = m.group(6)
        return {
            "format": "cef", "facility": None,
            "severity": int(sev) if sev.isdigit() else None,
            "host": m.group(2), "app": m.group(1), "event_name": m.group(5),
            "body": m.group(7), "attrs": dict(KV3.findall(m.group(7))),
        }
    return {
        "format": "malformed", "facility": None, "severity": None,
        "host": None, "app": None, "event_name": None, "body": None, "attrs": None,
    }


def parse_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    parsed = pd.DataFrame([parse_row(t) for t in pdf["text"]], index=pdf.index)
    return pd.concat([pdf, parsed], axis=1)


def route_row(row) -> str:
    if row["role"] == "tool" and row["tool"] is not None and not pd.isna(row["tool"]):
        return "sink_traces"
    if row["format"] == "malformed":
        return "sink_malformed"
    if row["format"] == "cef" or (
        row["event_name"] and re.match(r"^metric[.:]", row["event_name"])
    ):
        return "sink_metrics"
    return "sink_logs"


def route_oracle(parsed: pd.DataFrame) -> pd.DataFrame:
    out = parsed.copy()
    out["sink"] = [route_row(r) for _, r in parsed.iterrows()]
    return out


def counts_oracle(routed: pd.DataFrame) -> pd.DataFrame:
    """Per (sink, tool, hour) counts; hour as naive datetime."""
    df = routed.copy()
    df["hour"] = df["ts"].dt.floor("h")
    g = (
        df.groupby(["sink", "tool", "hour"], dropna=False)
        .size()
        .reset_index(name="n_turns")
    )
    return g
