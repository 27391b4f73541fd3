#!/usr/bin/env python
"""Run KQL query strings over parquet tables from the command line.

The user-facing analog of the reference's KQL-over-OTLP entry point
(`engine-recordset-otlp-bridge/src/bridge.rs:18-36`): the query names a
table in --data as its source, flows through the parser
(`otel_arrow_spark.operators.kql_parser`) into a Catalyst plan, and
prints the result.

Examples:
    python tools/kql_shell.py --data /root/testdata/sf0.001 \
        "events | where value > 90 | summarize n = count() by event_type"
    python tools/kql_shell.py --data /root/testdata/sf0.001 --explain \
        "lineitem | where l_quantity > 30 | take 5"
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", help="KQL pipeline, starting with the table name")
    ap.add_argument("--data", default="/root/testdata/sf0.001",
                    help="directory of <table>.parquet files")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the plan")
    args = ap.parse_args()

    from otel_arrow_spark.operators.kql_parser import KqlError, kql
    from otel_arrow_spark.session import get_spark

    body = args.query.split(";")[-1]
    m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)", body)
    if not m:
        print("error: query must start with a table name", file=sys.stderr)
        return 2
    table = m.group(1)
    path = os.path.join(args.data, f"{table}.parquet")
    if not os.path.exists(path):
        print(f"error: no table {table!r} under {args.data}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="kql-shell")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        out = kql(spark.read.parquet(path), args.query)
    except KqlError as e:
        print(f"KQL error: {e}", file=sys.stderr)
        return 1
    if args.explain:
        out.explain("formatted")
    out.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
