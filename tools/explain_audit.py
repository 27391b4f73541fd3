#!/usr/bin/env python
"""Physical-plan audit for every __spark_entry__ query.

For each query, prints a one-line summary of plan health signals at
scale: pushed filters, scan column pruning, broadcast vs sort-merge
joins, exchange (shuffle) count, and whole-stage-codegen coverage.
Use ``-v NAME`` to dump a full formatted plan.

Usage: python tools/explain_audit.py [sf_dir] [-v query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    verbose = []
    if "-v" in args:
        i = args.index("-v")
        verbose = args[i + 1:]
        args = args[:i]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from otel_arrow_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        formatted = None
        if name in verbose:
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ) if hasattr(df._sc._jvm, "PythonSQLUtils") else plan
        n_exchange = plan.count("Exchange")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_codegen = len(re.findall(r"\*\(\d+\)", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_n = sum(1 for p in pushed if p.strip())
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widest_scan = max((len(s.split(",")) for s in scans), default=0)
        print(
            f"{name:32s} exch={n_exchange} bhj={n_bhj} smj={n_smj} "
            f"codegen={n_codegen} pushed={pushed_n} widest_scan={widest_scan}"
        )
        if formatted:
            print(formatted)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
