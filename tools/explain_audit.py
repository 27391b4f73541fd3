#!/usr/bin/env python
"""Physical-plan audit for every __spark_entry__ query.

For each query, prints a one-line summary of plan health signals at
scale: pushed filters, scan column pruning, broadcast vs sort-merge
joins, exchange (shuffle) count, and whole-stage-codegen coverage.
Use ``-v NAME`` to dump a full formatted plan; ``--md`` additionally
writes the per-query inventory to BENCH/plan_audit.md (the generated
form of the per-round review's plan audit, including the two hard
rules: zero CartesianProducts, zero row-serialized Python).

Usage: python tools/explain_audit.py [sf_dir] [-v query ...] [--md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    write_md = "--md" in args
    if write_md:
        args.remove("--md")
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

    rows = []
    for name, fn in sorted(entry.queries().items()):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        formatted = None
        if name in verbose:
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ) if hasattr(df._sc._jvm, "PythonSQLUtils") else plan
        c = {
            "exch": plan.count("Exchange"),
            "rr": len(re.findall("Exchange RoundRobinPartitioning", plan)),
            "bcast": plan.count("BroadcastExchange"),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "py_row": plan.count("BatchEvalPython"),
            "py_arrow": len(re.findall(
                r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas"
                r"|MapInArrow", plan)),
            "window": len(re.findall(r"\bWindow\b", plan)),
            "topk": plan.count("TakeOrderedAndProject"),
            "codegen": len(re.findall(r"\*\(\d+\)", plan)),
        }
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        c["pushed"] = sum(1 for p in pushed if p.strip())
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        c["widest_scan"] = max((len(s.split(",")) for s in scans), default=0)
        rows.append((name, c))
        print(
            f"{name:32s} exch={c['exch']} bhj={c['bhj']} smj={c['smj']} "
            f"codegen={c['codegen']} pushed={c['pushed']} "
            f"widest_scan={c['widest_scan']}"
        )
        if formatted:
            print(formatted)

    from otel_arrow_spark.dataops.dedup import release_caches

    release_caches()

    if write_md:
        bad_cart = [n for n, c in rows if c["cartesian"]]
        bad_py = [n for n, c in rows if c["py_row"]]
        out = [
            "# Plan audit — every gated query "
            "(tools/explain_audit.py --md)",
            "",
            f"Input: `{sf_dir}` (plan shape only). Shuffle Exchanges",
            "include the deliberate RoundRobin small-file spread (rr);",
            "Arrow-form Python is allowed only for the two sanctioned",
            "seams (media features, scan state machine); row-serialized",
            "Python and CartesianProducts are forbidden everywhere",
            "(`tests/test_plan_guard.py` enforces both).",
            "",
            "| query | exch | rr | bcast | SMJ | BHJ | BNLJ | cartesian |"
            " pyRow | pyArrow | window | topk | pushed |",
            "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
        ]
        for name, c in rows:
            out.append(
                f"| `{name}` | {c['exch']} | {c['rr']} | {c['bcast']} "
                f"| {c['smj']} | {c['bhj']} | {c['bnlj']} "
                f"| {c['cartesian']} | {c['py_row']} | {c['py_arrow']} "
                f"| {c['window']} | {c['topk']} | {c['pushed']} |"
            )
        out += [
            "",
            f"**Totals:** {len(rows)} queries; cartesian products: "
            f"{len(bad_cart)} ({bad_cart or 'none'}); row-serialized "
            f"Python: {len(bad_py)} ({bad_py or 'none'}).",
        ]
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH", "plan_audit.md",
        )
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
        print(f"wrote {path} ({len(rows)} queries)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
