"""spark-submit entry point for the transcript pipeline.

Usage:
    spark-submit --py-files otel_arrow_spark.zip run_pipeline.py \
        --input /data/fixtures --output /data/out [--resume] [--n-slices 16]

If ``--input`` has no transcripts.parquet and ``--gen-rows N`` is given,
a deterministic fixture is generated first (seed 42).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="dir with transcripts/tool_catalog/role_catalog parquet")
    ap.add_argument("--output", required=True, help="output catalog root")
    ap.add_argument("--gen-rows", type=int, default=0, help="generate fixture of N rows if missing")
    ap.add_argument("--n-slices", type=int, default=8, help="checkpoint slices (resume granularity)")
    ap.add_argument("--resume", action="store_true", help="skip slices already completed")
    ap.add_argument("--fail-on-slice", type=int, default=None, help="inject failure (testing)")
    ap.add_argument("--stream", action="store_true",
                    help="run as a Structured Streaming job (availableNow "
                         "trigger): transactional partitioned file sink + "
                         "checkpoint under --output")
    ap.add_argument("--bench", action="store_true",
                    help="single-pass throughput mode: parse→enrich→route→"
                         "sink write + counts, no checkpoint slicing")
    ap.add_argument("--repeat", type=int, default=1,
                    help="bench repetitions (best run reported)")
    ap.add_argument("--sink", choices=["parquet", "noop"], default="parquet",
                    help="bench terminal sink: parquet (storage incl.) or "
                         "noop (perf-exporter analog; isolates compute "
                         "scaling from single-disk write contention)")
    args = ap.parse_args(argv)

    from otel_arrow_spark.catalog import Catalog
    from otel_arrow_spark.fixtures import write_fixture_tables
    from otel_arrow_spark.lineage import CheckpointedPipeline
    from otel_arrow_spark.pipeline import build_pipeline
    from otel_arrow_spark.session import get_spark

    tpath = os.path.join(args.input, "transcripts.parquet")
    if not os.path.exists(tpath):
        if not args.gen_rows:
            print(f"error: {tpath} missing and --gen-rows not given", file=sys.stderr)
            return 2
        write_fixture_tables(args.input, args.gen_rows)

    # Arrow parse path: spawn-mode Python workers (no forking daemon) —
    # the measured fix for the intermittent forked-worker wedge (see
    # session.get_spark). ~25% slower per-task startup at tiny core
    # counts, zero hangs in 4/4 20M-row trials vs 2/4 with the daemon.
    if os.environ.get("SPARK_GRAFT_PARSE_IMPL") == "arrow":
        os.environ.setdefault("SPARK_GRAFT_PYTHON_DAEMON", "false")
    spark = get_spark(app_name="otel-arrow-pipeline")
    t0 = time.time()
    transcripts = spark.read.parquet(tpath)
    tools = spark.read.parquet(os.path.join(args.input, "tool_catalog.parquet"))
    roles = spark.read.parquet(os.path.join(args.input, "role_catalog.parquet"))

    if args.bench:
        return _bench(spark, args, transcripts, tools, roles)
    if args.stream:
        return _stream(spark, args, tpath, tools, roles)

    catalog = Catalog(spark, args.output)
    if not args.resume:
        # fresh run: clear ledger + sink so counts are for this input only
        ledger = os.path.join(args.output, "_lineage.jsonl")
        if os.path.exists(ledger):
            os.remove(ledger)
    runner = CheckpointedPipeline(catalog, n_slices=args.n_slices)
    fingerprint = f"{tpath}:{os.path.getmtime(tpath)}"
    state = runner.run(
        transcripts, tools, roles, input_fingerprint=fingerprint,
        fail_on_slice=args.fail_on_slice,
    )

    result = build_pipeline(transcripts, tools, roles)
    counts = {r["sink"]: r["n_rows"] for r in result.sink_counts.collect()}
    n = sum(counts.values())
    elapsed = time.time() - t0
    print(json.dumps({
        "rows": n,
        "sink_counts": counts,
        "slices_ran": state["ran"],
        "slices_skipped": state["skipped"],
        "elapsed_sec": round(elapsed, 2),
        "turns_per_sec": round(n / elapsed, 1),
        "output": args.output,
    }))
    return 0


def _stream(spark, args, tpath: str, tools, roles) -> int:
    """Streaming form: same transformations, transactional file sink;
    re-running against the same checkpoint is a no-op (exactly-once)."""
    from pyspark.sql import functions as F

    from otel_arrow_spark.streaming import stream_pipeline

    out = os.path.join(args.output, "routed_stream")
    ckpt = os.path.join(args.output, "checkpoint")
    t0 = time.time()
    q = stream_pipeline(spark, tpath, out, ckpt, tools, roles)
    q.awaitTermination()
    routed = spark.read.parquet(out)
    counts = {
        r["sink"]: r["n"]
        for r in routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(counts.values())
    elapsed = time.time() - t0
    print(json.dumps({
        "mode": "stream",
        "rows": n,
        "sink_counts": counts,
        "elapsed_sec": round(elapsed, 2),
        "turns_per_sec": round(n / elapsed, 1),
        "output": out,
        "checkpoint": ckpt,
    }))
    return 0


def _bench(spark, args, transcripts, tools, roles) -> int:
    """Single-pass throughput: the full dataflow incl. partitioned sink
    write, one Spark job graph — the unit the scaling-efficiency rule
    measures at two parallelism levels."""
    from pyspark.sql import functions as F

    from otel_arrow_spark.enrich import enrich_turns
    from otel_arrow_spark.lineage import with_slice
    from otel_arrow_spark.parse import (
        parse_turns, parse_turns_arrow, parse_turns_pandas,
    )
    from otel_arrow_spark.router import route_turns

    impl = os.environ.get("SPARK_GRAFT_PARSE_IMPL", "native")
    parse = {
        "native": parse_turns,
        "arrow": parse_turns_arrow,
        "pandas": parse_turns_pandas,
    }[impl]

    best = None
    for rep in range(max(args.repeat, 1)):
        t0 = time.time()
        routed = route_turns(
            enrich_turns(parse(transcripts), tools, roles)
        )
        routed = with_slice(routed, args.n_slices)
        if args.sink == "noop":
            # perf-exporter analog (`crates/otap/src/perf_exporter`): the
            # noop-FORMAT write materializes every output column (a bare
            # count would let Catalyst prune the pipeline down to the
            # router subtree); counters then come from a second, pruned
            # pass — mirroring the parquet read-back.
            routed.write.format("noop").mode("overwrite").save()
            counts = {
                r["sink"]: r["n"]
                for r in routed.groupBy("sink")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        else:
            out = os.path.join(args.output, f"routed_bench_{rep}")
            routed.write.mode("overwrite").partitionBy("sink").parquet(out)
            counts = {
                r["sink"]: r["n"]
                for r in spark.read.parquet(out)
                .groupBy("sink")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        n = sum(counts.values())
        dt = time.time() - t0
        if best is None or dt < best[0]:
            best = (dt, n, counts)
    dt, n, counts = best
    print(json.dumps({
        "mode": "bench",
        "rows": n,
        "sink_counts": counts,
        "elapsed_sec": round(dt, 2),
        "turns_per_sec": round(n / dt, 1),
        "master": spark.sparkContext.master,
        "repeats": args.repeat,
        "parse_impl": impl,
        "sink": args.sink,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
