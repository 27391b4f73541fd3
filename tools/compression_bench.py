#!/usr/bin/env python
"""Compression-ratio bench — the analog of the reference's headline
benchmark genre (`docs/benchmarks.md`: OTAP-columnar vs OTLP+zstd,
logs ×1.85–×2.01 at batch ≥500).

Compares the routed pipeline output as:
  a) columnar zstd parquet, sorted within partitions by
     (conv_id, turn_idx) — the engine's sink format (sort-for-compression
     mirrors `go/pkg/otel/logs/arrow/optimizer.go:44-115`);
  b) columnar zstd parquet, unsorted (ablation: what the sort buys);
  c) row-oriented zstd-compressed JSON lines — the OTLP-bytes stand-in.

Writes BENCH/compression.md. Usage: python tools/compression_bench.py [rows]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def du(path: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**"), recursive=True)
        if os.path.isfile(p) and not p.endswith((".crc", "_SUCCESS"))
    )


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    work = "/tmp/compression_bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import functions as F

    from otel_arrow_spark.fixtures import write_fixture_tables
    from otel_arrow_spark.parse import parse_turns
    from otel_arrow_spark.router import route_turns
    from otel_arrow_spark.session import get_spark

    in_dir = os.path.join(work, "in")
    write_fixture_tables(in_dir, rows)
    spark = get_spark(app_name="compression-bench")
    spark.sparkContext.setLogLevel("ERROR")

    routed = route_turns(
        parse_turns(spark.read.parquet(os.path.join(in_dir, "transcripts.parquet")))
    ).drop("attrs")  # JSON baseline can't carry maps comparably

    sorted_out = os.path.join(work, "parquet_sorted")
    (
        routed.repartition(16, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .parquet(sorted_out)
    )
    unsorted_out = os.path.join(work, "parquet_unsorted")
    routed.repartition(16).write.mode("overwrite").parquet(unsorted_out)

    # row-oriented baseline: JSON lines, zstd'd per 8192-row batch
    # (reference default batch size, otap_batch_processor.rs:38)
    json_dir = os.path.join(work, "jsonl")
    routed.repartition(16).write.mode("overwrite").json(json_dir)
    json_raw = du(json_dir)
    # zlib level 6 as the generic row-compressor stand-in (no zstd module
    # guaranteed in-container; ratio genre comparable)
    json_comp = 0
    for p in glob.glob(os.path.join(json_dir, "part-*")):
        with open(p, "rb") as f:
            json_comp += len(zlib.compress(f.read(), 6))

    sp, up = du(sorted_out), du(unsorted_out)
    result = {
        "rows": rows,
        "parquet_sorted_bytes": sp,
        "parquet_unsorted_bytes": up,
        "jsonl_bytes": json_raw,
        "jsonl_zlib_bytes": json_comp,
        "ratio_vs_compressed_rows": round(json_comp / sp, 2),
        "ratio_vs_raw_rows": round(json_raw / sp, 2),
        "sort_gain": round(up / sp, 2),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "compression.md"), "w") as f:
        f.write(f"""# BENCH/compression — columnar sink vs row-oriented baseline

Reference analog: `docs/benchmarks.md` logs ×1.85–×2.01 (OTAP columnar
vs OTLP+zstd, batch ≥500). Same genre over the routed transcript sink
({rows:,} rows):

| encoding | bytes |
|---|---|
| zstd parquet, sorted (conv_id, turn_idx) | {sp:,} |
| zstd parquet, unsorted | {up:,} |
| JSON lines (row-oriented, raw) | {json_raw:,} |
| JSON lines + zlib-6 (row-oriented, compressed) | {json_comp:,} |

- **columnar-sorted vs compressed row-oriented: ×{result['ratio_vs_compressed_rows']}**
  (the reference's headline comparison)
- columnar-sorted vs raw row-oriented: ×{result['ratio_vs_raw_rows']}
- sort-for-compression gain (unsorted/sorted parquet): ×{result['sort_gain']}
  (`sortWithinPartitions` before the sink, mirroring the transport
  optimizer's sort)

Reproduce: `python tools/compression_bench.py {rows}`
""")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
