#!/usr/bin/env python
"""Solo re-bench of flagged queries: one fresh JVM, each query executed
REPEAT times back-to-back after a JVM warm-up, reporting every run.

Separates the two confounds that made round-2 regression adjudication
ambiguous:

- *cold-JIT cost* — the first execution of a plan pays codegen/JIT
  compilation (solo r2 re-bench: cold 2.5-3.3s vs warm ~1.2s for the
  identical 100k-row pipeline); a query's floor must be its warm,
  steady-state time;
- *session residue* — a query measured at the tail of a 74-query session
  inherits GC/cache pressure; a query measured solo-cold inherits JIT
  debt. Run N>1 in a fresh session and read run 2+.

Usage: python tools/solo_rebench.py [query ...]   (default: r2-flagged set)
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGGED = [
    "curation_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "media_byte_features",
]
REPEAT = 3


def main() -> None:
    names = sys.argv[1:] or FLAGGED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))

    import __spark_entry__ as entrymod
    from bench import run_to_completion
    from otel_arrow_spark.dataops.dedup import release_caches
    from otel_arrow_spark.session import get_spark

    spark = get_spark(app_name=f"solo-rebench-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        runs = []
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            run_to_completion(qs[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 4))
            release_caches()
        out[name] = {"runs": runs, "warm_best": min(runs[1:] or runs)}
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
