"""SparkSession factory with scale-appropriate defaults.

The reference engine is thread-per-core share-nothing
(`rust/otap-dataflow/crates/engine/README.md`); the Spark analog is the
executor/task model. We set AQE + Arrow transfer on by default so the same
code runs on local[N] in tests and on a multi-executor cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "otel-arrow-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the pipeline.

    - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
      stands in for the reference's batch split/concat operators
      (`rust/otel-arrow-rust/src/otap/groups.rs:108-132`).
    - Arrow-backed pandas UDF transfer on: the analog of the reference's
      zero-copy columnar views (`crates/pdata/src/views/otlp/bytes`).
    """
    cores = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cores, 8)))
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
    )
    # Python-worker process model. Default: forking daemon (fastest).
    # The Arrow/RE2 parse path (mapInArrow) intermittently wedges a
    # forked worker (~50% of 20M-row runs at local[2]: one task hangs
    # silently, "Python worker exited unexpectedly" surfaces on kill);
    # spawn-mode workers (use.daemon=false) showed 0 wedges in 4/4 runs
    # while fork-per-task (worker.reuse=false) still wedged — i.e. the
    # fork itself is unsafe with the Arrow-threaded worker, so spawn is
    # the mitigation. run_pipeline flips this automatically for
    # SPARK_GRAFT_PARSE_IMPL=arrow; override with SPARK_GRAFT_PYTHON_DAEMON.
    daemon = os.environ.get("SPARK_GRAFT_PYTHON_DAEMON")
    if daemon is not None:
        builder = builder.config("spark.python.use.daemon", daemon)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
