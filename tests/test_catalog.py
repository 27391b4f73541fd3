"""Catalog table-layer matrix: every available format must satisfy the
same contract (write/read roundtrip, partitioned writes, dynamic
partition overwrite replacing — not duplicating — a partition).

The matrix is parquet-only in this sandbox (no Iceberg jars, no network
to fetch them — see the provisioning note in ``catalog.py``); on a
runtime that carries ``iceberg-spark-runtime`` the same tests run
against the real format via :func:`available_formats`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.catalog import available_formats, iceberg_available


def _formats():
    # evaluated lazily per-session inside the test via the fixture; the
    # parametrize list covers both, with iceberg skipped when absent
    return ["parquet", "iceberg"]


@pytest.mark.parametrize("fmt", _formats())
def test_catalog_roundtrip_matrix(spark, tmp_path, fmt):
    from otel_arrow_spark.catalog import Catalog

    if fmt == "iceberg" and not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on classpath in this sandbox")
    assert fmt in available_formats(spark)

    cat = Catalog(spark, str(tmp_path), format=fmt)
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))

    cat.write(df, "t", partition_by=["part"])
    back = cat.read("t")
    assert back.count() == 100
    assert {r.part for r in back.select("part").distinct().collect()} == {0, 1, 2, 3}

    # dynamic partition overwrite: rewriting part=1 replaces it only
    repl = (
        spark.range(1000, 1005)
        .withColumn("part", F.lit(1).cast("int"))
    )
    cat.overwrite_partitions(repl, "t", ["part"])
    after = cat.read("t")
    assert after.filter(F.col("part") == 1).count() == 5
    assert after.filter(F.col("part") != 1).count() == 75
