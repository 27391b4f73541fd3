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


def test_normalize_to_known_schema(spark):
    """parquet_exporter/schema.rs analog: missing optional columns →
    typed nulls, column order canonicalized, compatible casts applied,
    nested struct fields normalized, unknown columns dropped (or raise
    under strict)."""
    from pyspark.sql import functions as F

    from otel_arrow_spark.catalog import normalize_to_schema

    target = (
        "id bigint, severity int, body string, "
        "meta struct<host: string, port: int>, extra_missing double"
    )
    df = spark.createDataFrame(
        [(1, "7", "hello", ("h1",), "junk")],
        "id int, severity string, body string, meta struct<host: string>, "
        "unknown_col string",
    )
    out = normalize_to_schema(df, target)
    assert [f.name for f in out.schema.fields] == [
        "id", "severity", "body", "meta", "extra_missing"
    ]
    row = out.collect()[0]
    assert row.id == 1 and row.severity == 7  # int-widening + string cast
    assert row.meta.host == "h1" and row.meta.port is None  # nested null fill
    assert row.extra_missing is None
    assert out.schema["id"].dataType.simpleString() == "bigint"

    # two differently-shaped batches normalize to union-writable schemas
    df2 = spark.createDataFrame([(2, 3)], "id int, severity int")
    out2 = normalize_to_schema(df2, target)
    both = out.unionByName(out2)
    assert both.count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_to_schema(df, target, strict=True)

    # null struct rows stay null (not a struct of nulls)
    df3 = spark.createDataFrame(
        [(3, None)], "id int, meta struct<host: string>"
    )
    row3 = normalize_to_schema(df3, target).collect()[0]
    assert row3.meta is None


def test_normalize_nested_struct_recursion(spark):
    """Struct-within-struct normalizes at every depth: missing inner
    fields fill with typed nulls, extra inner fields drop (or raise
    under strict), deep casts apply."""
    import pytest as _pytest

    from otel_arrow_spark.catalog import normalize_to_schema

    target = (
        "id bigint, "
        "outer struct<inner: struct<a: bigint, b: string>, tag: string>"
    )
    df = spark.createDataFrame(
        [(1, ((7, "junk"), "t"))],
        "id int, outer struct<inner: struct<a: int, stale: string>, tag: string>",
    )
    out = normalize_to_schema(df, target)
    row = out.collect()[0]
    assert row.outer.inner.a == 7          # deep cast int→bigint
    assert row.outer.inner.b is None       # deep missing → typed null
    assert "stale" not in row.outer.inner.asDict()  # deep extra dropped
    assert out.schema["outer"].dataType["inner"].dataType["a"] \
        .dataType.simpleString() == "bigint"

    # strict flags the NESTED unknown field, naming its path
    with _pytest.raises(ValueError, match="outer.inner.stale"):
        normalize_to_schema(df, target, strict=True)


def test_bucketed_tables_join_and_agg_without_exchange(spark, tmp_path):
    """Bucketed writes pay the shuffle once at ingest: a join of two
    tables bucketed on the same key with the same bucket count, and an
    aggregation on the bucket key, must both plan with ZERO Exchange
    operators (the co-located-join contract the docstring promises)."""
    from otel_arrow_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    left = spark.range(1000).select(
        (F.col("id") % 50).alias("conv_id"), F.col("id").alias("turn"),
    )
    right = spark.range(50).select(
        F.col("id").alias("conv_id"), (F.col("id") * 2).alias("meta"),
    )
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    try:
        cat.write_bucketed(left, "bt_left", 8, ["conv_id"],
                           sort_by=["conv_id"])
        cat.write_bucketed(right, "bt_right", 8, ["conv_id"],
                           sort_by=["conv_id"])
        lt, rt = cat.read_table("bt_left"), cat.read_table("bt_right")

        agg = lt.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

        # the tiny right side would auto-broadcast (also Exchange-free
        # in the shuffle sense, but it hides the bucketing); force the
        # sort-merge path a big-big join would take
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = lt.join(rt, "conv_id")
            jplan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in jplan, jplan
            assert "SortMergeJoin" in jplan
            # bucketed scan actually engaged (not re-shuffled input)
            assert "Bucketed: true" in jplan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        got = {r.conv_id: r.n for r in agg.collect()}
        assert got == {i: 20 for i in range(50)}
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")
