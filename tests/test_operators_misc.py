"""Operator-library tests: sampling, marshalers, salted aggregation,
map/EAV transforms, discard, summarize cardinality cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_zap_sample_per_group_pattern(spark):
    from otel_arrow_spark.operators.sampling import zap_sample

    rows = [(1, i, f"2026-01-01 00:{i:02d}:00") for i in range(30)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, s string")
    df = df.withColumn("ts", F.col("s").cast("timestamp"))
    out = zap_sample(df, ["user_id"], ["ts", "event_id"], initial=2, thereafter=10)
    got = sorted(r.sample_rank for r in out.collect())
    # first 2, then ranks 12, 22 ((rn-2) % 10 == 0)
    assert got == [1, 2, 12, 22]


def test_stat_sample_deterministic(events):
    from otel_arrow_spark.operators.sampling import stat_sample

    a = stat_sample(events, 0.1, seed=7).count()
    b = stat_sample(events, 0.1, seed=7).count()
    assert a == b
    assert 0.03 < a / events.count() < 0.25


def test_marshal_shapes(spark, transcripts):
    from otel_arrow_spark.operators.marshal import marshal_detailed, marshal_normal
    from otel_arrow_spark.parse import parse_turns

    parsed = parse_turns(transcripts)
    n = marshal_normal(parsed)
    d = marshal_detailed(parsed)
    assert n.count() == d.count() == transcripts.count()
    row = d.filter(F.col("detail").contains("format=rfc5424")).first()
    assert "severity=" in row.detail and "host=" in row.detail


def test_salted_agg_equals_plain(transcripts):
    from otel_arrow_spark.ordering import salted_agg

    got = {
        r.conv_id: (r.n, r.mx)
        for r in salted_agg(
            transcripts, ["conv_id"], n=("count", "*"), mx=("max", "turn_idx")
        ).collect()
    }
    exp = {
        r.conv_id: (r.n, r.mx)
        for r in transcripts.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    assert got == exp


def test_salted_agg_bounds_reducer_keys(transcripts):
    """The partial stage must group by (key, salt): strictly more groups
    than conversations → no reducer sees a whole mega-conv."""
    from otel_arrow_spark.ordering import salted_agg

    n_convs = transcripts.select("conv_id").distinct().count()
    partial_plan = salted_agg(
        transcripts, ["conv_id"], n=("count", "*")
    )._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in partial_plan


def test_map_transforms(spark):
    from otel_arrow_spark.operators.attrs import (
        remove_map_keys, rename_map_keys,
    )

    df = spark.createDataFrame(
        [(1, {"a": "1", "b": "2", "c": "3"})], "id int, m map<string,string>"
    )
    out = df.select(
        rename_map_keys(F.col("m"), {"a": "x"}).alias("ren"),
        remove_map_keys(F.col("m"), ["b"]).alias("rem"),
        remove_map_keys(F.col("m"), ["b"], retain=True).alias("keep"),
    ).collect()[0]
    assert out.ren == {"x": "1", "b": "2", "c": "3"}
    assert out.rem == {"a": "1", "c": "3"}
    assert out.keep == {"b": "2"}


def test_field_writes(spark):
    from otel_arrow_spark.operators.attrs import move_field, remove_field, set_field

    df = spark.createDataFrame([(1, (10, "x"))], "id int, s struct<a:int,b:string>")
    out = set_field(df, "s.c", F.lit(5))
    assert out.select("s.c").collect()[0][0] == 5
    out2 = remove_field(out, "s.b")
    assert "b" not in out2.select("s.*").columns
    out3 = move_field(df, "s.a", "top_a")
    row = out3.collect()[0]
    assert row.top_a == 10 and "a" not in out3.select("s.*").columns


def test_discard_partitions_both_sets(events):
    from otel_arrow_spark.operators.kql import discard

    kept, dropped = discard(events, F.col("value") > 50)
    assert kept.count() + dropped.count() == events.count()
    assert dropped.filter(F.col("value") <= 50).count() == 0


def test_summarize_cardinality_cap(events):
    from otel_arrow_spark.operators.kql import summarize

    capped = summarize(
        events,
        by=[F.col("user_id")],
        cardinality_limit=5,
        n=F.count(F.lit(1)),
    )
    assert capped.count() == 5
    # deterministic: same 5 groups every run (hash-ranked)
    a = sorted(r.user_id for r in capped.collect())
    b = sorted(r.user_id for r in capped.collect())
    assert a == b


def test_aqe_skew_join_splits_hot_partition(spark):
    """The second skew lever (the brief names both): beyond the static
    salting in ordering.py, AQE re-plans a skewed sort-merge join at
    RUNTIME — the final adaptive plan marks the join skew=true and
    splits the hot partition. Thresholds are lowered to reproduce at
    test scale what the defaults do at 100 TB (256 MB partitions)."""
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "65536")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # 97% of rows share one key; the padding column gives the hot
        # partition enough bytes to cross the lowered threshold
        left = spark.range(200000).select(
            F.when(F.col("id") % 100 < 97, F.lit(0))
            .otherwise(F.col("id") % 1000).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d"))
        j = left.join(right, "k")
        rows = j.collect()
        assert len(rows) == 200000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:800]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
