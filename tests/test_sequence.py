"""Funnel / sessionization operators (`operators/sequence.py`)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.operators.sequence import (
    funnel_steps,
    funnel_oracle_sql,
    session_stats,
    sessionize,
)


def _ts(m, s=0):
    return dt.datetime(2026, 1, 1, 0, m, s)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1 completes click -> view -> buy
        (1, _ts(0), "click"), (1, _ts(1), "view"), (1, _ts(2), "buy"),
        # u2: view before click; click's view comes later, no buy
        (2, _ts(0), "view"), (2, _ts(1), "click"), (2, _ts(3), "view"),
        # u3: click only
        (3, _ts(0), "click"),
        # u4: same-ts click+view: tie cannot chain (strict >)
        (4, _ts(0), "click"), (4, _ts(0), "view"),
        # u5: nothing relevant
        (5, _ts(0), "other"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, et string")


def test_funnel_steps(ev):
    out = funnel_steps(
        ev, ["user_id"], "ts",
        [("click", F.col("et") == "click"),
         ("view", F.col("et") == "view"),
         ("buy", F.col("et") == "buy")],
    )
    got = {r.user_id: (r.t_click, r.t_view, r.t_buy, r.steps_completed)
           for r in out.collect()}
    assert got[1] == (_ts(0), _ts(1), _ts(2), 3)
    assert got[2] == (_ts(1), _ts(3), None, 2)
    assert got[3] == (_ts(0), None, None, 1)
    assert got[4] == (_ts(0), None, None, 1)  # tie does not chain
    assert got[5] == (None, None, None, 0)


def test_funnel_single_exchange_plan(ev):
    out = funnel_steps(
        ev, ["user_id"], "ts",
        [("click", F.col("et") == "click"),
         ("view", F.col("et") == "view")],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one Exchange for the window chain; the final aggregate reuses it
    assert plan.count("Exchange") == 1


def test_funnel_empty_steps(ev):
    with pytest.raises(ValueError):
        funnel_steps(ev, ["user_id"], "ts", [])


def test_sessionize_and_stats(spark):
    rows = [
        (1, _ts(0)), (1, _ts(0, 30)), (1, _ts(10)),  # gap>5min at idx 2
        (1, _ts(10, 40)),
        (2, _ts(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    s = sessionize(df, ["user_id"], "ts", gap_seconds=300.0)
    sids = {(r.user_id, r.ts): r.session_id for r in s.collect()}
    assert sids[(1, _ts(0))] == 0 and sids[(1, _ts(0, 30))] == 0
    assert sids[(1, _ts(10))] == 1 and sids[(1, _ts(10, 40))] == 1
    assert sids[(2, _ts(0))] == 0

    stats = session_stats(df, ["user_id"], "ts", 300.0)
    got = {r.user_id: (r.n_sessions, r.n_rows, r.max_span_s)
           for r in stats.collect()}
    assert got[1] == (2, 4, 40.0)
    assert got[2] == (1, 1, 0.0)


def test_sessionize_one_shuffle_one_sort(spark):
    df = spark.createDataFrame([(1, _ts(0))], "user_id long, ts timestamp")
    s = sessionize(df, ["user_id"], "ts", 300.0)
    plan = s._jdf.queryExecution().executedPlan().toString()
    # the running sum depends on the lag output, so Catalyst sequences
    # two Window ops — but they share ONE Exchange and ONE Sort (the
    # second window reuses the first's partitioning + order)
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") == 1


def test_funnel_oracle_matches_duckdb(ev):
    import duckdb

    pdf = ev.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    sql = funnel_oracle_sql(
        ["user_id"], "ts",
        [("click", "et = 'click'"), ("view", "et = 'view'"),
         ("buy", "et = 'buy'")],
    )
    exp = {
        r[0]: r[1:]
        for r in con.execute(
            sql.replace("SELECT user_id,",
                        "SELECT user_id,", 1)
        ).fetchall()
    }
    out = funnel_steps(
        ev, ["user_id"], "ts",
        [("click", F.col("et") == "click"),
         ("view", F.col("et") == "view"),
         ("buy", F.col("et") == "buy")],
    )
    got = {r.user_id: (r.t_click, r.t_view, r.t_buy, r.steps_completed)
           for r in out.collect()}
    assert got == exp


def test_top_hitters_stage(spark):
    from otel_arrow_spark.operators.kql_parser import kql

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0), ("c", 1.0), ("c", 1.0),
         ("c", 1.0)],
        "k string, v double",
    )
    out = kql(df, "T | top-hitters 2 of k")
    assert [(r.k, r.approximate_count_k) for r in out.collect()] == [
        ("c", 3), ("a", 2)]
    out2 = kql(df, "T | top-hitters 1 of k by v")
    assert [(r.k, r.approximate_sum_v) for r in out2.collect()] == [
        ("b", 10.0)]
    # plan: TakeOrderedAndProject, not a global sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_streaming_gap_sessions_equal_batch(spark, tmp_path):
    """Batch `sessionize` and streaming `session_window` gap sessions
    must agree on session count and per-session row counts — the
    batch/stream parity gate for the sessionization operator."""
    import datetime as dt

    from otel_arrow_spark.operators.sequence import sessionize
    from otel_arrow_spark.streaming.pipeline import streaming_gap_sessions

    rows = []
    base = dt.datetime(2026, 1, 1)
    # conv a: 3 bursts separated by >30s; conv b: one burst
    for i, off in enumerate([0, 5, 10, 60, 65, 200]):
        rows.append(("a", i, base + dt.timedelta(seconds=off)))
    for i, off in enumerate([0, 20, 29]):
        rows.append(("b", i, base + dt.timedelta(seconds=off)))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    in_dir = str(tmp_path / "in")
    df.coalesce(1).write.parquet(in_dir)

    stream = (
        spark.readStream.schema(df.schema).parquet(in_dir)
    )
    q = (
        streaming_gap_sessions(stream, gap="30 seconds")
        .writeStream.format("memory").queryName("gap_sessions")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.conv_id, r.session_start): r.n_rows
        for r in spark.sql("SELECT * FROM gap_sessions").collect()
    }

    batch = sessionize(
        spark.read.parquet(in_dir), ["conv_id"], "ts", 30.0,
        tiebreak=["turn_idx"],
    )
    b = (
        batch.groupBy("conv_id", "session_id")
        .agg({"ts": "min", "*": "count"})
        .withColumnRenamed("min(ts)", "session_start")
        .withColumnRenamed("count(1)", "n_rows")
    )
    batched = {
        (r.conv_id, r.session_start): r.n_rows for r in b.collect()
    }
    assert streamed == batched
    assert len(batched) == 4  # a: 3 sessions, b: 1
