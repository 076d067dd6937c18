"""As-of join vs a scalar reference implementation."""

import pyspark.sql.functions as F

from geotrellis_server_spark.operators.asof import as_of_join


def test_as_of_join_basic(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 4, 99.0)],
        "sym STRING, t INT, px DOUBLE",
    )
    trades = spark.createDataFrame(
        [("A", 0, 1), ("A", 5, 2), ("A", 7, 3), ("A", 100, 4), ("B", 3, 5), ("B", 4, 6)],
        "sym STRING, t INT, trade_id INT",
    )
    got = {r.trade_id: (r.px, r.matched_time)
           for r in as_of_join(trades, quotes, ["sym"], "t", ["px"]).collect()}
    assert got[1] == (None, None)        # before any quote
    assert got[2] == (11.0, 5)           # inclusive tie at t=5
    assert got[3] == (11.0, 5)
    assert got[4] == (12.0, 9)           # latest
    assert got[5] == (None, None)        # B before its quote
    assert got[6] == (99.0, 4)           # B inclusive


def test_as_of_join_matches_brute_force_random(spark):
    import random

    rng = random.Random(23)
    quotes = [(f"k{rng.randint(0, 4)}", rng.randint(0, 100), float(i))
              for i in range(200)]
    trades = [(f"k{rng.randint(0, 4)}", rng.randint(0, 100), i)
              for i in range(300)]
    qdf = spark.createDataFrame(quotes, "k STRING, t INT, v DOUBLE")
    tdf = spark.createDataFrame(trades, "k STRING, t INT, tid INT")
    got = {r.tid: r.v for r in as_of_join(tdf, qdf, ["k"], "t", ["v"]).collect()}
    for k, t, tid in trades:
        elig = [(qt, v) for (qk, qt, v) in quotes if qk == k and qt <= t]
        want = max(elig, key=lambda e: (e[0], e[1]))[1] if elig else None
        assert got[tid] == want, (tid, k, t, got[tid], want)


def test_as_of_join_plan_single_exchange(spark):
    quotes = spark.createDataFrame([("A", 1, 1.0)], "k STRING, t INT, v DOUBLE")
    trades = spark.createDataFrame([("A", 2, 1)], "k STRING, t INT, tid INT")
    plan = as_of_join(trades, quotes, ["k"], "t", ["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # no join operator at all — union + one keyed window
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_sessionize_gap_boundaries(spark):
    from geotrellis_server_spark.operators.asof import session_stats, sessionize

    rows = [("u", t) for t in (0, 10, 25, 100, 105, 300)]
    df = spark.createDataFrame(rows, "u STRING, t INT")
    got = {r.t: r.session_id for r in sessionize(df, ["u"], "t", 30).collect()}
    assert got == {0: 0, 10: 0, 25: 0, 100: 1, 105: 1, 300: 2}
    stats = {r.session_id: (r.n_events, r.duration_s)
             for r in session_stats(df, ["u"], "t", 30).collect()}
    assert stats == {0: (3, 25.0), 1: (2, 5.0), 2: (1, 0.0)}


def test_sessionize_per_key_independent(spark):
    from geotrellis_server_spark.operators.asof import sessionize

    df = spark.createDataFrame(
        [("a", 0), ("a", 1000), ("b", 0), ("b", 10)], "u STRING, t INT"
    )
    got = {(r.u, r.t): r.session_id for r in sessionize(df, ["u"], "t", 30).collect()}
    assert got == {("a", 0): 0, ("a", 1000): 1, ("b", 0): 0, ("b", 10): 0}


def test_as_of_join_null_right_value_not_chimera(spark):
    # a NULL right VALUE must be carried as NULL with its own time —
    # never mixed with an older row's value (the struct-carry guarantee)
    quotes = spark.createDataFrame(
        [("u", 0, 5.0), ("u", 10, None)], "k STRING, t INT, v DOUBLE"
    )
    trades = spark.createDataFrame([("u", 20, 1)], "k STRING, t INT, tid INT")
    r = as_of_join(trades, quotes, ["k"], "t", ["v"]).collect()[0]
    assert r.v is None and r.matched_time == 10


def test_range_join_bands(spark):
    from geotrellis_server_spark.operators.asof import range_join

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 99.9), (4, 100.0), (5, -1.0)],
        "id BIGINT, v DOUBLE",
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1000.0)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    got = {r.id: r.band for r in range_join(facts, bands, "v").collect()}
    assert got == {1: "low", 2: "mid", 3: "mid", 4: "high"}  # 5 unmatched
    left = {r.id: r.band for r in range_join(facts, bands, "v", how="left").collect()}
    assert left[5] is None
    # broadcast plan: fact side must not shuffle
    plan = range_join(facts, bands, "v")._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan and "SortMergeJoin" not in plan


def test_interval_overlap_join_exactly_once(spark):
    from geotrellis_server_spark.operators.asof import interval_overlap_join

    # pairs engineered to span chunk boundaries (chunk = 10):
    # a1 [5, 25] overlaps b1 [8, 12] and b2 [24, 40] (b2 across 3 chunks)
    # a2 [100, 101] overlaps nothing
    a = spark.createDataFrame([(1, 5, 25), (2, 100, 101)],
                              "id long, start_s long, end_s long")
    b = spark.createDataFrame([(1, 8, 12), (2, 24, 40), (3, 50, 60)],
                              "id long, start_s long, end_s long")
    rows = interval_overlap_join(a, b, chunk_s=10).collect()
    pairs = sorted((r.id_a, r.id_b) for r in rows)
    assert pairs == [(1, 1), (1, 2)]          # each exactly ONCE
    assert len(rows) == len(pairs)            # report-once, no dups
    # touching endpoints count as overlap (inclusive semantics)
    t = interval_overlap_join(
        spark.createDataFrame([(1, 0, 10)], "id long, start_s long, end_s long"),
        spark.createDataFrame([(9, 10, 20)], "id long, start_s long, end_s long"),
        chunk_s=7).collect()
    assert [(r.id_a, r.id_b) for r in t] == [(1, 9)]
    import pytest

    with pytest.raises(ValueError):
        interval_overlap_join(a, b, chunk_s=0)


def test_resample_ffill_semantics(spark):
    from geotrellis_server_spark.operators.asof import resample_ffill

    # user 1: events at t=95, 205, 210 (tie at slot resolution is
    # pre-collapsed to max), user 2: span inside one step -> one slot
    ev = spark.createDataFrame(
        [(1, 95, 5.0), (1, 205, 7.0), (1, 210, 9.0), (1, 350, 1.0),
         (2, 100, 2.0), (2, 150, 3.0)],
        "user_id long, s long, value double")
    got = {(r.user_id, r.t): r.value
           for r in resample_ffill(ev, ["user_id"], "s", "value",
                                   step_s=100).collect()}
    assert got[(1, 100)] == 5.0      # ffill from t=95
    assert got[(1, 200)] == 5.0      # before the 205 event
    assert got[(1, 300)] == 9.0      # latest of 205/210
    assert got[(2, 100)] == 2.0      # slot exactly at first event
    assert (2, 200) not in got       # span ends at 150
    assert len(got) == 4


def test_funnel_ordering_and_monotonicity(spark):
    from geotrellis_server_spark.operators.behavior import funnel

    # user 1 converts in order; user 2 clicked BEFORE viewing (click
    # must not count); user 3 views only
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "click", 5), (2, "view", 10), (2, "purchase", 50),
        (3, "view", 7),
    ]
    import datetime as dt

    ev = spark.createDataFrame(
        [(u, e, dt.datetime(2024, 1, 1, 0, 0, t)) for u, e, t in rows],
        "user_id long, event_type string, ts timestamp")
    got = {r.stage: r.n_users
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}
    import pytest

    with pytest.raises(ValueError):
        funnel(ev, [])


def test_retention_cohorts_offsets(spark):
    from geotrellis_server_spark.operators.behavior import (
        retention_cohorts)

    # periods of 10s: user 1 active periods 0,1,3; user 2 first at 1,
    # active 1 and 2
    ev = spark.createDataFrame(
        [(1, 5), (1, 12), (1, 18), (1, 35), (2, 11), (2, 25)],
        "user_id long, s long")
    got = {(r.cohort, r.period_offset): r.n_users
           for r in retention_cohorts(ev, period_s=10).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1}


def test_time_weighted_avg_locf(spark):
    from geotrellis_server_spark.operators.asof import time_weighted_avg

    rows = [
        # key 1: v=2.0 for 10s, v=4.0 for 30s, last obs closes the span
        (1, 100, 2.0), (1, 110, 4.0), (1, 140, 9.0),
        # key 2: single observation → zero span
        (2, 50, 7.0),
        # key 3: simultaneous obs collapse to max first
        (3, 10, 1.0), (3, 10, 3.0), (3, 20, 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {r.k: r for r in
           time_weighted_avg(df, ["k"], "t", "v").collect()}
    assert out[1].twa_num == 200 * 10 + 400 * 30
    assert out[1].twa_den == 40 and out[1].n_obs == 3
    assert out[2].twa_den == 0 and out[2].twa_num == 0
    assert out[3].twa_num == 300 * 10 and out[3].twa_den == 10
    assert out[3].n_obs == 2  # tie collapsed


def test_time_weighted_avg_partition_invariance(spark):
    from geotrellis_server_spark.operators.asof import time_weighted_avg

    rows = [(i % 5, 100 + i * 7, (i * 13 % 29) / 4.0) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    a = sorted(map(tuple, time_weighted_avg(df, ["k"], "t", "v").collect()))
    b = sorted(map(tuple, time_weighted_avg(
        df.repartition(7), ["k"], "t", "v").collect()))
    assert a == b
