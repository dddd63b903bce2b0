"""Recrawl scheduler: hand-computed change rates, single-observation
pages, tie ordering, and the one-exchange plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from supacrawler_spark.scrapeops import RATE_SCALE, US_PER_DAY, recrawl_schedule

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), p, st, 0.0, "{}")
         for i, (p, s, st) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")


def test_hand_computed_rates(spark):
    rows = [
        # page 1: 3 obs over 2 days, states a->b->b = 1 change
        (1, 0, "a"), (1, 86400, "b"), (1, 172800, "b"),
        # page 2: 2 obs over 1 day, a->b = 1 change (hotter than p1)
        (2, 0, "a"), (2, 86400, "b"),
        # page 3: single observation -> null rate
        (3, 50, "a"),
        # page 4: 2 obs, no change
        (4, 0, "a"), (4, 86400, "a"),
    ]
    out = {r.page_id: r for r in
           recrawl_schedule(_ev(spark, rows)).collect()}
    assert out[1].n_changes == 1 and out[1].span_us == 2 * US_PER_DAY
    assert out[1].changes_per_day_e3 == RATE_SCALE // 2
    assert out[2].changes_per_day_e3 == RATE_SCALE
    assert out[3].changes_per_day_e3 is None and out[3].n_obs == 1
    assert out[4].changes_per_day_e3 == 0
    # schedule: hottest first; nulls last
    order = [out[p].fetch_order for p in (2, 1, 4, 3)]
    assert order == [1, 2, 3, 4]


def test_equal_ts_tiebreak_by_event_id(spark):
    # two observations at the SAME timestamp: event_id order decides
    # the transition count deterministically (a->b = 1 change, and it
    # cannot flip to b->a between engines/runs)
    rows = [(7, 0, "a"), (7, 0, "b")]
    out = recrawl_schedule(_ev(spark, rows)).collect()[0]
    assert out.n_changes == 1 and out.span_us == 0
    assert out.changes_per_day_e3 is None  # zero span -> no rate


def test_single_exchange_before_rank(spark):
    ev = _ev(spark, [(1, 0, "a"), (1, 60, "b"), (2, 0, "a")])
    # the lag window and the per-page rollup share one hash exchange
    # on the page key; only the final bounded rank adds a singleton
    plan = recrawl_schedule(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
