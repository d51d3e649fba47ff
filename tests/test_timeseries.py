

def test_mase_hand_computed(spark):
    """Hourly cents [10,20,30,40], season=2: one-step SAE = 30 over 3
    terms; seasonal SAE = |30−10|+|40−20| = 40 over 2 terms →
    MASE = (40·3)/(30·2) = 2.0 → 2_000_000 ppm."""
    import datetime as dt

    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.timeseries import mase_hourly

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "view", v, "")
        for i, v in enumerate([0.10, 0.20, 0.30, 0.40])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    r = mase_hourly(df, season=2).collect()[0]
    assert (r.n_hours, r.n_seasonal, r.n_naive) == (4, 2, 3)
    assert (r.sae_seasonal_cents, r.sae_naive_cents) == (40, 30)
    assert r.mase_ppm == 2_000_000


def test_mase_perfect_seasonality_is_zero(spark):
    """A pure period-2 cycle: the seasonal naive is exact → MASE 0,
    while the one-step naive errs every hour."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import mase_hourly

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "view", v, "")
        for i, v in enumerate([0.10, 0.20, 0.10, 0.20, 0.10, 0.20])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    r = mase_hourly(df, season=2).collect()[0]
    assert r.sae_seasonal_cents == 0 and r.mase_ppm == 0


def test_mase_gap_hours_are_zeros(spark):
    """A missing hour is a true zero, not a skipped row: hours
    {0: 10, 2: 10} → dense [10, 0, 10]; one-step SAE = 20, seasonal
    (s=2) SAE = 0 → MASE 0."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import mase_hourly

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 1, "view", 0.10, ""),
        (2, t0 + dt.timedelta(hours=2), 1, "view", 0.10, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    r = mase_hourly(df, season=2).collect()[0]
    assert r.n_hours == 3
    assert r.sae_naive_cents == 20
    assert r.sae_seasonal_cents == 0 and r.mase_ppm == 0


def test_dwell_transitions_hand_computed(spark):
    """view→click 10s, click→purchase 15s (user 1); view→view 5s
    (user 2); single-gap medians are 2·gap on the doubled grid."""
    import datetime as dt

    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.timeseries import dwell_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "view", t0),
        (2, 1, "click", t0 + dt.timedelta(seconds=10)),
        (3, 1, "purchase", t0 + dt.timedelta(seconds=25)),
        (4, 2, "view", t0),
        (5, 2, "view", t0 + dt.timedelta(seconds=5)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = [(r.from_type, r.to_type, r.n, r.min_us, r.max_us, r.median2_us)
           for r in dwell_transitions(df).collect()]
    s = 1_000_000
    assert got == [
        ("click", "purchase", 1, 15 * s, 15 * s, 30 * s),
        ("view", "click", 1, 10 * s, 10 * s, 20 * s),
        ("view", "view", 1, 5 * s, 5 * s, 10 * s),
    ]


def test_dwell_transitions_tied_ts_uses_event_id_order(spark):
    """Two events share a timestamp: the (ts, event_id) total order
    fixes the transition direction (a→b, never b→a), and the even
    count exercises the doubled-median midpoint (gaps 0s and 4s →
    median2 = 4s)."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import dwell_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (10, 1, "a", t0),
        (11, 1, "b", t0),  # tied ts: comes AFTER event 10 by id
        (20, 2, "a", t0),
        (21, 2, "b", t0 + dt.timedelta(seconds=4)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = [(r.from_type, r.to_type, r.n, r.min_us, r.max_us, r.median2_us)
           for r in dwell_transitions(df).collect()]
    assert got == [("a", "b", 2, 0, 4_000_000, 4_000_000)]


def test_seasonal_strength_pure_period_is_one(spark):
    """A purely 24-periodic series (value 1.0 at hour 9, nothing
    else): the detrended series is constant per hour-of-day, so the
    remainder is exactly zero → strength = 10⁶, peak_hour = 9."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import seasonal_strength_hourly

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [(i, 1, "view", t0 + dt.timedelta(days=d), 1.0) for d, i in zip(range(5), range(5))]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    r = seasonal_strength_hourly(df).collect()[0]
    # spine: day0 09:00 .. day4 09:00 = 97 hours; 24 edge hours lack a
    # full 25-hour window.
    assert (r.n_hours, r.n_core) == (97, 73)
    assert r.seasonal_strength_ppm == 1_000_000
    assert r.peak_hour == 9


def test_seasonal_strength_constant_series_null(spark):
    """A constant series detrends to all-zero: Var(detrended) = 0 →
    strength NULL (undefined, nothing to explain)."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import seasonal_strength_hourly

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 1, "view", t0 + dt.timedelta(hours=i), 2.0) for i in range(72)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    r = seasonal_strength_hourly(df).collect()[0]
    assert (r.n_hours, r.n_core) == (72, 48)
    assert r.seasonal_strength_ppm is None
    assert r.peak_hour == 0
