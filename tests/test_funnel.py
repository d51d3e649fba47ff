

def test_funnel_step_ab_hand_computed(spark):
    """Arms: A (even users) reach [3,2,1,2], B (odd) reach [1,2,1,1]
    → view→click: 3/4 vs 1/4 (z = 0.5/√0.125 = √2 → 1_414_214 micro);
    click→purchase: 1/3 vs 0/1 (z = (1/3)/0.5 → 666_667 micro)."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.funnel import funnel_step_ab

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    eid = 0

    def add(uid, *types):
        nonlocal eid
        for i, et in enumerate(types):
            rows.append((eid, t0 + dt.timedelta(minutes=i), uid, et, 1.0, ""))
            eid += 1

    add(2, "view", "click", "purchase")
    add(4, "view", "click")
    add(6, "view")
    add(8, "view", "click")
    add(1, "view")
    add(3, "view", "click")
    add(5, "view")
    add(7, "view")
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r.step: r for r in funnel_step_ab(df).collect()}
    s1 = out["view->click"]
    assert (s1.n_a, s1.s_a, s1.n_b, s1.s_b) == (4, 3, 4, 1)
    assert s1.rate_diff_micro == 500_000
    assert s1.z_micro == 1_414_214
    s2 = out["click->purchase"]
    assert (s2.n_a, s2.s_a, s2.n_b, s2.s_b) == (3, 1, 1, 0)
    assert s2.rate_diff_micro == 333_333
    assert s2.z_micro == 666_667
