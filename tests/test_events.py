import datetime as dt

from local_vectordb_spark.operators import events as ev


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def test_tumbling_counts(spark):
    rows = [
        (1, T0, 1, "click", 1.0),
        (2, T0 + dt.timedelta(minutes=59), 1, "click", 2.0),
        (3, T0 + dt.timedelta(hours=1), 1, "click", 4.0),
    ]
    out = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in ev.tumbling(_events(spark, rows)).collect()
    }
    assert out[T0] == (2, 3.0)
    assert out[T0 + dt.timedelta(hours=1)] == (1, 4.0)


def test_sliding_event_in_two_windows(spark):
    rows = [(1, T0 + dt.timedelta(minutes=45), 1, "click", 1.0)]
    out = ev.sliding(_events(spark, rows)).collect()
    starts = sorted(r["window_start"] for r in out)
    assert starts == [T0, T0 + dt.timedelta(minutes=30)]


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, T0, 1, "a", 1.0),
        (2, T0 + dt.timedelta(minutes=29), 1, "a", 1.0),   # same session
        (3, T0 + dt.timedelta(minutes=59), 1, "a", 1.0),   # exact-gap boundary merges
        (4, T0 + dt.timedelta(minutes=90), 1, "a", 2.0),   # 31min gap → new session
        (5, T0, 2, "a", 5.0),                              # other user
    ]
    out = ev.sessionize(_events(spark, rows), gap="30 minutes").collect()
    u1 = sorted(
        [(r["session_start"], r["n_events"]) for r in out if r["user_id"] == 1]
    )
    assert u1 == [(T0, 3), (T0 + dt.timedelta(minutes=90), 1)]
    assert [(r["n_events"], r["sum_value"]) for r in out if r["user_id"] == 2] == [(1, 5.0)]
