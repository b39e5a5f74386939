"""Event analytics: tumbling-window stats + sessionization, batch and
streaming, and the batch ≡ stream equivalence that makes the streaming
variants trustworthy."""

import tempfile

from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.operators.events import (
    sessionize,
    sessionize_native,
    windowed_event_stats,
)
from ai_bangladesh_address_parser_spark.streaming.stream_events import (
    EVENTS_SCHEMA,
    stream_event_stats,
    stream_sessions,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_windowed_stats_conservation(spark, sf_dir):
    ev = _events(spark, sf_dir)
    stats = windowed_event_stats(ev, window="1 hour")
    total = stats.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()
    bad = stats.filter(
        (F.col("n_users") > F.col("n_events")) | (F.col("n_events") <= 0)
    ).count()
    assert bad == 0
    # window_start is truncated-to-hour wall clock (epoch-aligned 1h
    # windows == date_trunc in a whole-hour-offset tz)
    off = stats.filter(~F.col("window_start").rlike(r":00:00$")).count()
    assert off == 0


def test_sessionize_invariants(spark, sf_dir):
    ev = _events(spark, sf_dir)
    sess = sessionize(ev, gap_minutes=30).cache()
    assert sess.agg(F.sum("n_events")).first()[0] == ev.count()
    # session_seq is dense 1..K per user (running sum of boundary flags)
    per_user = sess.groupBy("user_id").agg(
        F.min("session_seq").alias("lo"),
        F.max("session_seq").alias("hi"),
        F.count("*").alias("k"),
    )
    assert per_user.filter(
        (F.col("lo") != 1) | (F.col("hi") != F.col("k"))
    ).count() == 0
    # sessions of one user never overlap: start > previous end
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_seq")
    overl = (
        sess.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end").isNotNull()
                & (F.col("session_start") <= F.col("prev_end")))
        .count()
    )
    assert overl == 0
    sess.unpersist()


def test_sessionize_native_matches_lag_form(spark, sf_dir):
    """session_window and the lag/cumsum form agree everywhere except
    exact-gap ties (split by session_window, merged by the strict-``>``
    lag form); microsecond-grain synthetic data has no such ties, so
    the outputs must be identical."""
    ev = _events(spark, sf_dir)
    a = _rows(sessionize(ev, 30), ["user_id", "session_start", "n_events", "sum_value"])
    b = _rows(sessionize_native(ev, 30),
              ["user_id", "session_start", "n_events", "sum_value"])
    assert a == b


def _run_stream(spark, src_df, make_stream, name):
    tmp = tempfile.mkdtemp(prefix=f"abap_ev_{name}_")
    src_df.coalesce(2).write.mode("overwrite").parquet(f"{tmp}/in")
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{tmp}/in")
    q = (
        make_stream(s).writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp}/ck").start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    return spark.table(name)


def test_stream_event_stats_equals_batch(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = _run_stream(spark, ev, lambda s: stream_event_stats(s, "1 hour"),
                      "ev_stats_stream")
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(windowed_event_stats(ev, "1 hour"), cols)


def test_stream_sessions_equals_batch(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = _run_stream(spark, ev, lambda s: stream_sessions(s, 30),
                      "ev_sessions_stream")
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(sessionize_native(ev, 30), cols)


def test_stream_watermark_finalizes_and_drops_late(spark):
    """The claims that make the streaming stats runnable forever:
    append mode emits a window only once the watermark passes its end
    (bounded state), the watermark survives a checkpointed restart, and
    an event arriving behind the restored watermark is dropped rather
    than reopening finalized state.

    Run 1 sees hour-0 and hour-10 events: the watermark advances to
    08:0x, finalizing exactly the hour-0 window; hour-10 stays open.
    Run 2 (same checkpoint) sees only a straggler back in hour 0 —
    behind the restored watermark, so it must emit nothing."""
    import os

    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="abap_ev_wm_")

    def _write(rows):
        spark.createDataFrame(
            rows,
            "event_id bigint, ts_s string, user_id bigint, "
            "event_type string, value double, props string",
        ).select(
            "event_id",
            F.to_timestamp("ts_s").cast("timestamp_ntz").alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(f"{tmp}/in")

    def _run():
        # parquet sink, not memory: only a durable sink supports the
        # checkpointed RESTART this test is about
        s = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{tmp}/in")
        q = (
            stream_event_stats(s, "1 hour", watermark="2 hours")
            .writeStream.format("parquet").option("path", f"{tmp}/out")
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", f"{tmp}/ck").start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        return _rows(spark.read.parquet(f"{tmp}/out"),
                     ["window_start", "event_type", "n_events"])

    os.makedirs(f"{tmp}/in", exist_ok=True)
    _write([(i, f"2024-01-01 00:{i:02d}:00", i % 3, "click", 1.0, "{}")
            for i in range(10)])
    _write([(100 + i, f"2024-01-01 10:{i:02d}:00", i % 3, "view", 2.0, "{}")
            for i in range(10)])
    finalized = [("2024-01-01 00:00:00", "click", 10)]
    assert _run() == finalized

    _write([(200, "2024-01-01 00:30:00", 0, "click", 1.0, "{}")])  # straggler
    # restored watermark drops the straggler: the sink gains NO rows
    assert _run() == finalized


def test_quantiles_approx_error_vs_exact(spark, sf_dir):
    """percentile_approx is the constant-memory 100 TB path. Its
    guarantee is on RANK, not value (it returns an observed sample, no
    interpolation — in a sparse tail the nearest sample can sit far
    from the interpolated exact value). Pin that contract: each approx
    quantile must lie within the exact [p-0.02, p+0.02] value bracket
    of its own group."""
    from ai_bangladesh_address_parser_spark.operators.events import value_quantiles

    ev = _events(spark, sf_dir)
    approx = {r["event_type"]: r for r in value_quantiles(ev, approx=True).collect()}
    brackets = {
        r["event_type"]: r
        for r in ev.groupBy("event_type").agg(
            *[F.percentile("value", F.lit(q)).alias(f"q{i}")
              for i, q in enumerate(
                  [0.48, 0.52, 0.93, 0.97, 0.97, 1.0])]
        ).collect()
    }
    assert approx.keys() == brackets.keys()
    for et, a in approx.items():
        b = brackets[et]
        for p, (lo, hi) in {"p50": ("q0", "q1"), "p95": ("q2", "q3"),
                            "p99": ("q4", "q5")}.items():
            assert b[lo] <= a[p] <= b[hi], (
                f"{et}.{p}={a[p]} outside rank bracket [{b[lo]}, {b[hi]}]")


def test_top_users_deterministic_and_ordered(spark, sf_dir):
    from ai_bangladesh_address_parser_spark.operators.events import top_users

    ev = _events(spark, sf_dir)
    rows = top_users(ev, k=3).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        # non-increasing totals; ties broken by ascending user_id
        for a, b in zip(rs, rs[1:]):
            assert (a["total_value"], -a["user_id"]) >= (b["total_value"], -b["user_id"])
        # rank-1 really is the max over ALL users of this type
        top = (ev.filter(F.col("event_type") == et)
               .groupBy("user_id").agg(F.round(F.sum("value"), 6).alias("t"))
               .agg(F.max("t")).first()[0])
        assert rs[0]["total_value"] == top
    # two runs agree exactly (tie-break pins the row set)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, top_users(ev, 3).collect()))


def test_latest_per_key_matches_window_spelling(spark, sf_dir):
    """max_by(struct, struct) must pick exactly the row the window
    row_number spelling picks (deterministic (ts, event_id) order)."""
    from pyspark.sql import Window

    from ai_bangladesh_address_parser_spark.operators.events import latest_per_key

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    ref = (ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
           .select("user_id", F.col("event_id").alias("last_event_id"),
                   F.col("event_type").alias("last_event_type"),
                   F.col("value").alias("last_value")))
    cols = ["user_id", "last_event_id", "last_event_type", "last_value"]
    assert _rows(latest_per_key(ev), cols) == _rows(ref, cols)


def test_funnel_brute_force_and_invariants(spark, sf_dir):
    """Funnel counts vs an independent per-user Python brute force
    (strict event-time ordering), plus shape invariants."""
    from ai_bangladesh_address_parser_spark.operators.events import funnel

    ev = _events(spark, sf_dir)
    steps = ("view", "click", "purchase")
    rows = sorted(funnel(ev, steps).collect(), key=lambda r: r["step_idx"])
    assert [r["step"] for r in rows] == list(steps)
    assert rows[0]["pct_of_first"] == 1.0
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)  # monotone non-increasing

    # brute force
    import collections

    by_user = collections.defaultdict(list)
    for e in ev.select("user_id", "ts", "event_type").collect():
        by_user[e["user_id"]].append((e["ts"], e["event_type"]))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        for i, step in enumerate(steps):
            nxt = [t for t, et in evs
                   if et == step and (t_prev is None or t > t_prev)]
            if not nxt:
                break
            t_prev = min(nxt)
            counts[i] += 1
    assert ns == counts
