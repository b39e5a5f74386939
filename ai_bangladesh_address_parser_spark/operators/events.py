"""Event-stream analytics: tumbling-window stats and gap-based
sessionization over the ``events`` table
(``event_id, ts, user_id, event_type, value, props``).

The reference repo is batch address parsing and has no time-series
surface; at web scale the same engine also has to answer "what happened
per hour / per visit" questions over crawl/interaction logs, and the
batch operators here are the exact plans the Structured-Streaming
variants (:mod:`..streaming.stream_events`) reuse, so batch ≡ stream
equivalence is testable operator-for-operator.

Scale notes (the properties that must survive 100 TB):

* ``windowed_event_stats`` is one partial-aggregated shuffle on
  ``(window, event_type)`` — map-side combine collapses each input
  partition to (#windows × #types) rows before the exchange, so shuffle
  volume is bounded by key cardinality, not event count.
  ``countDistinct(user_id)`` expands that to one row per
  (window, type, user) pre-shuffle — still bounded by active users per
  window, the same state bound the streaming variant carries.
* ``sessionize`` is one shuffle on ``user_id`` (the window-function
  partition key); both passes (lag/cumsum, then session groupBy) reuse
  that single hash partitioning — Catalyst plans no second exchange
  because ``user_id`` is a prefix of the groupBy keys. Skewed users
  (bots) bound the per-partition sort; a per-user event cap upstream is
  the production guard, same pattern as blocking's ``max_block``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling-window per-event-type stats.

    Emits ``window_start`` as a formatted UTC string (stable across
    engines and hash comparators) plus count / sum / mean of ``value``
    and distinct active users. ``F.window`` (not ``date_trunc``) so the
    identical expression runs under ``readStream`` with a watermark.
    """
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "n_users",
        )
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes`` (strict ``>``, pinned to
    match the SQL oracle; ``session_window`` splits exact-gap ties that
    this form merges — tie-free microsecond data makes them identical,
    which tests/test_events.py asserts).

    Classic lag → boundary flag → running sum; both window passes and
    the final per-session groupBy share the ``user_id`` hash
    partitioning, so the whole operator is a single shuffle.
    Equal-timestamp ties are safe: a 0 gap is never a boundary and the
    running sum assigns tied rows the same session regardless of their
    sort order within the tie.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # timestamp_diff, not unix_micros: it accepts TIMESTAMP_NTZ (the
    # parquet-native type here) and stays exact at microsecond grain so
    # the strict ">" boundary matches the oracle's epoch_us arithmetic.
    boundary = F.when(
        prev.isNull()
        | (F.timestamp_diff("microsecond", prev, F.col(ts_col)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = events.select(
        "user_id",
        ts_col,
        "value",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "session_seq"
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min(ts_col), TS_FMT).alias("session_start"),
            F.date_format(F.max(ts_col), TS_FMT).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def value_quantiles(
    events: DataFrame, probs=(0.5, 0.95, 0.99), approx: bool = False
) -> DataFrame:
    """Per-event-type value quantiles (p50/p95/p99 by default).

    ``approx=False`` uses Spark's exact ``percentile`` (linear
    interpolation — same definition as ANSI ``quantile_cont``, verified
    value-identical against DuckDB); exact percentile holds all values
    per group, so it is the small-group / oracle-parity form.
    ``approx=True`` switches to ``percentile_approx`` (KLL-style
    mergeable sketch, constant memory per group) — the 100 TB path;
    tests/test_events.py measures its rank error against exact.
    """
    fn = (lambda c, p: F.percentile_approx(c, p)) if approx else (
        lambda c, p: F.percentile(c, p))
    # round, not int: int(0.29*100) == 28 under binary floats, which
    # would silently mislabel a caller-supplied quantile column
    aggs = [
        F.round(fn("value", F.lit(p)), 6).alias(f"p{round(p * 100)}") for p in probs
    ]
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"), *aggs
    )


def top_users(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` users per event type by total value, deterministic
    tie-break on user_id. Two-stage: the (type, user) groupBy collapses
    events map-side before its shuffle, then the rank window sees one
    row per (type, user) — so the expensive pass is bounded by user
    cardinality, not event count, and the window sort per type is over
    already-aggregated rows."""
    per_user = events.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    return (
        per_user.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def latest_per_key(
    events: DataFrame,
    key: str = "user_id",
    order_cols=("ts", "event_id"),
    payload=("event_id", "ts", "event_type", "value"),
) -> DataFrame:
    """Most-recent record per key — the crawl-snapshot primitive
    (latest fetch per canonical URL) expressed over events.

    ``max_by(struct(payload), struct(order_cols))`` plans as a
    partial-then-final SortAggregate around ONE exchange: each input
    partition sorts by the group key, collapses to one candidate per
    key, and only those survivors shuffle — O(keys) shuffle volume.
    The window-function spelling (``row_number() == 1``, the oracle)
    instead shuffles EVERY row and then sorts each key group, which is
    the shape that dies first on a 100 TB log. The struct order key
    makes ties deterministic (lexicographic on ``order_cols``)."""
    ordk = F.struct(*[F.col(c) for c in order_cols])
    row = F.max_by(F.struct(*[F.col(c) for c in payload]), ordk).alias("r")
    out = events.groupBy(key).agg(row).select(
        key, *[F.col(f"r.{c}").alias(f"last_{c}") for c in payload]
    )
    if "ts" in payload:  # engine-stable string form for comparisons
        out = out.withColumn("last_ts", F.date_format("last_ts", TS_FMT))
    return out


def funnel(events: DataFrame, steps=("view", "click", "purchase")) -> DataFrame:
    """Ordered-step funnel: how many users performed step 1, then step
    2 STRICTLY AFTER their first step 1, then step 3 strictly after
    that, by event time.

    Each stage is ``filter(type) → min(ts) per user`` joined to the
    previous stage's first-completion time — every join and groupBy
    keys on ``user_id``, so the whole chain reuses one hash
    partitioning and each stage's input shrinks to the survivors.
    Returns one row per step with the surviving user count and the
    conversion rate vs step 1."""
    prev = None  # DataFrame[user_id, t_k]: first completion of step k
    counts = []
    for i, step in enumerate(steps):
        cur = events.filter(F.col("event_type") == step)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("ts") > F.col("_t"))
        prev = cur.groupBy("user_id").agg(F.min("ts").alias("_t"))
        counts.append(
            prev.agg(F.count("*").alias("n_users"))
            .select(F.lit(i + 1).alias("step_idx"), F.lit(step).alias("step"),
                    "n_users")
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # conversion vs step 1 via a broadcast of the single step-1 row —
    # not a global window (which would warn about a single-partition
    # move even though the frame is one row per step by construction)
    first = F.broadcast(counts[0].select(F.col("n_users").alias("_first")))
    return out.crossJoin(first).select(
        "step_idx", "step", "n_users",
        F.round(F.col("n_users") / F.col("_first"), 6).alias("pct_of_first"),
    )


def sessionize_native(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """The same sessionization via Spark's built-in ``session_window``
    (the streaming-capable form; merge semantics differ from
    :func:`sessionize` only on exact-gap ties, where ``session_window``
    also splits — pinned by tests/test_events.py). Used by the
    streaming variant; batch callers get identical output on tie-free
    data, which the equivalence test verifies.
    """
    return (
        events.groupBy("user_id", F.session_window(ts_col, f"{gap_minutes} minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), TS_FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
