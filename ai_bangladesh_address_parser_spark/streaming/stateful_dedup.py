"""Custom stateful streaming operator: cross-micro-batch first-seen
dedup of normalized mentions (``applyInPandasWithState``).

The batch pipeline collapses exact-duplicate mentions with
``dropDuplicates(norm_key)`` (the distributed form of the reference's
LRU result cache, extractor.py:85-89). In a stream that dedup must
survive ACROSS micro-batches: a mention first seen in batch 1 must not
be re-emitted (nor re-extracted) when batch 7 carries the same bytes.
Spark's ``dropDuplicates`` on a stream keeps unbounded implicit state;
this operator makes the state explicit and bounded:

  * keyed by ``norm_key`` (md5 of the normalized mention text) — the
    same key the batch pipeline shuffles on;
  * state per key: occurrence count (8 bytes + key), stored in the
    streaming state store — RocksDB-backed on a real cluster
    (``spark.sql.streaming.stateStore.providerClass``), so state size
    is bounded by disk, not executor heap;
  * optional processing-time timeout evicts keys idle for ``ttl``
    — at web scale the first-seen set is effectively a sliding window,
    matching the reference cache's FIFO eviction semantics;
  * output: one row per key at FIRST sight only (update mode) — the
    downstream incremental extractor therefore processes each distinct
    mention exactly once per ttl window.

Scale notes: one shuffle on norm_key per micro-batch (same as any
grouped stateful op); the pandas function touches only the grouped
batch plus one state row — no state scans. At 10^12 pages the key
space is bounded by DISTINCT mentions (≪ pages) and the ttl caps it
further.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType([StructField("n_seen", LongType())])
OUTPUT_SCHEMA = (
    "norm_key string, normalized string, n_in_batch bigint, is_first boolean"
)


def _first_seen_fn(ttl_ms: int | None):
    def fn(key, pdfs, state: GroupState):
        n_new = 0
        first_norm = None
        for pdf in pdfs:
            n_new += len(pdf)
            if first_norm is None and len(pdf):
                first_norm = pdf["normalized"].iloc[0]
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        state.update((seen + n_new,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if seen == 0 and n_new:
            yield pd.DataFrame(
                [{
                    "norm_key": key[0],
                    "normalized": first_norm,
                    "n_in_batch": n_new,
                    "is_first": True,
                }]
            )

    return fn


def stateful_first_seen(
    mentions: DataFrame,
    key_col: str = "norm_key",
    text_col: str = "normalized",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of ``(key, text)`` → one output row per key
    at its first occurrence across all micro-batches (update mode).

    ``ttl_ms`` evicts idle keys after that many processing-time
    milliseconds (None = keep forever, exact first-seen semantics)."""
    from pyspark.sql import functions as F

    src = mentions.select(
        F.col(key_col).alias("norm_key"), F.col(text_col).alias("normalized")
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("norm_key").applyInPandasWithState(
        _first_seen_fn(ttl_ms), OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
