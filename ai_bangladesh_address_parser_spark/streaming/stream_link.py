"""Streaming end-to-end linkage: a pages stream drives the incremental
linker, so entity state advances as WARC partitions land.

This composes the two day-2 pieces: :mod:`stream_extract`'s file-source
stream (in production: the Iceberg streaming source on the pages table)
and :class:`plans.incremental.IncrementalLinker`'s persistent entity
state. ``foreachBatch`` is the bridge — the linker's plan mixes
broadcast joins, self-joins and iterative connected components, none of
which are expressible as a continuous streaming plan.

Exactly-once OUTPUT from an at-least-once trigger: foreachBatch can
replay a batch whose processing finished but whose streaming checkpoint
commit did not. The linker makes that replay invisible rather than
relying on the trigger:

  * a replayed page's ``norm_key`` already exists, so it fails the
    new-node anti-join — no nodes, no pairs, no edges, no relabeling;
  * the replay does rewrite the same mention rows under the next batch
    number, which ``entities()`` collapses by (url, mention_id);
  * a batch that crashed MID-commit left versioned dirs without
    _SUCCESS, which the retry sweeps (IncrementalLinker._clean_orphan).

The equivalence pin (tests/test_streaming.py): streaming a corpus as
file-batches produces the SAME per-mention entity ids as one
LinkagePlan.run over everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.incremental import IncrementalLinker
from .stream_extract import read_page_stream


def run_incremental_link(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files: int = 16,
    maintenance_every: int | None = None,
    vacuum_retain: int = 1,
    **linker_kwargs,
):
    """Start the linkage stream; returns the StreamingQuery. Read the
    resulting entity table with ``IncrementalLinker(spark, state_dir)
    .entities()`` after (or between) triggers.

    ``maintenance_every=N`` runs ``vacuum(vacuum_retain)`` + ``compact()``
    after every batch whose committed version is a multiple of N —
    the streaming twin of a scheduled Iceberg expire_snapshots/
    rewrite_data_files job. Keyed on the linker's version (not the
    stream's batch_id) so replays and empty batches don't skew the
    cadence, and safe under replay: maintenance never changes what
    reads resolve."""
    pages = read_page_stream(spark, input_dir, max_files=max_files)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # a fresh linker per batch re-discovers the committed version
        # from disk, so restarts and replays need no driver-side state
        linker = IncrementalLinker(
            batch_df.sparkSession, state_dir, **linker_kwargs)
        linker.link_batch(batch_df)
        if maintenance_every and linker.version % maintenance_every == 0:
            linker.vacuum(retain=vacuum_retain)
            linker.compact()

    writer = (
        pages.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
