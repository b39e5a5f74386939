"""Structured-Streaming incremental extraction tests."""

import os
import time

from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.sources.pages import synth_pages
from ai_bangladesh_address_parser_spark.streaming.stream_extract import (
    read_page_stream,
    run_incremental_extract,
    stream_mentions,
)


def _land_pages(spark, path, n=60):
    pages, _ = synth_pages(spark, n_pages=n, n_entities=20)
    pages.write.mode("overwrite").parquet(path)
    return pages


def test_stream_mentions_narrow(spark, tmp_path):
    src = str(tmp_path / "pages")
    _land_pages(spark, src)
    stream = stream_mentions(read_page_stream(spark, src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("mentions_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from mentions_stream")
    assert out.count() == 60
    row = out.filter(F.col("normalized").contains("Gulshan")).first()
    assert row is not None and row.primary_script in ("en", "bn", "mixed")


def test_incremental_extract_resume(spark, tmp_path):
    src = str(tmp_path / "pages_inc")
    out = str(tmp_path / "mentions_out")
    ckpt = str(tmp_path / "ckpt2")
    _land_pages(spark, src, n=40)

    q = run_incremental_extract(spark, src, out, ckpt)
    q.awaitTermination(240)
    first = spark.read.parquet(out)
    assert first.count() == 40
    assert "district" in first.columns and "normalized" in first.columns

    # land MORE pages; a restarted query processes only the new files
    more, _ = synth_pages(spark, n_pages=100, n_entities=20)
    more = more.filter(F.col("url").rlike("/page/[4-9][0-9]$"))  # pages 40..99
    more.write.mode("append").parquet(src)
    q2 = run_incremental_extract(spark, src, out, ckpt)
    q2.awaitTermination(240)
    back = spark.read.parquet(out)
    assert back.count() == 100
    # exactly-once per page across the restart
    assert back.select("mention_id").distinct().count() == 100


def test_stateful_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: a key first seen in
    batch 1 is NOT re-emitted when batch 2 repeats it; new keys in
    batch 2 are."""
    from ai_bangladesh_address_parser_spark.streaming.stateful_dedup import (
        stateful_first_seen,
    )

    src = str(tmp_path / "m")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [("k1", "house 5 dhaka"), ("k2", "road 3 gulshan"), ("k1", "house 5 dhaka")],
        "norm_key string, normalized string",
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    b2 = spark.createDataFrame(
        [("k1", "house 5 dhaka"), ("k3", "banani 1213")],
        "norm_key string, normalized string",
    )
    b2.coalesce(1).write.mode("overwrite").parquet(src + "/b2")

    stream = spark.readStream.schema("norm_key string, normalized string") \
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    out = stateful_first_seen(stream)
    q = (
        out.writeStream.format("memory").queryName("first_seen")
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    q.awaitTermination(180)
    rows = {r["norm_key"]: r for r in spark.sql("select * from first_seen").collect()}
    # k1 emitted exactly once (despite 3 occurrences across 2 batches),
    # k2 and k3 once each
    assert set(rows) == {"k1", "k2", "k3"}
    assert all(r["is_first"] for r in rows.values())
    n_k1 = spark.sql("select count(*) n from first_seen where norm_key='k1'").first()["n"]
    assert n_k1 == 1


def test_stream_link_equals_batch(spark, tmp_path):
    """Streaming a corpus as file-batches through run_incremental_link
    produces the SAME per-mention entity ids as one batch run."""
    from ai_bangladesh_address_parser_spark.plans.incremental import (
        IncrementalLinker,
    )
    from ai_bangladesh_address_parser_spark.plans.pipeline import LinkagePlan
    from ai_bangladesh_address_parser_spark.streaming.stream_link import (
        run_incremental_link,
    )

    pages, _ = synth_pages(spark, n_pages=240, n_entities=30)
    pages = pages.localCheckpoint(eager=True)
    src = str(tmp_path / "pages")
    for i in range(3):  # three part files → three micro-batches
        (pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i)
              .coalesce(1).write.mode("append").parquet(src))

    state = str(tmp_path / "state")
    q = run_incremental_link(
        spark, src, state, str(tmp_path / "ck"), max_files=1)
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    linker = IncrementalLinker(spark, state)
    assert linker.version == 3  # one committed version per micro-batch
    got = {
        (r["url"], r["mention_id"]): r["entity_id"]
        for r in linker.entities().select("url", "mention_id", "entity_id").collect()
    }
    want = {
        (r["url"], r["mention_id"]): r["entity_id"]
        for r in LinkagePlan(spark).run(pages)
        .select("url", "mention_id", "entity_id").collect()
    }
    assert got == want


def test_stream_link_maintenance_cadence(spark, tmp_path):
    """maintenance_every=2 vacuums/compacts after versions 2 (and any
    later multiple); state stays correct and the stream's output equals
    the batch run."""
    import os

    from ai_bangladesh_address_parser_spark.plans.incremental import (
        IncrementalLinker,
    )
    from ai_bangladesh_address_parser_spark.plans.pipeline import LinkagePlan
    from ai_bangladesh_address_parser_spark.streaming.stream_link import (
        run_incremental_link,
    )

    pages, _ = synth_pages(spark, n_pages=240, n_entities=30)
    pages = pages.localCheckpoint(eager=True)
    src = str(tmp_path / "pages")
    for i in range(3):
        (pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i)
              .coalesce(1).write.mode("append").parquet(src))

    state = str(tmp_path / "state")
    q = run_incremental_link(
        spark, src, state, str(tmp_path / "ck"), max_files=1,
        maintenance_every=2)
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    linker = IncrementalLinker(spark, state)
    assert linker.version == 3
    # maintenance fired at version 2: node deltas and key batches ≤2
    # compacted, superseded edges snapshot vacuumed
    assert sorted(os.listdir(os.path.join(state, "nodes"))) == ["c2", "d3"]
    assert sorted(os.listdir(os.path.join(state, "keys"))) == ["b3", "c2"]
    assert "v1" not in os.listdir(os.path.join(state, "edges"))

    got = {
        (r["url"], r["mention_id"]): r["entity_id"]
        for r in linker.entities().select("url", "mention_id", "entity_id").collect()
    }
    want = {
        (r["url"], r["mention_id"]): r["entity_id"]
        for r in LinkagePlan(spark).run(pages)
        .select("url", "mention_id", "entity_id").collect()
    }
    assert got == want
