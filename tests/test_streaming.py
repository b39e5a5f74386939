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
