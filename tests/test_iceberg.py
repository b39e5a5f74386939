"""Iceberg-backed StageStore smoke — runs iff an Iceberg Spark runtime
is on the classpath (``iceberg_available``), skips cleanly otherwise.

Covers: writeTo/createOrReplace per stage, snapshot-id checkpoint
tokens, resume-from-table, and lineage-column hygiene — the cluster
deployment path documented on :class:`StageStore`.
"""

import pytest
from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.plans.pipeline import (
    LinkagePlan,
    StageStore,
    iceberg_available,
)
from ai_bangladesh_address_parser_spark.sources.pages import synth_pages

CATALOG = "abap_it"


@pytest.fixture()
def iceberg_spark(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime on the JVM classpath")
    # catalog plugins resolve lazily from conf at first reference, so a
    # running session can register one (the jar itself must already be
    # on the classpath — hence the skip above)
    spark.conf.set(f"spark.sql.catalog.{CATALOG}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.warehouse", str(tmp_path))
    return spark


def test_iceberg_stage_store_roundtrip_and_resume(iceberg_spark):
    spark = iceberg_spark
    pages, _ = synth_pages(spark, n_pages=80, n_entities=10)

    store = StageStore(catalog=CATALOG, job_id="smoke1")
    ents = LinkagePlan(spark, store=store).run(pages)
    first = {(r["mention_id"], r["entity_id"]) for r in
             ents.select("mention_id", "entity_id").collect()}
    assert len(first) == 80
    # every stage committed a snapshot token
    assert set(store.saved) >= {"s1_mentions", "s3_match_edges", "s4_entities"}
    assert all(stage in store.snapshots for stage in store.saved)
    # lineage columns persisted in the table, dropped from the API
    tbl = spark.table(f"{CATALOG}.smoke1.s1_mentions")
    assert {"_job_id", "_stage", "_partition_id"} <= set(tbl.columns)
    assert "_job_id" not in ents.columns
    assert tbl.filter(F.col("_job_id") != "smoke1").count() == 0

    # resume: a fresh run against the same catalog/job reuses the
    # committed tables — no new snapshots, identical output
    store2 = StageStore(catalog=CATALOG, job_id="smoke1", resume=True)
    ents2 = LinkagePlan(spark, store=store2).run(pages)
    second = {(r["mention_id"], r["entity_id"]) for r in
              ents2.select("mention_id", "entity_id").collect()}
    assert second == first
    assert store2.saved == []
