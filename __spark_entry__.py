"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full record-linkage pipeline (extract → block → score →
    cluster) over a Common-Crawl-style pages table — deterministic
    synthetic address pages (BASELINE.json input_hint shape) unioned
    with the sf0.001 ``documents`` corpus as address-free negatives.

    Returns the entities table: one row per page with resolved address
    components and a transitive ``entity_id``.
    """
    from pyspark.sql import functions as F

    from ai_bangladesh_address_parser_spark.plans.pipeline import link_pages
    from ai_bangladesh_address_parser_spark.sources.pages import synth_pages

    # The smoke corpus is tiny; cap task concurrency so the job also
    # fits a default-heap (1g) driver JVM even under local[32] — 32
    # concurrent tasks' execution/codegen overhead alone can exhaust a
    # small heap. Runtime-settable conf + explicit input partitioning.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    pages, _truth = synth_pages(spark, n_pages=400, n_entities=100, n_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    neg = docs.repartition(8).select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text").alias("text"),
        F.col("lang").alias("lang"),
    )
    # use_minhash=False: the smoke corpus always yields a postal or
    # district key, and skipping the minhash bands keeps the candidate
    # volume + stage count small enough for a default-heap driver JVM.
    # (Full three-key blocking incl. minhash runs in bench.py + tests.)
    return link_pages(spark, pages.unionByName(neg), use_minhash=False)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    return {}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    return {}
