"""spark-submit entry point for the linkage engine.

The reference exposes a stdin/argv CLI protocol (S7,
``api/python/extract.py:96-244``); the Spark-native replacement is a
job CLI submitted to a cluster:

    # package the library once
    (cd <repo> && zip -qr /tmp/abap.zip ai_bangladesh_address_parser_spark)

    spark-submit --py-files /tmp/abap.zip \
        ai_bangladesh_address_parser_spark/__main__.py \
        link --input s3://bucket/pages --output s3://bucket/entities \
        --checkpoint s3://bucket/ckpt --scorer levenshtein --threshold 0.85

    # or locally, identical semantics:
    python -m ai_bangladesh_address_parser_spark link --input ... --output ...

Verbs:
  link             full extract -> block -> score -> cluster; writes entities
  extract          stage 1 only; writes the wide mention table
  split            extract + write partitioned by confidence band (D2)
  gazetteer-build  labeled records -> gazetteer dim with postal dominance (S2/A5)

No master/parallelism flags here: spark-submit (or the surrounding
session) owns cluster sizing, so the same job runs unchanged at N and
4N executors.
"""

from __future__ import annotations

import argparse
import sys


def _session(app: str):
    # Under spark-submit the submitted --master/--conf must win
    # wholesale; a bare `python -m` run gets session.get_spark's tuned
    # defaults (UTC session timezone, ansi off for oracle-deterministic
    # math, Arrow on) instead of Spark's bare defaults. Detection note:
    # `SparkConf().contains("spark.master")` does NOT work in PySpark
    # 4.x (a pre-context SparkConf has _jvm=None and an empty local
    # dict), so probe the launcher's environment instead —
    # PYSPARK_GATEWAY_PORT/SECRET are set only when the JVM launched
    # this Python driver (spark-submit of a .py), and SPARK_CONF_DIR /
    # spark.master in PYSPARK_SUBMIT_ARGS cover client-mode shells.
    import os

    submitted = (
        "PYSPARK_GATEWAY_PORT" in os.environ
        or "PYSPARK_GATEWAY_SECRET" in os.environ
        or "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    )
    if submitted:
        from pyspark.sql import SparkSession

        return SparkSession.builder.appName(app).getOrCreate()
    from .session import get_spark

    return get_spark(app)


def _read(spark, path: str, fmt: str):
    return spark.read.format(fmt).load(path)


def _write(df, path: str, fmt: str, partition_by: list[str] | None = None):
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def cmd_link(args) -> int:
    from ai_bangladesh_address_parser_spark.plans.pipeline import LinkagePlan, StageStore

    spark = _session("abap-link")
    pages = _read(spark, args.input, args.format)
    plan = LinkagePlan(
        spark,
        scorer=args.scorer,
        threshold=args.threshold,
        store=StageStore(base=args.checkpoint, resume=not args.no_resume),
        profile=args.profile,
    )
    ents = plan.run(pages)
    _write(ents, args.output, args.format)
    for stage, m in plan.metrics().items():
        print(f"metric {stage}: {m}", file=sys.stderr)
    return 0


def cmd_extract(args) -> int:
    from ai_bangladesh_address_parser_spark.plans.pipeline import LinkagePlan, StageStore

    spark = _session("abap-extract")
    pages = _read(spark, args.input, args.format)
    plan = LinkagePlan(
        spark,
        store=StageStore(base=args.checkpoint, resume=not args.no_resume),
        profile=args.profile,
    )
    _write(plan.extract(pages), args.output, args.format)
    return 0


def cmd_split(args) -> int:
    from ai_bangladesh_address_parser_spark.functions.format import confidence_band_expr
    from ai_bangladesh_address_parser_spark.plans.pipeline import LinkagePlan

    spark = _session("abap-split")
    pages = _read(spark, args.input, args.format)
    wide = LinkagePlan(spark, profile=args.profile).extract(pages)
    banded = wide.withColumn("band", confidence_band_expr())
    _write(banded, args.output, args.format, partition_by=["band"])
    return 0


def cmd_gazetteer_build(args) -> int:
    from ai_bangladesh_address_parser_spark.operators.gazetteer_build import build_gazetteer

    spark = _session("abap-gazetteer-build")
    labeled = _read(spark, args.input, args.format)
    _write(build_gazetteer(labeled), args.output, args.format)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ai_bangladesh_address_parser_spark")
    sub = p.add_subparsers(dest="verb", required=True)

    def common(sp):
        sp.add_argument("--input", required=True)
        sp.add_argument("--output", required=True)
        sp.add_argument("--format", default="parquet",
                        help="parquet (default) or iceberg")
        sp.add_argument("--checkpoint", default=None,
                        help="stage-store base dir; enables resume")
        sp.add_argument("--no-resume", action="store_true")
        sp.add_argument("--profile", default=None,
                        choices=[None, "fast", "balanced", "accurate", "minimal"])

    link = sub.add_parser("link", help="full linkage pipeline")
    common(link)
    link.add_argument("--scorer", default="levenshtein",
                      choices=["levenshtein", "difflib", "jaro_winkler", "token_jaccard"])
    link.add_argument("--threshold", type=float, default=0.85)
    link.set_defaults(fn=cmd_link)

    ex = sub.add_parser("extract", help="stage 1 only")
    common(ex)
    ex.set_defaults(fn=cmd_extract)

    sp = sub.add_parser("split", help="extract + partition by confidence band")
    common(sp)
    sp.set_defaults(fn=cmd_split)

    gb = sub.add_parser("gazetteer-build", help="build gazetteer dim from labeled records")
    common(gb)
    gb.set_defaults(fn=cmd_gazetteer_build)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
