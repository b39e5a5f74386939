"""Address-likelihood gate: signal semantics + pipeline equivalence.

The gate (functions/signal.py) must be a pure work-skipper: with it on,
pure-prose pages bypass the deep battery and minhash banding, but every
pipeline OUTPUT — components, confidences, entity assignments — is
byte-identical to the ungated run.
"""

from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.functions.signal import (
    SIGNAL_PATTERN,
    address_signal_expr,
)
from ai_bangladesh_address_parser_spark.plans.pipeline import LinkagePlan
from ai_bangladesh_address_parser_spark.sources.pages import synth_pages

# digit-free, keyword-free, vocab-free prose — the skip class
_PROSE = [
    "the committee met to discuss the quarterly agenda and adjourned early",
    "rainfall patterns shifted noticeably during the monsoon season",
    "সাহিত্য ও সংস্কৃতি নিয়ে আলোচনা সভা অনুষ্ঠিত হয়",
    "economic policy remains a topic of lively public debate",
]

# texts the gate must keep (each hits exactly one signal class)
_SIGNALFUL = [
    ("plain digit only", "lorem ipsum dolor sit amet 7 consectetur"),
    ("bangla digit", "লোরেম ইপসাম ৫ ডলর"),
    ("keyword, no digit", "the old house by the river"),
    ("bangla keyword", "পুরনো বাড়ি নদীর ধারে"),
    ("district vocab", "visiting relatives in sylhet next month"),
    ("bangla district", "ঢাকা শহরে উৎসব"),
    ("area vocab", "shops in gulshan are busy"),
    ("area variant", "the zigatola neighbourhood"),
]


def test_signal_expr_classes(spark):
    df = spark.createDataFrame(
        [(t,) for t in _PROSE] + [(t,) for _, t in _SIGNALFUL], "text string"
    )
    got = [r["s"] for r in
           df.select(address_signal_expr("text").alias("s")).collect()]
    assert got == [False] * len(_PROSE) + [True] * len(_SIGNALFUL)


def test_signal_pattern_is_static():
    # foldable literal pattern — codegen-safe, no per-row compilation
    assert isinstance(SIGNAL_PATTERN, str) and SIGNAL_PATTERN.startswith("[0-9০-৯]")
    assert "dhaka" in SIGNAL_PATTERN and "বাড়ি" in SIGNAL_PATTERN


def _mixed_corpus(spark, n_pages=240):
    pages, truth = synth_pages(spark, n_pages=n_pages, n_entities=30)
    neg = spark.createDataFrame(
        [(f"prose://{i}", _PROSE[i % len(_PROSE)] + f" variant {'x' * (i % 3)}")
         for i in range(60)],
        "url string, text string",
    ).select(
        "url",
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    return pages.unionByName(neg), truth


def test_gate_equivalence(spark):
    """Gated and ungated runs produce identical entities + components."""
    corpus, _ = _mixed_corpus(spark)

    def snapshot(gate: bool):
        ents = LinkagePlan(spark, gate=gate).run(corpus)
        rows = ents.select(
            "url", "mention_id", "house_number", "road", "area", "district",
            "division", "postal_code", "flat_number", "floor_number",
            "block_number", "country",
            F.col("overall_confidence").cast("string").alias("oc"),
        ).collect()
        ids = {(r["url"], r["mention_id"]) for r in rows}
        # entity ids are run-relative — compare the PARTITION they induce
        part = (ents.groupBy("entity_id")
                .agg(F.sort_array(F.collect_list("mention_id")).alias("m"))
                .select("m").collect())
        return sorted(map(tuple, (tuple(r) for r in rows))), ids, sorted(
            tuple(r["m"]) for r in part)

    rows_on, ids_on, clusters_on = snapshot(gate=True)
    rows_off, ids_off, clusters_off = snapshot(gate=False)
    assert ids_on == ids_off
    assert rows_on == rows_off
    assert clusters_on == clusters_off


def test_gate_metrics_and_singletons(spark):
    corpus, _ = _mixed_corpus(spark)
    plan = LinkagePlan(spark, gate=True)
    ents = plan.run(corpus)
    prose = ents.filter(F.col("url").startswith("prose://"))
    # prose pages survive to the output; exact-dup texts collapse to one
    # entity per distinct normalized text (unique-level semantics), and
    # no prose page ever merges with an address entity
    assert prose.count() == 60
    n_texts = prose.select("normalized").distinct().count()
    assert prose.select("entity_id").distinct().count() == n_texts == 12
    addr_ents = ents.filter(~F.col("url").startswith("prose://")).select("entity_id")
    assert prose.select("entity_id").join(addr_ents, "entity_id").count() == 0
    # and every one of them was skipped by the gate (plus nothing else:
    # every labeled synth page carries digits)
    m = plan.metrics()["s1_gate"]
    assert m["gate_skipped"] > 0
    assert m["gate_skipped"] <= m["unique_mentions"]
