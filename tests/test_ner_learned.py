"""T10 learned path: the packaged averaged-perceptron NER.

Pins (a) weight-asset integrity + decode determinism, (b) held-out
span F1 on the reference's public training data (the model must stay
a learned signal, not a memorized one — the split is by text hash and
the bound is on UNSEEN examples), and (c) the Spark evidence contract
through ``ner_evidence(model="perceptron")``.
"""

import json
import zlib

import pytest

from ai_bangladesh_address_parser_spark.operators.ner import ner_evidence
from ai_bangladesh_address_parser_spark.operators.ner_perceptron import (
    WEIGHTS_PATH,
    load_model,
)

REFERENCE_SPANS = "/root/reference/data/training/spacy_training_data.json"


def test_weights_asset_loads_and_decodes_deterministically():
    m1, m2 = load_model(), load_model()
    text = "House 12, Road 5, Dhanmondi, Dhaka-1209"
    assert m1.spans(text) == m2.spans(text)
    assert m1.spans(text) == [
        ("HOUSE", "12"), ("ROAD", "Road 5"), ("AREA", "Dhanmondi"),
        ("DISTRICT", "Dhaka"), ("POSTAL", "1209"),
    ]
    # BIO constraint: decoded tag sequences never start a span with I-
    tags = m1.tag("Flat 5E House 9 Road 2 Gulshan Dhaka 1212".split())
    prev = "O"
    for t in tags:
        if t.startswith("I-"):
            assert prev[2:] == t[2:], f"orphan {t} after {prev}"
        prev = t


def test_heldout_span_f1_pinned():
    """Evaluate the SHIPPED weights on the deterministic 20% held-out
    split (crc32 % 5 == 0) — the same split tools/train_ner.py trains
    around, so these examples never influenced the weights."""
    from tools.train_ner import bio_encode, evaluate, relaxed_f1

    examples = json.load(open(REFERENCE_SPANS, encoding="utf-8"))
    held = [
        enc
        for ex in examples
        if zlib.crc32(ex["text"].encode("utf-8")) % 5 == 0
        and (enc := bio_encode(ex)) is not None
    ]
    assert len(held) > 200
    m = load_model()
    metrics = evaluate(m, held)
    assert metrics["f1"] >= 0.72, metrics
    assert relaxed_f1(m, held) >= 0.79, metrics
    # the strongest single label must be solidly learned
    assert metrics["by_label_f1"]["DISTRICT"] >= 0.85, metrics


def test_weights_meta_records_provenance():
    import gzip

    with gzip.open(WEIGHTS_PATH, "rt", encoding="utf-8") as fh:
        blob = json.load(fh)
    assert blob["meta"]["train_examples"] > 900
    assert blob["meta"]["heldout_f1"] >= 0.72
    assert set(blob["tags"]) > {"O", "B-HOUSE", "I-ROAD", "B-DISTRICT"}


def test_spark_evidence_contract_perceptron(spark):
    df = spark.createDataFrame(
        [
            ("m1", "House 12, Road 5, Dhanmondi, Dhaka-1209"),
            ("m2", "H-107/2, R-7, Mirpur, Dhaka"),
            ("m3", ""),  # empty text must not error
        ],
        "mention_id string, normalized string",
    )
    rows = ner_evidence(df, model="perceptron").collect()
    by_mention = {}
    for r in rows:
        by_mention.setdefault(r.mention_id, {})[r.component] = r
    m1 = by_mention["m1"]
    assert m1["house_number"].value == "12"
    assert m1["district"].value == "Dhaka"
    assert m1["postal_code"].value == "1209"
    assert all(r.confidence == 0.85 and r.source == "spacy_ner" for r in rows)
    # first-occurrence-per-component rule: no duplicate components
    for comps in by_mention.values():
        assert len(comps) == len(set(comps))
    assert "m3" not in by_mention


def test_perceptron_missing_weights_fails_fast(spark):
    df = spark.createDataFrame([("m1", "x")], "mention_id string, normalized string")
    with pytest.raises(FileNotFoundError):
        ner_evidence(df, model="perceptron", model_path="/no/such/weights.json.gz")
