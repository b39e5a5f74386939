"""D5 stage profiles, J8 enrich verb, Bangla vocabulary breadth."""

from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.functions.normalize import normalize_expr
from ai_bangladesh_address_parser_spark.operators.extract import (
    DEFAULT_STAGES,
    PROFILES,
    enrich,
    extract_evidence,
)
from ai_bangladesh_address_parser_spark.operators.resolve import (
    resolve_evidence,
    resolved_wide,
)


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "mention_id string, raw string") \
        .withColumn("normalized", normalize_expr("raw"))


def test_profiles_gate_stages(spark):
    df = _mentions(spark, [("m1", "House 4, Dhanmondy, Dhaka")])
    # fast: no gazetteer → no gazetteer_validated / corrected evidence
    fast = extract_evidence(df, stages=PROFILES["fast"]).collect()
    assert not [r for r in fast if r["source"].startswith("gazetteer")]
    assert not [r for r in fast if r["source"] == "fsm"]
    assert not [r for r in fast if r["source"] == "spacy_ner"]
    # accurate: gazetteer + geographic + ner evidence all present
    acc = extract_evidence(df, stages=PROFILES["accurate"]).collect()
    assert [r for r in acc if r["source"].startswith("gazetteer")]
    assert [r for r in acc if r["source"] == "spacy_ner"]
    assert [r for r in acc if r["source"] == "fsm"]


def test_geographic_stage_in_default_pipeline(spark):
    """J5 proactive geo extraction is wired into the default stage set:
    an upazila-only mention gains area/district/division evidence."""
    assert "geographic" in DEFAULT_STAGES
    df = _mentions(spark, [("m1", "Shop 7, Savar")])
    wide = resolved_wide(resolve_evidence(extract_evidence(df)))
    got = wide.collect()[0].asDict()
    assert got["area"] == "Savar"
    assert got["district"] == "Dhaka"


def test_enrich_verb(spark):
    wide = spark.createDataFrame(
        [("e1", "1340", "", "Dhaka"),       # known geo postal → hierarchy
         ("e2", "", "Savar", "Dhaka"),      # missing → upazila prediction
         ("e3", "1212", "Gulshan", "Dhaka"),  # postal-DB code, no hierarchy
         ("e4", "", "zzz", "")],            # nothing
        "mention_id string, postal_code string, area string, district string")
    got = {r["mention_id"]: r.asDict() for r in enrich(wide).collect()}
    assert got["e1"]["geo_upazila"] == "Savar"
    assert got["e1"]["geo_unions"] == "Savarhat1|Savarhat2|Savarhat3"
    assert got["e1"]["final_postal"] == "1340" and got["e1"]["postal_origin"] == "extracted"
    assert got["e2"]["final_postal"] == "1340" and got["e2"]["postal_origin"] == "upazila_match"
    assert got["e3"]["geo_upazila"] == "" and got["e3"]["final_postal"] == "1212"
    assert got["e4"]["final_postal"] == "" and got["e4"]["postal_origin"] == ""


def test_bangla_district_vocabulary(spark):
    """Full Bangla district map: a district written only in Bangla
    resolves to its canonical English name."""
    df = _mentions(spark, [("b1", "House 3, Road 2, নোয়াখালী"),
                           ("b2", "House 4, Road 1, কুষ্টিয়া")])
    wide = resolved_wide(resolve_evidence(extract_evidence(df)))
    got = {r["mention_id"]: r.asDict() for r in wide.collect()}
    assert got["b1"]["district"] == "Noakhali"
    assert got["b1"]["division"] == "Chattogram"
    assert got["b2"]["district"] == "Kushtia"
    assert got["b2"]["division"] == "Khulna"


def test_bangla_block_letter_map(spark):
    """'ব্লক ক' normalizes to Block and the Bangla letter maps to its
    Banglish name (block_processor.py:251-259)."""
    df = _mentions(spark, [("k1", "বাড়ি ৫, ব্লক ক, মিরপুর"),
                           ("k2", "House 5, Block খ, Mirpur")])
    wide = resolved_wide(resolve_evidence(extract_evidence(df)))
    got = {r["mention_id"]: r.asDict() for r in wide.collect()}
    assert got["k1"]["block_number"] == "Ka"
    assert got["k2"]["block_number"] == "Kha"


def test_d4_error_isolation(monkeypatch):
    """A per-mention extraction exception becomes an _error evidence
    row, never a failure (reference batch loop, extractor.py:513-544)."""
    from ai_bangladesh_address_parser_spark.operators import house_road as hr

    def boom(t):
        raise ValueError("synthetic failure")

    monkeypatch.setattr(hr, "extract_house", boom)
    rows = hr._rows_for_text("House 5, Dhaka")
    assert rows == [("_error", "ValueError: synthetic failure", 0.0)]
    # normal path unaffected
    monkeypatch.undo()
    assert ("house_number", "5", 0.96) in hr._rows_for_text("House 5, Dhaka")


def test_flat_group_concat(spark):
    """T9: '(A)(5)' concatenates to flat 'A5'
    (flat_number_processor.py:617-830)."""
    df = _mentions(spark, [("f1", "House 9, Flat (A)(5), Gulshan, Dhaka")])
    wide = resolved_wide(resolve_evidence(extract_evidence(df)))
    assert wide.collect()[0]["flat_number"] == "A5"
