"""Stage-8 conflict resolution vs the reference-semantics oracle."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark import reference_semantics as ref
from ai_bangladesh_address_parser_spark.operators.resolve import (
    resolve_evidence,
    resolved_wide,
)

COMPONENTS = ["house_number", "road", "area", "district", "postal_code"]
SOURCES = list(ref.SOURCE_WEIGHTS) + ["mystery_source"]


def _run_spark(spark, evidence, thresholds=None):
    df = spark.createDataFrame(
        [("m1", c, v, conf, s) for (c, v, conf, s) in evidence],
        "mention_id string, component string, value string, confidence double, source string",
    )
    rows = resolve_evidence(df, thresholds).collect()
    return {
        r["component"]: {
            "value": r["value"],
            "confidence": r["confidence"],
            "source": r["source"],
            "conflict": r["conflict"],
            "evidence_count": r["evidence_count"],
        }
        for r in rows
    }


def test_agreement_consensus_bonus(spark):
    ev = [("district", "Dhaka", 0.9, "regex"), ("district", "Dhaka", 0.8, "fsm")]
    got = _run_spark(spark, ev)
    want = ref.resolve_evidence(ev)
    assert got["district"]["value"] == "Dhaka"
    assert got["district"]["confidence"] == pytest.approx(min(0.85 * 1.05, 0.99))
    assert got["district"]["confidence"] == pytest.approx(want["district"]["confidence"])
    assert not got["district"]["conflict"]
    assert got["district"]["source"] == "regex"


def test_conflict_weighted_vote(spark):
    ev = [
        ("district", "Dhaka", 0.90, "fsm"),          # vote 0.90*0.90=0.81
        ("district", "Chattogram", 0.85, "regex"),   # vote 0.85*1.00=0.85
    ]
    got = _run_spark(spark, ev)
    want = ref.resolve_evidence(ev)
    assert got["district"]["value"] == want["district"]["value"] == "Chattogram"
    assert got["district"]["confidence"] == pytest.approx(0.85 * 0.90)
    assert got["district"]["conflict"]


def test_postal_format_filter(spark):
    ev = [("postal_code", "12345", 0.99, "regex"), ("postal_code", "1216", 0.8, "fsm")]
    got = _run_spark(spark, ev)
    assert got["postal_code"]["value"] == "1216"


def test_thresholds_drop_component(spark):
    ev = [("area", "Mirpur", 0.50, "unvalidated")]
    got = _run_spark(spark, ev, thresholds={"area": 0.65})
    assert "area" not in got


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(COMPONENTS),
            st.sampled_from(["Dhaka", "Mirpur", "1216", "12", "5", "4219"]),
            st.floats(min_value=0.05, max_value=0.99).map(lambda x: round(x, 2)),
            st.sampled_from(SOURCES),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_resolve_property_vs_oracle(spark, evidence):
    got = _run_spark(spark, evidence)
    want = ref.resolve_evidence(evidence)
    assert set(got) == set(want)
    for comp, w in want.items():
        g = got[comp]
        assert g["value"] == w["value"], (comp, evidence)
        assert g["confidence"] == pytest.approx(w["confidence"])
        assert g["conflict"] == w["conflict"]
        assert g["evidence_count"] == w["evidence_count"]


def test_resolved_wide_shape(spark):
    ev = [("district", "Dhaka", 0.9, "regex"), ("postal_code", "1216", 0.9, "regex")]
    df = spark.createDataFrame(
        [("m1", c, v, conf, s) for (c, v, conf, s) in ev],
        "mention_id string, component string, value string, confidence double, source string",
    )
    wide = resolved_wide(resolve_evidence(df)).collect()[0]
    assert wide["district"] == "Dhaka"
    assert wide["postal_code"] == "1216"
    assert wide["area"] == ""
    assert wide["overall_confidence"] > 0.9
    assert wide["error"] is None


def test_resolved_wide_error_isolation(spark):
    """D4 semantics: an `_error` isolation row (emitted per-row by the
    extraction battery instead of failing the task) surfaces as the
    `error` column and is excluded from overall_confidence."""
    ev = [
        ("district", "Dhaka", 0.9, "regex"),
        ("_error", "ValueError: boom", 0.0, "regex"),
    ]
    df = spark.createDataFrame(
        [("m1", c, v, conf, s) for (c, v, conf, s) in ev],
        "mention_id string, component string, value string, confidence double, source string",
    )
    wide = resolved_wide(resolve_evidence(df)).collect()[0]
    assert wide["error"] == "ValueError: boom"
    # mean over address components only — the 0.0 _error row must not
    # depress it (district alone: 0.9 * 1.05 consensus bonus)
    assert wide["overall_confidence"] > 0.9
