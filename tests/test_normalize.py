"""Byte-identity of the Catalyst normalization chain vs the reference
semantics oracle (which replays src/core/stages/normalizer.py:44-75)."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark import reference_semantics as ref
from ai_bangladesh_address_parser_spark.functions.normalize import (
    norm_key_expr,
    normalize_expr,
)
from ai_bangladesh_address_parser_spark.functions.script import script_cols

# the 13 reference smoke addresses (tests/simple_test.py:63-76) + edge cases
SMOKE_ADDRESSES = [
    "105/A, Central Road, gulisthan, Dhaka",
    "House 12, Road 5, Mirpur 1, Dhaka",
    "Flat A-3, Building 7, Bashundhara R/A, Dhaka",
    '1152/C "Greenhouse", House# 45, Road# 08, Shapla Residential Area, Halishahar, Chittagong-4219',
    "101/1 west monipur House name- Dream house, 60 feet road, 4th floor, flat- D2, Mirpur-2, Dhaka-1216",
    "1/4, South Begun Bari (Master Bari), Tejgaon I/A, Tejgaon, Dhaka -1208. (Near Satrasta)",
    "৬ রোড, ৯ ব্লক, C, চন্দ্রিমা মডেল টাউন, মোহাম্মদপুর, ঢাকা।",
    "৫৬ জিগাতলা, হাজী আবদুর রহমান লেন, ধানমন্ডি, ঢাকা-১২০৯",
    "sottota tower, h107/2,Road 7, zigatola",
    "Uttara, Sector 11, Road 13A, House 1, Floor 7B",
    "ctg hose 5 raod 9",
    "  spaces\tand nbsp , комма ,x",
    "House#12:Road#5,dhakka",
]


def _spark_normalize(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(normalize_expr("text").alias("n")).collect()
    return [r["n"] for r in rows]


def test_smoke_addresses_byte_identical(spark):
    got = _spark_normalize(spark, SMOKE_ADDRESSES)
    want = [ref.normalize(t) for t in SMOKE_ADDRESSES]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("L", "N", "P", "Z"),
                whitelist_characters="০১২৩৪৫৬৭৮৯ঢাকারোডবাড়ি#:,\"'  ",
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_normalize_property(spark, texts):
    got = _spark_normalize(spark, texts)
    want = [ref.normalize(t) for t in texts]
    assert got == want


def test_norm_key(spark):
    df = spark.createDataFrame([("  HoUse 5, DHAKA  ",)], ["text"])
    assert df.select(norm_key_expr("text").alias("k")).first()["k"] == "house 5, dhaka"


def test_script_detect_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in SMOKE_ADDRESSES], ["text"])
    cols = script_cols("text")
    rows = df.select(
        "text",
        cols["bangla_ratio"].alias("br"),
        cols["english_ratio"].alias("er"),
        cols["primary_script"].alias("ps"),
    ).collect()
    for r in rows:
        want = ref.detect_script(r["text"])
        assert r["br"] == pytest.approx(want["bangla_ratio"])
        assert r["er"] == pytest.approx(want["english_ratio"])
        assert r["ps"] == want["primary_script"]
