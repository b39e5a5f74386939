"""S2/A5 gazetteer build + J1 dominance-based postal prediction."""

from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.operators.extract import gazetteer_evidence
from ai_bangladesh_address_parser_spark.operators.gazetteer_build import build_gazetteer


def _labeled(spark):
    # Badda: 8x 1212 + 2x 1219 -> share 0.8 -> 0.98
    # Gulshan: 6x 1212 + 4x 1213 -> share 0.6 -> 0.95
    # Mirpur: 5x 1216 + 3x 1207 + 2x 1209 -> share 0.5 -> 0.90
    # Uttara: 4x 1230 -> single -> 0.98
    rows = (
        [("Badda", "Dhaka", "Dhaka", "1212")] * 8
        + [("Badda", "Dhaka", "Dhaka", "1219")] * 2
        + [("Gulshan", "Dhaka", "Dhaka", "1212")] * 6
        + [("Gulshan", "Dhaka", "Dhaka", "1213")] * 4
        + [("Mirpur", "Dhaka", "Dhaka", "1216")] * 5
        + [("Mirpur", "Dhaka", "Dhaka", "1207")] * 3
        + [("Mirpur", "Dhaka", "Dhaka", "1209")] * 2
        + [("Uttara", "Dhaka", "Dhaka", "1230")] * 4
        + [("Uttara", "Gazipur", "Dhaka", "bad!")]  # invalid postal dropped
        + [("", "Dhaka", "Dhaka", "1000")]          # empty area dropped
    )
    return spark.createDataFrame(
        rows, "area string, district string, division string, postal_code string")


def test_build_gazetteer_dominance(spark):
    g = {r["area"]: r for r in build_gazetteer(_labeled(spark)).collect()}
    assert set(g) == {"badda", "gulshan", "mirpur", "uttara"}
    assert (g["badda"]["top_postal"], g["badda"]["postal_confidence"]) == ("1212", 0.98)
    assert (g["gulshan"]["top_postal"], g["gulshan"]["postal_confidence"]) == ("1212", 0.95)
    assert (g["mirpur"]["top_postal"], g["mirpur"]["postal_confidence"]) == ("1216", 0.90)
    assert (g["uttara"]["top_postal"], g["uttara"]["postal_confidence"]) == ("1230", 0.98)
    assert g["mirpur"]["postal_codes"] == "1216|1207|1209"  # freq-sorted
    assert g["mirpur"]["n_postals"] == 3 and g["mirpur"]["n_records"] == 10
    assert abs(g["badda"]["top_share"] - 0.8) < 1e-9
    # district mode ignores the invalid-postal row's district only in
    # postal stats; Uttara's mode is still Dhaka (4 vs 1)
    assert g["uttara"]["district"] == "Dhaka"


def test_gazetteer_evidence_dominance_path(spark):
    g = build_gazetteer(_labeled(spark))
    ev = spark.createDataFrame(
        [("m1", "area", "Mirpur", 0.9, "regex"),       # multi-postal -> 0.90
         ("m2", "area", "Badda", 0.9, "regex"),        # dominant -> 0.98
         ("m3", "area", "Gulshan", 0.9, "regex"),      # 0.6 share -> 0.95
         ("m3", "postal_code", "1213", 0.9, "regex")], # has postal -> no pred
        "mention_id string, component string, value string, confidence double, source string")
    out = gazetteer_evidence(ev, gazetteer=g)
    pred = {r["mention_id"]: (r["value"], r["confidence"])
            for r in out.filter(F.col("component") == "postal_code")
                        .filter(F.col("source") == "gazetteer_validated")
                        .filter(F.col("confidence") < 0.99).collect()}
    assert pred["m1"] == ("1216", 0.90)
    assert pred["m2"] == ("1212", 0.98)
    assert "m3" not in pred  # postal already present


def test_gazetteer_evidence_default_unchanged(spark):
    """Constant-dim path still emits the single-code 0.98 prediction."""
    ev = spark.createDataFrame(
        [("m1", "area", "Gulshan", 0.9, "regex")],
        "mention_id string, component string, value string, confidence double, source string")
    out = gazetteer_evidence(ev).filter(F.col("component") == "postal_code").collect()
    assert [(r["value"], r["confidence"]) for r in out] == [("1212", 0.98)]
