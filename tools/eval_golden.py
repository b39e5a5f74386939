"""Per-component accuracy of the extraction pipeline on the golden
labeled fixture (tests/data/golden_addresses.json — 152 records drawn
every-9th from the reference's 1,363-record labeled corpus,
``data/raw/merged_addresses.json``; FIXTURES.md F2 shape).

Label canonicalization: the reference labels are stylistically
inconsistent (road sometimes keeps the keyword — "Road 2",
"Sonatonghor Road" — house rarely does; floor "4th" vs "4"), so both
sides are canonicalized before comparison: lowercase, strip
road/house/floor keywords and ordinal suffixes, collapse punctuation.

Usage: python tools/eval_golden.py [--show-miss COMPONENT]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "data", "golden_addresses.json")

COMPONENTS = ["house_number", "road", "area", "district", "division",
              "postal_code", "flat_number", "floor_number", "block_number",
              "country"]


def canon(component: str, v: str | None) -> str:
    v = (v or "").strip()
    # the pipeline's Stage-2 normalizer transliterates Bangla place
    # names before extraction (reference normalizer.py:19-33), so a
    # Bangla-script label (ধানমন্ডি) and the extracted Banglish value
    # (Dhanmondi) are the same value — apply the same table to both
    # sides before comparing
    from ai_bangladesh_address_parser_spark.reference_semantics import BN_PLACES
    for bn, en in BN_PLACES:
        v = v.replace(bn, en)
    v = v.lower()
    v = v.translate(str.maketrans("০১২৩৪৫৬৭৮৯", "0123456789"))
    v = v.replace("#", "").replace("নং", "").strip()
    if component == "house_number":
        v = re.sub(r"^(?:house|holding|home|bldg|building|bari|plot|basa|basha|বাড়ি|বাসা|হোল্ডিং)\s*(?:no\.?|number)?\s*[-:]?\s*", "", v)
        # label style noise: "H#313/A" vs "313/A" vs "H-313" all denote
        # the same holding — fold the H prefix on both sides
        v = re.sub(r"^h[\s#-]*(?=\d)", "", v)
    if component == "road":
        v = v.replace(":", " ")
        v = re.sub(r"\b(?:road|rd\.?|lane|ln\.?|avenue|ave\.?|no\.?|number|sarani|sarak|goli)\b", " ", v)
        # Bangla combining vowel signs are not \w in Python re, so \b
        # misfires after them — strip Bangla keywords without boundaries
        v = re.sub(r"রোড|লেইন|লেন|গলি|সড়ক|নাম্বার|নম্বর", " ", v)
        v = re.sub(r"^r\b\.?", " ", v)
        # "R#21" / "Road#04" glue (the # was swallowed above): fold the
        # keyword prefix on both sides
        v = re.sub(r"^r(?:oad)?[\s#-]*(?=[a-z]?\d)", "", v)
    if component == "district":
        # apostrophe variants (Cox's/Cox’s/Coxʼs Bazar) and stray marks
        v = re.sub(r"[^\w\s]", "", v)
    if component == "floor_number":
        v = re.sub(r"(?<=\d)(?:st|nd|rd|th)\b", "", v)
        v = re.sub(r"\b(?:floor|fl|level)\b", " ", v)
    if component in ("flat_number", "block_number"):
        v = re.sub(r"\b(?:flat|block|blk|sector|apt|apartment|suite|unit|no\.?)\b", " ", v)
        v = v.replace("-", "").replace("/", "")
    if component == "district":
        # 2018 official renamings — one district, two spellings in the
        # labeled corpus (Comilla/Cumilla, Bogra/Bogura, Jessore/
        # Jashore, Barisal/Barishal, Chittagong/Chattogram)
        renames = {"comilla": "cumilla", "bogra": "bogura",
                   "jessore": "jashore", "barishal": "barisal",
                   "chittagong": "chattogram"}
        v = renames.get(v, v)
    if component == "area":
        v = re.sub(r"\b(?:north|south|east|west|middle|new|old|uttor|dokkhin|purbo|poschim|পূর্ব|পশ্চিম|উত্তর|দক্ষিণ)\b", " ", v)
        v = re.sub(r"\br/?a\b|\bresidential\s+area\b|\babashik\b", " ", v)
        # label style noise: "Dhaka Cantonment" / "Dhaka Cantt" /
        # "Cantonment" all name the same locality
        v = re.sub(r"\bcantt\b", "cantonment", v)
        v = re.sub(r"\bdhaka\s+(?=cant)", "", v)
    v = re.sub(r"[\s,.\-–]+", " ", v).strip()
    return v


def evaluate(records=None, show_miss: str | None = None,
             vocab_records=None, ner: str | None = None) -> dict:
    """Score ``records``; the batch gazetteer/area vocabulary is built
    from ``vocab_records`` (defaults to the scored records — the
    reference's own batch lifecycle, hence in-sample). Pass a disjoint
    ``vocab_records`` for a held-out generalization figure
    (``--held-out``). ``ner="perceptron"`` unions the learned T10
    evidence into Stage-8 voting (reference optional-stage semantics,
    spacy_ner source weight 0.85) — ``--ner`` measures its effect on
    component accuracy."""
    from pyspark.sql import functions as F

    from ai_bangladesh_address_parser_spark.functions.normalize import normalize_expr
    from ai_bangladesh_address_parser_spark.operators.extract import extract_evidence
    from ai_bangladesh_address_parser_spark.operators.resolve import (
        resolve_evidence,
        resolved_wide,
    )
    from ai_bangladesh_address_parser_spark.session import get_spark

    records = records or json.load(open(GOLDEN))
    spark = get_spark("eval-golden", master="local[8]", shuffle_partitions=8)
    df = spark.createDataFrame(
        [(str(r["id"]), r["address"]) for r in records], "mention_id string, raw string"
    ).withColumn("normalized", normalize_expr("raw"))
    # Reference lifecycle parity (production_address_extractor.py:
    # 1205-1257): the extractor's gazetteer is built from the batch's
    # own labeled input, so candidate generation knows every labeled
    # area. Labels are normalized like mention text before keying.
    from ai_bangladesh_address_parser_spark.operators.gazetteer_build import (
        area_vocab_from_labeled,
        build_gazetteer,
    )
    lab = spark.createDataFrame(
        [(r["components"].get("area") or "", r["components"].get("district") or "",
          r["components"].get("division") or "", r["components"].get("postal_code") or "")
         for r in (vocab_records if vocab_records is not None else records)],
        "area string, district string, division string, postal_code string",
    ).withColumn("area", normalize_expr(F.col("area")))
    gazetteer = build_gazetteer(lab)
    area_vocab = area_vocab_from_labeled(lab)
    from ai_bangladesh_address_parser_spark.functions.country import with_country

    ev = extract_evidence(df, gazetteer=gazetteer, area_vocab=area_vocab)
    if ner:
        from ai_bangladesh_address_parser_spark.operators.ner import ner_evidence

        ev = ev.unionByName(ner_evidence(df, model=ner))
    wide = resolved_wide(resolve_evidence(ev)).join(
        df.select("mention_id", "normalized"), "mention_id")
    wide = with_country(wide, text_col="normalized")
    got = {r["mention_id"]: r.asDict() for r in wide.collect()}

    acc, n_present = {}, {}
    misses = []
    for r in records:
        rid = str(r["id"])
        g = got.get(rid, {})
        for c in COMPONENTS:
            want = canon(c, r["components"].get(c, ""))
            have = canon(c, g.get(c, ""))
            n_present[c] = n_present.get(c, 0) + (1 if want else 0)
            ok = want == have or want.replace(" ", "") == have.replace(" ", "")
            if want:
                acc[c] = acc.get(c, 0) + (1 if ok else 0)
            if want and not ok and show_miss in (c, "all"):
                misses.append((rid, c, r["address"][:70], "want=" + want, "got=" + have))
    out = {c: round(acc.get(c, 0) / n_present[c], 3) for c in COMPONENTS if n_present.get(c)}
    out["_n"] = len(records)
    for m in misses[:40]:
        print("MISS", *m)
    return out


if __name__ == "__main__":
    show = None
    if "--show-miss" in sys.argv:
        i = sys.argv.index("--show-miss") + 1
        if i >= len(sys.argv) or sys.argv[i].startswith("--"):
            sys.exit("usage: eval_golden.py [--show-miss COMPONENT] [--held-out]")
        show = sys.argv[i]
    ner = "perceptron" if "--ner" in sys.argv else None
    if "--held-out" in sys.argv:
        # generalization split: vocab from the even records, score the
        # odd ones (disjoint halves of the fixture)
        recs = json.load(open(GOLDEN))
        print(json.dumps(
            evaluate(records=recs[1::2], vocab_records=recs[::2],
                     show_miss=show, ner=ner), indent=1))
    else:
        print(json.dumps(evaluate(show_miss=show, ner=ner), indent=1))
