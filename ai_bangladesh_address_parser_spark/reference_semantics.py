"""Pure-Python *test oracle* for the reference's row-level semantics.

This module is NOT part of the Spark engine. It exists so pytest can
property-check (incl. hypothesis) that our Catalyst expression chains
are byte-identical / value-identical to the reference's published
behavior. Each function documents the reference citation it models:

  * ``normalize``        — src/core/stages/normalizer.py:44-75
  * ``detect_script``    — src/core/stages/script_detector.py:10-39
  * ``fsm_parse``        — src/core/stages/fsm_parser.py:13-75
  * ``compare_components`` — src/core/utils/address_utils.py:131-206
  * ``resolve_evidence`` — src/core/stages/conflict_resolver.py:33-125

Implementations are original, written from the behavioral spec in
SURVEY.md §2; tables are the public data constants the behavior is
defined over.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

# --- normalization tables (order matters; applied sequentially) ----------
BN_NUMERALS = [("০", "0"), ("১", "1"), ("২", "2"), ("৩", "3"), ("৪", "4"),
               ("৫", "5"), ("৬", "6"), ("৭", "7"), ("৮", "8"), ("৯", "9")]

BN_PLACES = [("ঢাকা", "Dhaka"), ("চট্টগ্রাম", "Chattogram"), ("চিটাগাং", "Chattogram"),
             ("সিলেট", "Sylhet"), ("রাজশাহী", "Rajshahi"), ("খুলনা", "Khulna"),
             ("বরিশাল", "Barisal"), ("রংপুর", "Rangpur"), ("ময়মনসিংহ", "Mymensingh"),
             ("বনানী", "Banani"), ("গুলশান", "Gulshan"), ("ধানমন্ডি", "Dhanmondi"),
             ("উত্তরা", "Uttara"), ("মিরপুর", "Mirpur"), ("হালিশহর", "Halishahar"),
             ("আগ্রাবাদ", "Agrabad"), ("বশুন্ধরা", "Bashundhara")]

BN_KEYWORDS = [("রোড", "Road"), ("বাড়ি", "House"), ("বাসা", "House"), ("বাড়ী", "House"),
               ("ফ্ল্যাট", "Flat"), ("তলা", "Floor"), ("ব্লক", "Block"),
               ("লেন", "Lane"), ("গলি", "Lane"), ("নং", "No"), ("নাম্বার", "No")]

CORRECTIONS = [("chittagong", "Chattogram"), ("chittagang", "Chattogram"),
               ("ctg", "Chattogram"), ("daka", "Dhaka"), ("dhakka", "Dhaka"),
               ("raod", "Road"), ("hose", "House"), ("hause", "House")]


def normalize(address: str) -> str:
    """Reference Stage-2 canonical normalization (exact replay order)."""
    if not address:
        return ""
    for bn, en in BN_NUMERALS:
        address = address.replace(bn, en)
    for bn, en in BN_PLACES:
        address = address.replace(bn, en)
    for bn, en in BN_KEYWORDS:
        address = address.replace(bn, en)
    address = address.replace('"', "").replace("'", "")
    for wrong, right in CORRECTIONS:
        address = re.sub(r"\b" + wrong + r"\b", right, address, flags=re.IGNORECASE)
    address = address.replace("#", " No ")
    address = address.replace(":", " ")
    address = re.sub(r"\s+", " ", address).strip()
    address = re.sub(r"\s*,\s*", ", ", address)
    return address


def detect_script(address: str) -> dict:
    """Reference Stage-1 script detection."""
    if not address:
        return {"primary_script": "neutral", "bangla_ratio": 0.0,
                "english_ratio": 0.0, "is_mixed": False}
    bangla = sum(1 for c in address if "ঀ" <= c <= "৿")
    english = sum(1 for c in address if c.isalpha() and ord(c) < 128)
    total = len(address)
    br, er = bangla / total, english / total
    if br > 0.3 and er > 0.3:
        primary = "mixed"
    elif br > er:
        primary = "bn"
    else:
        primary = "en"
    return {"primary_script": primary, "bangla_ratio": br,
            "english_ratio": er, "is_mixed": primary == "mixed"}


_FSM_HOUSE = [r"House\s+No\s+(\d+[A-Za-z]?)", r"House\s+No\s+(\d+/[A-Za-z])",
              r"House\s+(\d+)", r"H\s+(\d+)"]
_FSM_ROAD = [r"Road\s+No\s+(\d+[A-Za-z]?)", r"Road\s+No\s+(\d+/[A-Za-z]?)",
             r"Road\s+(\d+)", r"R\s+(\d+)"]


def fsm_parse(address: str) -> dict:
    """Reference Stage-3 'FSM' parse (first-match regex per component)."""
    out = {k: None for k in ("house_number", "road", "area", "district",
                             "postal_code", "flat_number", "floor_number",
                             "block_number")}
    for pat in _FSM_HOUSE:
        m = re.search(pat, address, re.IGNORECASE)
        if m:
            out["house_number"] = m.group(1)
            break
    for pat in _FSM_ROAD:
        m = re.search(pat, address, re.IGNORECASE)
        if m:
            out["road"] = m.group(1)
            break
    m = re.search(r"\b(\d{4})\b", address)
    if m and m.end() > len(address) * 0.5:
        out["postal_code"] = m.group(1)
    m = re.search(r"Flat\s+(\w+)", address, re.IGNORECASE)
    if m:
        out["flat_number"] = m.group(1)
    m = re.search(r"Floor\s+(\d+)", address, re.IGNORECASE)
    if m:
        out["floor_number"] = m.group(1)
    m = re.search(r"Block\s+([A-Z0-9]+)", address, re.IGNORECASE)
    if m:
        out["block_number"] = m.group(1)
    confidence = 0.75 if any(out.values()) else 0.0
    return {"components": out, "confidence": confidence}


ALL_COMPONENTS = ["house_number", "road", "area", "district", "division",
                  "postal_code", "flat_number", "floor_number", "block_number"]

PAIR_WEIGHTS = {"postal_code": 0.3, "district": 0.25, "area": 0.2,
                "house_number": 0.1, "road": 0.1, "division": 0.05}

MATCH_THRESHOLD = 0.85


def compare_components(c1: dict, c2: dict) -> dict:
    """Reference pairwise comparison: SequenceMatcher per component,
    weighted score, match iff score >= 0.85."""
    sims = {}
    for comp in ALL_COMPONENTS:
        v1 = str(c1.get(comp) or "").strip().lower()
        v2 = str(c2.get(comp) or "").strip().lower()
        if v1 and v2:
            sims[comp] = SequenceMatcher(None, v1, v2).ratio()
    avg = sum(sims.values()) / len(sims) if sims else 0.0
    ws, tw = 0.0, 0.0
    for comp, w in PAIR_WEIGHTS.items():
        if comp in sims:
            ws += sims[comp] * w
            tw += w
    score = ws / tw if tw > 0 else avg
    return {"score": score, "match": score >= MATCH_THRESHOLD,
            "similarity": avg, "component_similarities": sims}


# Byte-faithful mirror of the reference's calibrated table
# (conflict_resolver.py:13-27) INCLUDING its emitted-vs-weighted name
# drift: the reference lists 'geographic_inferred_from_area'/'_from_
# district' here, but its validator actually emits 'geographic_
# inferred_from_upazila' (geographic_validator.py:200,206) and its
# gazetteer emits 'gazetteer_position_exact'/'_fuzzy'
# (gazetteer.py:232,242) — all three fall through to the 0.5 default
# (`self.weights.get(source, 0.5)`, conflict_resolver.py:102) in the
# reference exactly as they do here. "Fixing" the table would change
# Stage-8 vote outcomes away from reference parity (e.g. a position-
# strategy exact hit would start beating a fuzzy correction), so the
# drift is preserved deliberately.
SOURCE_WEIGHTS = {
    "regex": 1.00, "gazetteer_validated": 0.95, "fsm": 0.90,
    "spacy_ner": 0.85, "gazetteer_corrected": 0.85,
    "inferred_from_area": 0.80, "inferred_from_district": 0.80,
    "geographic_inferred_from_area": 0.80,
    "geographic_inferred_from_union": 0.80,
    "geographic_inferred_from_district": 0.80,
    "geographic_validated": 0.95, "geographic_upazila_extraction": 0.90,
    "geographic_union_extraction": 0.85, "unvalidated": 0.60,
}
DEFAULT_SOURCE_WEIGHT = 0.5


def resolve_evidence(evidence, thresholds=None):
    """Reference Stage-8 resolution over one mention's evidence list.

    ``evidence``: list of (component, value, confidence, source).
    Deterministic tie-breaks (vote desc, confidence desc, value asc) —
    the reference relies on list order; we pin a total order instead.
    Returns {component: {value, confidence, source, conflict}}.
    """
    thresholds = thresholds or {}
    by_comp: dict[str, list] = {}
    for comp, value, conf, source in evidence:
        if comp == "postal_code" and not re.match(r"^\d{4}$", str(value).strip()):
            continue
        if value:
            by_comp.setdefault(comp, []).append((str(value), float(conf), source))
    out = {}
    for comp, evs in by_comp.items():
        uniq = {v for v, _, _ in evs}
        if len(uniq) == 1:
            value = next(iter(uniq))
            avg = sum(c for _, c, _ in evs) / len(evs)
            best = max(evs, key=lambda e: (e[1], e[2]))
            conf = min(avg * 1.05, 0.99)
            conflict = False
            source = best[2]
        else:
            votes: dict[str, float] = {}
            for v, c, s in evs:
                votes[v] = votes.get(v, 0.0) + c * SOURCE_WEIGHTS.get(s, DEFAULT_SOURCE_WEIGHT)
            # deterministic: vote desc, then value asc
            best_vote = max(votes.values())
            value = min(v for v, s in votes.items() if s == best_vote)
            best = max([e for e in evs if e[0] == value], key=lambda e: (e[1], e[2]))
            conf = best[1] * 0.90
            conflict = True
            source = best[2]
        if conf < thresholds.get(comp, 0.0):
            continue
        out[comp] = {"value": value, "confidence": conf, "source": source,
                     "conflict": conflict, "evidence_count": len(evs)}
    return out
