"""T4/T5/T6 deep extraction: guard batteries + priority selection.

The reference's house/road/area extractors are ~3,500 LoC of candidate
collection, guard rejection, and a hand-tuned priority argmax
(``src/regex/house_number_processor.py:612-1117`` — guards ``:398-610``,
priority ``:997-1104``; ``road_processor.py:873-1120`` with guards
``:354-871``; ``area_processor.py:729-1110`` multi-factor scoring).
SURVEY.md §7 calls this the one stage to keep in a single vectorized
pandas UDF rather than exploding into 50 expression columns: the logic
is per-row pure, needs match POSITIONS (which `regexp_extract` doesn't
expose), and byte-level Python-regex semantics.

Scale posture: this UDF runs on the UNIQUE normalized mentions only
(dedup-before-compute), Arrow-batched, with patterns precompiled once
per interpreter — the reference's singleton-extractor trick per
executor. Everything downstream (resolution, blocking, scoring) stays
in JVM expressions.

This is a behavior-level reimplementation (original code) of the
reference's semantics, tested against its labeled corpus
(tests/data/golden_addresses.json).
"""

from __future__ import annotations

import re
from typing import NamedTuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# --- pattern tables (precompiled at import — once per executor) -----------

_BANGLISH = r"(?:kha|ka|gha|ja|cho|cha|gh|ch|kh|k|ga|g"  # letter names
_BANGLISH_FULL = _BANGLISH + r")"

_HOUSE_TIERS = [
    # (method, regex, confidence)
    ("explicit", re.compile(
        r"(?i)\b(?:house|home|hous|building|bldg|plot|holding|basa|basha|bari|হোল্ডিং|প্লট)\s*"
        r"(?:name)?(?:\s*(?:no\.?|number|#|:|নং)){0,2}\s*[-–]?\s*"
        r"([A-Za-z]{0,2}[-/]?\d+[A-Za-z]?(?:[/-][A-Za-z0-9]+)*|[A-Za-z]\d+)"), 0.96),
    # reversed keyword: "78 No House"
    ("explicit", re.compile(
        r"(?i)\b(\d+(?:/[A-Za-z0-9]+)*)\s*no\.?\s*(?:house|basa|basha|bari)\b"), 0.88),
    ("banglish", re.compile(
        r"(?i)\b(" + _BANGLISH_FULL + r"\s*[-/]?\s*\d+(?:[/-][A-Za-z0-9]+)*)"), 0.90),
    # keyword-free compound tier: requires at least one '/' in the
    # compound (only dash segments may precede it) — a pure dash
    # compound like "10-12" is as likely a range/score as a holding
    # number, so without a slash it must earn a keyword tier instead
    ("slash", re.compile(
        r"(?<![\w/.-])(?=\d+(?:-[A-Za-z0-9ঀ-৿]+)*/)"
        r"(\d+(?:[/-][A-Za-z0-9ঀ-৿]+)+(?:\s(?:[A-Za-z]\b|[A-Za-z]{2}\b(?!\s+[A-Z])))?)"), 0.92),
    # dash-only compound: admitted only with house/flat context nearby
    # (ADVICE r2: unguarded dash compounds widen the non-house surface)
    ("slash", re.compile(
        r"(?i)(?:house|home|holding|basa|basha|bari|flat|apartment)\D{0,12}?"
        r"(?<![\w/.-])(\d+(?:-[A-Za-z0-9ঀ-৿]+)+(?:\s(?:[A-Za-z]\b|[A-Za-z]{2}\b(?!\s+[A-Z])))?)"), 0.92),
    ("contextual", re.compile(r"(?i)\bh\s*-?\s*(\d+(?:[/-][A-Za-z0-9]+)*[A-Za-z]?)\b"), 0.90),
    ("positional", re.compile(
        r"^\W{0,3}([A-Za-z]?[-/]?\d+[A-Za-z]?(?:[/-][A-Za-z0-9ঀ-৿]+)*)(?=[\s,(])"), 0.85),
    # standalone number opening a later comma part, before a capitalized
    # location word — the ':465-468' capitalized-word exception as a tier
    ("positional", re.compile(r",\s*(\d{1,4}[A-Za-z]?)\s+(?=[A-Z])"), 0.82),
    # number alone in a comma slot right before a capitalized part
    # ("..., 372, Free School Street")
    ("positional", re.compile(r",\s*(\d{1,3})\s*(?=,\s*[A-Zঀ-৿])"), 0.80),
    # "218 by 8" — colloquial n-by-m holding number; the first number is
    # the house
    ("by", re.compile(r"(?i)\b(\d{1,4})\s+by\s+\d{1,4}\b"), 0.80),
    # "U No 19" (normalized from "U#19"): unit letter + number concat
    ("letter_no", re.compile(
        r"(?i)^\W{0,3}([A-Za-z])\s*no\s*[-.]?\s*(\d{1,4}(?:/[A-Za-z0-9]+)*)\b"), 0.85),
]

_ROAD_TIERS = [
    ("keyword_no", re.compile(
        r"(?i)\b(?:road|rd|lane|ln|avenue|ave|sarani|sarak|লেইন)"
        r"(?:\s*(?:no\.?|number|#|:|নম্বর|নং)){0,2}\s*[-–]?\s*"
        r"([A-Za-z]?\d+(?:st|nd|rd|th)?(?:/[A-Za-z0-9ঀ-৿]+)*[A-Za-z]?)\b"), 0.95),
    # "Line 16" keeps its keyword: the labeled corpus treats Line as part
    # of the road name ("Block #C, Line #16" → road "Line 16"), unlike
    # Road/Lane which are stripped
    ("keyword_no", re.compile(
        r"(?i)\b(line\s*(?:no\.?|number|#|:)?\s*[-–]?\s*\d+[A-Za-z]?)\b"), 0.95),
    # "6 No. Road" / "6 Road" — number BEFORE the keyword
    ("num_first", re.compile(
        r"(?i)\b(\d+(?:st|nd|rd|th|[ঀ-৿]{1,2})?[A-Za-z]?)\s*(?:no\.?\s*)?(?:road|goli|lane|avenue)\b"), 0.88),
    ("named", re.compile(
        r"(?i)(?<![\w-])((?:[A-Za-zঀ-৿][\wঀ-৿.''&-]*\s+){1,5}?"
        r"(?:road|rd|lane|avenue|street|goli|sarani|sarak|রোড|লেন|গলি))(?=[\s,.()]|$)"), 0.85),
    # "Yugichad Mosque Line": Line as a road suffix only after
    # capitalized proper-noun words (case-sensitive) — lowercase "line"
    # is ordinary prose ("assembly line") and must not become a road
    ("named", re.compile(
        r"(?<![\w-])((?:[A-Z][\w.''&-]*\s+){1,4}Line)(?=[\s,.()]|$)"), 0.85),
    ("feet", re.compile(r"(?i)\b(\d+\s*(?:feet|ft|ফিট|ফুট))(?![\w])"), 0.92),
    ("compact", re.compile(
        r"(?i)\br\s*(?:no\.?|[-])\s*(\d+(?:/[A-Za-z0-9]+)*[A-Za-z]?)\b"), 0.85),
]

from ..data.gazetteer import DISTRICT_DIVISION as _DD

_DISTRICT_WORDS = (
    "dhaka chittagong chattogram sylhet rajshahi khulna barisal barishal rangpur "
    "mymensingh comilla cumilla cox bazar sadar gazipur narayanganj district division"
).split() + [d.lower() for d, _ in _DD]

_ROAD_NAME_STOP = re.compile(
    r"(?i)\b(?:house|holding|building|bldg|plot|basa|basha|flat|floor|block|sector|"
    r"no|number|side|behind|beside|near|opposite|front)\b")

_DIRECTIONAL = re.compile(
    r"(?i)^(?:north|south|east|west|new|old|purbo|poschim|uttor|dokkhin|middle|"
    r"মধ্য|পূর্ব|পশ্চিম|উত্তর|দক্ষিণ)\s+")

_AREA_EXCLUDE = re.compile(
    r"(?i)\b(?:house|holding|building|bldg|plot|basa|basha|flat|floor|lift|block|"
    r"sector|road|rd|lane|avenue|ave|street|goli|tower|complex|market|hospital|"
    r"school|college|university|bank|hotel|restaurant|store|center|centre|"
    r"mosque|masjid|mandir|near|beside|behind|opposite|front|thana|post|"
    r"ডাকঘর|থানা|রোড|বাড়ি|ব্লক)\b|\d")


class Cand(NamedTuple):
    value: str
    conf: float
    method: str
    start: int
    end: int


# --- guards (house_number_processor.py:398-610 semantics) ------------------

def _is_postal_like(value: str, text: str, start: int, end: int) -> bool:
    """STRICT postal rejection for 4-digit candidates (``:449-534``)."""
    if not re.fullmatch(r"\d{4}", value):
        return False
    before = text[:start].lower()
    # exception: explicit house/holding keyword right before
    if re.search(r"(?:holding|building|house|home|plot|basa|basha)\s*(?:no\.?|number|#)?\s*[-:]?\s*$",
                 before[-30:]):
        return False
    remaining = text[end:].strip()
    # exception: standalone number before a capitalized location word
    if re.match(r"^[A-Z][a-z]+", remaining):
        return False
    if any(loc in before[-30:] for loc in _DISTRICT_WORDS):
        return True
    if end > len(text) * 0.8:
        return True
    if remaining and len(remaining) < 10:
        return True
    return False


def _is_road_goli(text: str, start: int, end: int) -> bool:
    """'2 No. Road'-style ward/road numbers are not houses (``:403-446``)."""
    after = text[end:].strip().lower()
    # reversed house keyword ("78 No House") is a holding number
    if re.match(r"^no\.?\s+(?:house|basa|basha|bari|building)\b", after):
        return False
    if re.match(r"^no\.?\s+\w+", after):
        if any(k in after[:50] for k in
               ("road", "goli", "ward", "gate", "checkpost", "rail", "kotowali",
                "sector", "thana", "upazila")):
            before = text[:start].lower()
            if not any(w in before[-20:] for w in ("basa", "basha", "house")):
                return True
    return False


def _banglish_in_word(text: str, start: int) -> bool:
    """'Nikunja 2' must not extract 'ja 2' (``:536-575``): reject a
    Banglish candidate whose letters continue a preceding word."""
    return start > 0 and (text[start - 1].isalpha())


def _flat_context(value: str, text: str, start: int) -> bool:
    """A letter+digit value right after 'flat' is the flat number
    (priority fn ``:1026-1040``); rejected for house entirely."""
    before = text[:start].lower()
    if "flat" in before[-25:] or "apartment" in before[-25:]:
        return bool(re.fullmatch(r"[A-Za-z]\d+|\d{1,2}[/-][A-Za-z]|\d+-[A-Za-z]", value))
    return False


def _house_candidates(text: str) -> list[Cand]:
    out = []
    for method, pat, conf in _HOUSE_TIERS:
        for m in pat.finditer(text):
            v = m.group(1).strip()
            if not v:
                continue
            # 'H-12' / 'h/12': the h is the house KEYWORD abbreviation,
            # not part of the value — the reference's contextual tier
            # captures only the number
            v = re.sub(r"(?i)^h[-/ ]+(?=\d)", "", v)
            if method == "letter_no":
                v = m.group(1).upper() + m.group(2)      # "U No 19" → U19
                # span covers letter THROUGH digits: with end at the
                # letter, _is_road_goli reads the candidate's own
                # "No 19" as a '2 No. Road' ward context and rejects it
                out.append(Cand(v, conf, method, m.start(1), m.end(2)))
                continue
            elif method == "positional" and m.start(1) == 0:
                # R-6/L-2 at the start is a road/lane compact, never a
                # house; any other leading letter + dash is a block
                # prefix dropped from the value ("B-33/1" → house 33/1)
                if re.match(r"(?i)^[rl]-\d", v):
                    continue
                v = re.sub(r"(?i)^[A-Za-z]-(?=\d)", "", v)
            out.append(Cand(v, conf, method, m.start(1), m.end(1)))
    return out


def _house_priority(c: Cand, text: str, all_cands: list[Cand]) -> float:
    """The reference's hand-tuned priority arithmetic (``:997-1104``)."""
    p = 0.0
    ctx = text[max(0, c.start - 15):c.end + 5].lower()
    before = text[:c.start].lower()
    if c.method == "explicit":
        if re.search(r"(?:house|home|hous|building|bldg|plot|holding)\s*(?:no\.?|number|#|:|-)", ctx):
            p += 3500
        elif re.search(r"(?:house|home|hous|building|bldg|plot|holding)[\s-]+", ctx):
            p += 2800
        else:
            p += 2000
    if c.method == "banglish":
        p += 3000
        if re.fullmatch(_BANGLISH_FULL + r"[\s-]*\d{4}", c.value, re.I):
            p -= 5000  # Banglish 4-digit = postal pattern
        has_early_slash = any(o.method == "slash" and o.start < len(text) * 0.3
                              for o in all_cands)
        if has_early_slash and c.start > len(text) * 0.2:
            p -= 2000
        elif c.start > len(text) * 0.6:
            p -= 500
    if re.search(r"road\s*(?:no\.?|number|#|:|-)", ctx):
        p -= 1500
        if re.search(r"(?:house|building|plot)[\s-]+", text.lower()):
            p -= 2000
    if c.method == "positional" and c.start < max(1, len(text) * 0.1) \
            and re.fullmatch(r"\d{3,4}", c.value):
        p += 2500
    if c.method == "slash" and c.start < len(text) * 0.3:
        p += 2000
    if c.method == "positional" and re.match(
            r"\s+[A-Z][\w.]*\s+(?:road|lane|avenue)\b", text[c.end:], re.I):
        p += 300      # "116 DIT Road": number fronting a named road
    if re.search(r"\d+\s*-\s*\d+", c.value):
        p += 1000
    if re.fullmatch(r"\d+[A-Za-z]", c.value):
        p -= 500
    p += c.conf * 100
    p += (1.0 - c.start / max(1, len(text))) * 100
    return p


def extract_house(text: str) -> tuple[str, float] | None:
    cands = _house_candidates(text)
    kept = [
        c for c in cands
        if not _is_postal_like(c.value, text, c.start, c.end)
        and not _is_road_goli(text, c.start, c.end)
        and not _flat_context(c.value, text, c.start)
        and not (c.method == "banglish" and _banglish_in_word(text, c.start))
        # positional/slash candidates must not sit inside a road context
        and not (c.method in ("slash", "positional")
                 and re.search(r"(?:road|lane|avenue|sector|block|flat|floor|lift)\s*"
                               r"(?:no\.?|number|#|:)?\s*[-–]?\s*$",
                               text[:c.start].lower()[-20:]))
        # ... nor immediately precede a road/block keyword ("6 Road") —
        # slash-form values are holding numbers even there ("5/8 Block E"
        # is house 5/8), so the guard applies to plain numbers only
        and not (c.method in ("slash", "positional") and "/" not in c.value
                 and re.match(r"\s*(?:no\.?\s*)?(?:road|lane|avenue|block|sector|goli|feet|ft)\b",
                              text[c.end:].lower()))
    ]
    if not kept:
        return None
    best = max(kept, key=lambda c: (_house_priority(c, text, kept), -c.start, c.value))
    return best.value, best.conf


def extract_road(text: str, house_value: str | None) -> tuple[str, float] | None:
    cands = []
    for method, pat, conf in _ROAD_TIERS:
        for m in pat.finditer(text):
            v = m.group(1).strip(" ,.-")
            if not v:
                continue
            if method == "named":
                name_part = re.sub(r"(?i)\s*(?:road|rd|lane|avenue|street|goli|sarani|sarak|রোড|লেন|গলি)$", "", v)
                # trim leading stop words ("6no Kotowali Road" → "Kotowali")
                words = name_part.split()
                while words and _ROAD_NAME_STOP.fullmatch(words[0].strip(".,")):
                    words = words[1:]
                # a leading orphan letter after a house slash ("24/A
                # Tiposultan Road") belongs to the house number
                if (len(words) > 1 and len(words[0]) == 1
                        and m.start(1) > 0 and text[m.start(1) - 1] == "/"):
                    words = words[1:]
                # a sentence boundary inside the span ("Staff Quarter.
                # Virgin Bakery Lane") cuts the name; dotted
                # abbreviations (K.M, F.M., B.T) are not boundaries
                for i in range(len(words) - 1, -1, -1):
                    w = words[i]
                    if w.endswith(".") and "." not in w[:-1] and len(w) > 3:
                        words = words[i + 1:]
                        break
                name_part = " ".join(words)
                if not name_part or len(name_part) < 2:
                    continue
                if all(_ROAD_NAME_STOP.fullmatch(w.strip(".,")) for w in name_part.split()):
                    continue
                kw = re.search(r"(?i)(road|rd|lane|avenue|street|goli|sarani|sarak|রোড|লেন|গলি)$", v)
                v = name_part + (" " + kw.group(1) if kw else "")
            cands.append(Cand(v, conf, method, m.start(1), m.end(1)))
    kept = [
        c for c in cands
        if not re.fullmatch(r"\d{4}", c.value)            # postal-like
        # cross-extractor: the house value vetoes a road candidate only
        # when the candidate is NOT led by an explicit road keyword —
        # the reference's span-based check keeps "Road-1" even when the
        # house is also "1" ("Road-1, House-1")
        and (house_value is None or c.value != house_value
             or c.method == "keyword_no")
        and not re.search(r"(?:sector|block|flat|floor|house)\s*(?:no\.?|#|:)?\s*[-–]?\s*$",
                          text[:c.start].lower()[-15:])
    ]
    if not kept:
        return None
    named_exists = any(c.method == "named" for c in kept)
    if named_exists:
        # a numbered candidate whose keyword is glued to a proper-name
        # road phrase ("Shekertak Road #8", "Agrabad CDA Road 1") is an
        # annex of the NAMED road — the label keeps the name; likewise
        # "N No Road/Goli" ward-style numbering ("(2 No Road)",
        # "1 No. Raja Srinath Street") loses to a real road name
        def _annexed(c: Cand) -> bool:
            if c.method == "keyword_no" and re.search(
                    r"[A-Zঀ-৿][\wঀ-৿.&'’-]*\s+(?:Road|Rd|Lane|Ln|Avenue|Ave|Street)\s*"
                    r"(?:No\.?|Number|#|:)?\s*[-–]?\s*$", text[:c.start], re.I):
                return True
            if c.method == "num_first" and re.match(
                    r"\s*no\.?\s", text[c.end:], re.I):
                return True
            return False
        kept = [c for c in kept if not _annexed(c)] or kept
    # Within the numbered class the labeled corpus ranks the keyword:
    # Lane > Avenue > Road ("Road 12, Avenue 6" → 6; "Road 1, Lane 2"
    # → 2), ties broken by LAST occurrence. Named roads prefer the
    # FIRST occurrence ("Crescent Road, Green Road" → Crescent;
    # 19:3 in the labeled corpus). A keyword-led candidate whose value
    # ties the house number survives the veto but only as a last
    # resort ("Road-1, House-1" → road 1, yet "22 No Road …, Road 1,
    # House 1" → road 22).
    prio = {"keyword_no": 3, "num_first": 3, "feet": 1, "named": 1, "compact": 1}

    def _kwrank(c: Cand) -> int:
        if c.method not in ("keyword_no", "num_first"):
            return 0
        if c.value.lower().startswith("line"):
            return 2                     # Line outranks Avenue/Road too
        m = re.search(r"(?i)\b(road|rd|lane|ln|avenue|ave|sarani|sarak)\s*"
                      r"(?:no\.?|number|#|:)?\s*[-–]?\s*$", text[:c.start])
        kw = (m.group(1).lower() if m else "")
        return {"lane": 2, "ln": 2, "avenue": 1, "ave": 1}.get(kw, 0)

    best = max(kept, key=lambda c: (
        c.value != house_value, prio[c.method], _kwrank(c),
        -c.start if prio[c.method] == 1 else c.start, c.value))
    return best.value, best.conf


def extract_area(text: str) -> tuple[str, float] | None:
    """T6 multi-factor candidate scoring (area_processor.py:729-962):
    comma-part candidates, exclusion guards, position/context bonuses,
    argmax. Emitted at the computed confidence so gazetteer-validated
    evidence still outvotes it when the vocabulary knows better."""
    # parenthetical asides ("AK Khan More (Green Gulbahar Tower)") are
    # landmarks, not part of the locality candidate
    text_np = re.sub(r"\([^)]*\)", " ", text)
    parts = [re.sub(r"\s+", " ", p).strip(" .,-–") for p in text_np.split(",")]
    n = len(parts)
    if n < 2:
        return None
    best = None
    for i, part in enumerate(parts):
        if not part or _AREA_EXCLUDE.search(part):
            continue
        words = part.split()
        if not (1 <= len(words) <= 3):
            continue
        low = part.lower()
        if any(w in low for w in _DISTRICT_WORDS):
            continue
        score = 0.20                                     # base
        if 0 < i < n - 1:
            score += 0.15                                # middle position
        if i == n - 2:
            score += 0.20                                # just before last part
        if i > 0 and any(d in parts[i - 1].lower() for d in
                         ("house", "building", "tower", "plot", "holding")):
            score += 0.10
        nxt = parts[i + 1].lower() if i + 1 < n else ""
        if any(d in nxt for d in _DISTRICT_WORDS):
            score += 0.30                                # right before city
        if _DIRECTIONAL.search(part):
            score += 0.15
        # residential-area keyword marks the part as a locality
        # (area_processor keyword factors: "Abashik", "R/A",
        # "Residential Area", "Housing")
        if re.search(r"(?i)\babashik\b|\br/?a\b|\bresidential\b|\bhousing\b", part):
            score += 0.30
        if best is None or score > best[1] or (score == best[1] and part < best[0]):
            best = (part, score)
    if best is None:
        return None
    # cap below the vocabulary hit (0.85+) AND below the fuzzy
    # gazetteer correction's effective vote (0.75 × 0.85 weight =
    # 0.6375): a known-area correction must beat the raw surface form
    # in Stage-8 voting, mirroring the reference's correction override
    return best[0], min(best[1], 0.60)


# --- Spark surface ---------------------------------------------------------

_RESULT_TYPE = ArrayType(StructType([
    StructField("component", StringType()),
    StructField("value", StringType()),
    StructField("confidence", DoubleType()),
]))


def _rows_for_text(t: str | None) -> list[tuple[str, str, float]]:
    """Per-mention extraction with D4 error isolation (the reference's
    batch loop catches per-address errors and records them instead of
    failing the batch, extractor.py:513-544): an exception becomes one
    ``_error`` evidence row — never a task failure. ``_error`` is not a
    component, so resolution/pivot ignore it; it stays queryable in the
    evidence table."""
    t = t or ""
    try:
        rows: list[tuple[str, str, float]] = []
        h = extract_house(t)
        if h:
            rows.append(("house_number", h[0], h[1]))
        r = extract_road(t, h[0] if h else None)
        if r:
            rows.append(("road", r[0], r[1]))
        a = extract_area(t)
        if a:
            rows.append(("area", a[0], a[1]))
        return rows
    except Exception as e:  # noqa: BLE001 — isolation is the point
        return [("_error", f"{type(e).__name__}: {e}"[:200], 0.0)]


def house_road_area_evidence(
    mentions: DataFrame,
    id_col: str = "mention_id",
    text_col: str = "normalized",
) -> DataFrame:
    """→ evidence long format (source='regex') for house_number, road,
    and area via the guard/priority batteries. Arrow-batched scalar
    pandas UDF over the (deduped) mention table; explode to long."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_RESULT_TYPE)
    def _extract(texts: pd.Series) -> pd.Series:
        return pd.Series([_rows_for_text(t) for t in texts])

    return (
        mentions.select(
            F.col(id_col).alias("mention_id"), _extract(F.col(text_col)).alias("ev")
        )
        .select("mention_id", F.explode("ev").alias("e"))
        .select(
            "mention_id",
            F.col("e.component").alias("component"),
            F.col("e.value").alias("value"),
            F.col("e.confidence").alias("confidence"),
            F.lit("regex").alias("source"),
        )
    )
