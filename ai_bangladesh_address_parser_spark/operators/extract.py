"""Stage 3-7: component evidence extraction.

Re-expresses the reference's regex/gazetteer extraction battery
(SURVEY.md §2.2 T3-T9, §2.3 J1-J5) as Catalyst expressions plus
broadcast equi-joins. The output IR is the **evidence long format**:

    (mention_id, component, value, confidence, source)

mirroring the reference's ``evidence_map`` (src/core/extractor.py:155-283)
— one row per piece of evidence, resolved later by
``operators.resolve.resolve_evidence`` (Stage 8).

Scale notes:
  * All regex tiers are computed in ONE projection over the mention
    table (single pass, whole-stage codegen), then exploded to long
    format — no per-tier rescans.
  * Vocabulary matches (district/area) are broadcast hash joins on
    exploded tokens/bigrams — the cluster-scale equivalent of the
    reference's trie lookups ("Technique #26").
  * Nothing here shuffles except the final union's downstream groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..data import gazetteer as gz

EVIDENCE_SCHEMA = "mention_id string, component string, value string, confidence double, source string"

# --- regex tiers -----------------------------------------------------------
# (component, pattern, group, confidence, source); patterns model the
# reference tiers: fsm_parser.py:26-58 (fsm), house_number_processor.py
# :96-370, road_processor.py:141-296, postal_code_processor.py:122-202,
# flat/floor/block processors (SURVEY.md §2.2). Java dialect with (?iU)
# for Python-re parity (verified in tests).
_FSM_TIERS: list[tuple[str, str, int, float]] = [
    ("house_number", r"(?iU)House\s+No\s+(\d+[A-Za-z]?)", 1, 0.75),
    ("house_number", r"(?iU)House\s+(\d+)", 1, 0.75),
    ("house_number", r"(?iU)H\s+(\d+)", 1, 0.75),
    ("road", r"(?iU)Road\s+No\s+(\d+[A-Za-z]?)", 1, 0.75),
    ("road", r"(?iU)Road\s+(\d+)", 1, 0.75),
    ("road", r"(?iU)R\s+(\d+)", 1, 0.75),
    ("flat_number", r"(?iU)Flat\s+(\w+)", 1, 0.75),
    ("floor_number", r"(?iU)Floor\s+(\d+)", 1, 0.75),
    ("block_number", r"(?U)Block\s+([A-Z0-9]+)", 1, 0.75),
]

_REGEX_TIERS: list[tuple[str, str, int, float]] = [
    # postal: explicit > city-dash > (standalone handled separately)
    ("postal_code", r"(?iU)(?:post\s*code|postal\s*code|p\.?\s?o\.?|zip|pin)\s*[:\-]?\s*(\d{4})\b", 1, 0.98),
    ("postal_code", r"(?iU)\b[A-Za-z]+\s?-\s?(\d{4})\b", 1, 0.95),
    # house: explicit keyword > leading slash-form > compact h-form
    ("house_number", r"(?iU)\b(?:house|holding|building|bldg|plot)\s*(?:name)?\s*(?:no|number)?\s*[.\-]?\s*(\d+(?:/[A-Za-z0-9]+)?(?:-?[A-Za-z])?)\b", 1, 0.96),
    ("house_number", r"(?U)^(\d+(?:/[A-Za-z0-9]+)+)\b", 1, 0.92),
    ("house_number", r"(?iU)\bh[\- ]?(\d+(?:/[A-Za-z0-9]+)?)\b", 1, 0.90),
    # road: keyword-first > number-before-keyword > named road
    ("road", r"(?iU)\b(?:road|rd|lane|ln|avenue|ave)\s*(?:no|number)?\s*[.\-]?\s*(\d+(?:/[A-Za-z0-9]+)?[A-Za-z]?)\b", 1, 0.95),
    ("road", r"(?iU)\b(\d+(?:/[A-Za-z0-9]+)?[A-Za-z]?)\s*(?:no\.?\s*)?(?:road|lane|avenue)\b", 1, 0.88),
    ("road", r"(?iU)\br[\- ]?(\d+[A-Za-z]?)\b", 1, 0.85),
    # flat / floor / block
    ("flat_number", r"(?iU)\b(?:flat|apt|apartment|suite|unit)\s*(?:no|number)?\s*[.\-]?\s*([A-Za-z0-9]+(?:-[A-Za-z0-9]+)?)\b", 1, 0.90),
    ("floor_number", r"(?iU)\b(\d+(?:st|nd|rd|th)?[A-Za-z]?)\s*(?:floor|fl)\b", 1, 0.88),
    ("floor_number", r"(?iU)\b(?:floor|level|lift)\s*[.\-]?\s*([A-Za-z0-9]+)\b", 1, 0.85),
    ("block_number", r"(?iU)\b(?:block|blk|sector)\s*(?:no|number)?\s*[.\-]?\s*([A-Za-z0-9]+)\b", 1, 0.90),
    ("block_number", r"(?iU)\b(\d+|[A-Za-z])\s*(?:block|blk)\b", 1, 0.88),
]


def _tier_structs(text: Column, tiers: list[tuple[str, str, int, float]], source: str) -> list[Column]:
    """One struct column per tier; null when the tier doesn't fire.

    Within a component, earlier tiers win (reference first-match
    semantics) — enforced by only keeping the first firing tier.
    """
    out: list[Column] = []
    seen: dict[str, Column] = {}  # component -> "already matched" predicate
    for comp, pat, grp, conf in tiers:
        val = F.regexp_extract(text, pat, grp)
        fired = val != ""
        prev = seen.get(comp, F.lit(False))
        keep = fired & ~prev
        seen[comp] = prev | fired
        out.append(
            F.when(
                keep,
                F.struct(
                    F.lit(comp).alias("component"),
                    val.alias("value"),
                    F.lit(conf).alias("confidence"),
                    F.lit(source).alias("source"),
                ),
            )
        )
    return out


def _positional_postal(text: Column, source: str, conf: float) -> Column:
    """Standalone 4-digit postal, only if the match ends past 50% of the
    string (fsm_parser.py:53-58 positional rule; postal_code_processor.py
    position tiers)."""
    val = F.regexp_extract(text, r"(?U)\b(\d{4})\b", 1)
    # end position of first match: locate + 4 - 1 (1-based instr)
    pos_end = F.instr(text, val) + F.lit(3)
    # try_cast: "" → null (a plain cast throws under ANSI mode, the
    # Spark 4 default — boolean AND does not short-circuit in codegen)
    ok = (val != "") & (pos_end > F.length(text) * 0.5) & (val.try_cast("int") >= 1000)
    return F.when(
        ok,
        F.struct(
            F.lit("postal_code").alias("component"),
            val.alias("value"),
            F.lit(conf).alias("confidence"),
            F.lit(source).alias("source"),
        ),
    )


def regex_evidence(mentions: DataFrame, id_col: str = "mention_id", text_col: str = "normalized") -> DataFrame:
    """All expression-computable evidence (fsm + regex tiers) in ONE pass.

    Returns the evidence long format. Single projection → explode; no
    joins, no shuffle.
    """
    text = F.col(text_col)
    structs = (
        _tier_structs(text, _FSM_TIERS, "fsm")
        + [_positional_postal(text, "fsm", 0.75)]
        + _tier_structs(text, _REGEX_TIERS, "regex")
        + [_positional_postal(text, "regex", 0.80)]
    )
    arr = F.array_compact(F.array(*structs))
    ev = (
        mentions.select(F.col(id_col).alias("mention_id"), F.explode(arr).alias("e"))
        .select(
            "mention_id",
            F.col("e.component").alias("component"),
            F.col("e.value").alias("value"),
            F.col("e.confidence").alias("confidence"),
            F.col("e.source").alias("source"),
        )
    )
    return ev


def _token_candidates(mentions: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode comma-parts and word n-grams (1-2) as lowercase lookup keys,
    with positional metadata for confidence rules."""
    parts = F.split(F.col(text_col), r",\s*")
    df = mentions.select(
        F.col(id_col).alias("mention_id"),
        F.posexplode(parts).alias("part_idx", "part"),
        F.size(parts).alias("n_parts"),
    )
    # strip trailing "-1234" postal glue and danglers like Bangla danda
    clean = F.lower(F.trim(F.regexp_replace(F.col("part"), r"(?U)\s?-\s?\d{4}|[।.]", "")))
    toks = F.split(clean, r"(?U)\s+")
    df = df.select(
        "mention_id", "part_idx", "n_parts", clean.alias("part_clean"), toks.alias("toks")
    )
    unigrams = df.select(
        "mention_id", "part_idx", "n_parts",
        F.explode(F.array_distinct(F.concat(
            F.array(F.col("part_clean")),
            F.col("toks"),
            F.when(F.size("toks") >= 2, F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )).otherwise(F.array()),
        ))).alias("key"),
    ).filter(F.col("key") != "")
    return unigrams


def vocab_evidence(mentions: DataFrame, id_col: str = "mention_id", text_col: str = "normalized") -> DataFrame:
    """District + area evidence via broadcast joins on exploded tokens.

    Reference behavior modeled: district comma-part equality vs the
    64-district variant vocabulary, end-of-address → higher confidence
    (district_processor.py:695-1639); area vocabulary hits
    (area_processor.py:93-133); division direct mentions.
    """
    spark = mentions.sparkSession
    toks = _token_candidates(mentions, id_col, text_col)

    dv = F.broadcast(gz.district_variants_df(spark))
    dhits = toks.join(dv, toks.key == dv.variant, "inner")
    # last comma-part → 0.95 (end-of-address rule), else 0.90
    dist_ev = (
        dhits.groupBy("mention_id", "district")
        .agg(F.max(F.col("part_idx") == F.col("n_parts") - 1).alias("at_end"))
        .select(
            "mention_id",
            F.lit("district").alias("component"),
            F.col("district").alias("value"),
            F.when(F.col("at_end"), 0.95).otherwise(0.90).alias("confidence"),
            F.lit("regex").alias("source"),
        )
    )

    av = F.broadcast(gz.area_variants_df(spark))
    ahits = toks.join(av, toks.key == av.variant, "inner")
    # middle-of-address position is the classic area slot → small bonus
    area_ev = (
        ahits.groupBy("mention_id", "area")
        .agg(F.max((F.col("part_idx") > 0) & (F.col("part_idx") < F.col("n_parts") - 1)).alias("mid"))
        .select(
            "mention_id",
            F.lit("area").alias("component"),
            F.col("area").alias("value"),
            F.when(F.col("mid"), 0.88).otherwise(0.85).alias("confidence"),
            F.lit("regex").alias("source"),
        )
    )

    divs = F.broadcast(
        gz.district_division_df(spark).select(F.lower("division").alias("variant"), "division").distinct()
    )
    div_ev = (
        toks.join(divs, toks.key == divs.variant, "inner")
        .groupBy("mention_id", "division")
        .agg(F.count(F.lit(1)))
        .select(
            "mention_id",
            F.lit("division").alias("component"),
            F.col("division").alias("value"),
            F.lit(0.95).alias("confidence"),
            F.lit("regex").alias("source"),
        )
    )
    return dist_ev.unionByName(area_ev).unionByName(div_ev)


def gazetteer_evidence(evidence: DataFrame) -> DataFrame:
    """Stage 6/7 enrichment (J1/J3/J4): join first-pass evidence against
    the gazetteer dims and emit inferred/validated evidence.

    Models gazetteer.py:379-541: area hit → area validated 0.98, fill
    district 0.95, fill division 0.95, predict postal (single known code
    → 0.98); postal in valid list → 0.99; district → division 0.95.
    """
    spark = evidence.sparkSession
    areas = F.broadcast(gz.areas_df(spark))
    dd = F.broadcast(gz.district_division_df(spark))
    postals = F.broadcast(gz.postal_codes_df(spark))

    # one row per mention; fanned out to six enrichment branches below —
    # persist so the evidence aggregation runs once, not six times (the
    # cluster-scale analogue materializes this at an Iceberg stage
    # boundary, see plans.pipeline.StageStore)
    first_ev = (
        evidence.groupBy("mention_id")
        .pivot("component", ["area", "district", "postal_code"])
        .agg(F.max_by("value", F.struct("confidence", "value")))
        .persist()
    )

    a = first_ev.join(areas, first_ev.area == areas.area, "inner")
    area_validated = a.select(
        "mention_id", F.lit("area").alias("component"), first_ev.area.alias("value"),
        F.lit(0.98).alias("confidence"), F.lit("gazetteer_validated").alias("source"),
    )
    district_filled = a.select(
        "mention_id", F.lit("district").alias("component"), areas.district.alias("value"),
        F.when(first_ev.district.isNull(), 0.95)
         .when(first_ev.district == areas.district, 0.95)
         .otherwise(0.90).alias("confidence"),
        F.when(first_ev.district.isNull() | (first_ev.district == areas.district),
               F.lit("gazetteer_validated"))
         .otherwise(F.lit("gazetteer_corrected")).alias("source"),
    )
    postal_pred = a.filter(first_ev.postal_code.isNull()).select(
        "mention_id", F.lit("postal_code").alias("component"),
        areas.postal_code.alias("value"),
        F.lit(0.98).alias("confidence"),  # single known code per area → dominance 0.98
        F.lit("gazetteer_validated").alias("source"),
    )
    postal_validated = (
        first_ev.join(postals, first_ev.postal_code == postals.code, "inner")
        .select(
            "mention_id", F.lit("postal_code").alias("component"),
            F.col("code").alias("value"), F.lit(0.99).alias("confidence"),
            F.lit("gazetteer_validated").alias("source"),
        )
    )
    division_from_district = (
        first_ev.filter(F.col("district").isNotNull())
        .join(dd, first_ev.district == dd.district, "inner")
        .select(
            "mention_id", F.lit("division").alias("component"),
            F.col("division").alias("value"), F.lit(0.95).alias("confidence"),
            F.lit("inferred_from_district").alias("source"),
        )
    )
    # area hit also implies a division (via the area's district):
    # reference fills division whenever the gazetteer resolves a district
    # (gazetteer.py:418-439)
    division_from_area = (
        a.join(dd, areas.district == dd.district, "inner")
        .select(
            "mention_id", F.lit("division").alias("component"),
            dd.division.alias("value"), F.lit(0.95).alias("confidence"),
            F.lit("inferred_from_area").alias("source"),
        )
    )
    return (
        area_validated.unionByName(district_filled)
        .unionByName(postal_pred)
        .unionByName(postal_validated)
        .unionByName(division_from_district)
        .unionByName(division_from_area)
    )


def fuzzy_area_evidence(
    mentions: DataFrame,
    evidence: DataFrame,
    id_col: str = "mention_id",
    text_col: str = "normalized",
    min_charset_jaccard: float = 0.7,
) -> DataFrame:
    """J2: area back-extraction for mentions with NO area evidence.

    Reference semantics (gazetteer.py:191-377): fuzzy candidate = token
    whose 4-char prefix matches an area's 4-char prefix (3 chars for
    short names) AND whose character-set Jaccard vs the area name is
    ≥ 0.7; confidence 0.75. Spark shape: anti-join to the no-area
    subset → token explode → broadcast equi-join on the prefix key
    (the fuzzy family collapses to a hash join on a coarse key + a
    cheap expression filter — no pairwise scan)."""
    has_area = evidence.filter(F.col("component") == "area").select("mention_id").distinct()
    no_area = mentions.select(F.col(id_col).alias("mention_id"), F.col(text_col)).join(
        has_area, "mention_id", "left_anti"
    )
    toks = _token_candidates(no_area, "mention_id", text_col).select(
        "mention_id", F.col("key")
    ).filter(F.length("key") >= 4)

    spark = mentions.sparkSession
    areas = gz.areas_df(spark).select(
        F.lower("area").alias("area_lc"), "area"
    ).withColumn("pfx", F.substring("area_lc", 1, 4))
    cand = toks.withColumn("pfx", F.substring("key", 1, 4)).join(
        F.broadcast(areas), "pfx"
    ).filter(F.col("key") != F.col("area_lc"))  # exact hits belong to vocab_evidence

    chars = lambda c: F.array_distinct(F.filter(F.split(c, ""), lambda x: x != ""))  # noqa: E731
    jac = F.size(F.array_intersect(chars(F.col("key")), chars(F.col("area_lc")))) / \
        F.size(F.array_union(chars(F.col("key")), chars(F.col("area_lc")))).cast("double")
    return (
        cand.filter(jac >= min_charset_jaccard)
        .groupBy("mention_id", "area")
        .agg(F.count(F.lit(1)))
        .select(
            "mention_id",
            F.lit("area").alias("component"),
            F.col("area").alias("value"),
            F.lit(0.75).alias("confidence"),
            F.lit("gazetteer_corrected").alias("source"),
        )
    )


def predict_postal(wide: DataFrame, id_col: str = "mention_id") -> DataFrame:
    """J4: postal-code prediction cascade for rows missing a postal —
    priority coalesce over left broadcast joins, highest-priority
    source wins (bangladesh_geo_offline.py:221-338 semantics, folded to
    the dims this engine ships: area exact 0.95 → district min-code
    0.60). Returns (mention_id, predicted_postal, prediction_confidence,
    prediction_source); rows with no prediction are absent."""
    spark = wide.sparkSession
    areas = F.broadcast(gz.areas_df(spark).select(
        F.col("area").alias("a_area"), F.col("postal_code").alias("area_postal")
    ))
    district_min = F.broadcast(
        gz.postal_codes_df(spark)
        .groupBy("district")
        .agg(F.min("code").alias("district_postal"))
        .select(F.col("district").alias("d_district"), "district_postal")
    )
    base = wide.select(F.col(id_col).alias("mention_id"), "postal_code", "area", "district")
    missing = base.filter(F.col("postal_code").isNull() | (F.col("postal_code") == ""))
    j = (
        missing.join(areas, missing.area == areas.a_area, "left")
        .join(district_min, missing.district == district_min.d_district, "left")
    )
    return j.select(
        "mention_id",
        F.coalesce(F.col("area_postal"), F.col("district_postal")).alias("predicted_postal"),
        F.when(F.col("area_postal").isNotNull(), 0.95)
         .when(F.col("district_postal").isNotNull(), 0.60).alias("prediction_confidence"),
        F.when(F.col("area_postal").isNotNull(), F.lit("area_exact"))
         .when(F.col("district_postal").isNotNull(), F.lit("district_min_code")).alias("prediction_source"),
    ).filter(F.col("predicted_postal").isNotNull())


def consistency_conflicts(wide: DataFrame, id_col: str = "mention_id") -> DataFrame:
    """J3: cross-component consistency checks over the resolved wide
    table — postal↔district via the postal dim, district↔division via
    the admin dim; one row per detected conflict with the suggested
    correction (geographic_validator.py:37-169 semantics)."""
    spark = wide.sparkSession
    postals = F.broadcast(gz.postal_codes_df(spark).select(
        F.col("code"), F.col("district").alias("postal_district")
    ))
    dd = F.broadcast(gz.district_division_df(spark).select(
        F.col("district").alias("dd_district"), F.col("division").alias("dd_division")
    ))
    base = wide.select(
        F.col(id_col).alias("mention_id"), "postal_code", "district", "division"
    )
    postal_conf = (
        base.join(postals, base.postal_code == postals.code)
        .filter((F.col("district") != "") & (F.col("district") != F.col("postal_district")))
        .select(
            "mention_id",
            F.lit("postal_district_mismatch").alias("conflict_type"),
            F.col("district").alias("actual"),
            F.col("postal_district").alias("expected"),
        )
    )
    div_conf = (
        base.join(dd, base.district == dd.dd_district)
        .filter((F.col("division") != "") & (F.col("division") != F.col("dd_division")))
        .select(
            "mention_id",
            F.lit("district_division_mismatch").alias("conflict_type"),
            F.col("division").alias("actual"),
            F.col("dd_division").alias("expected"),
        )
    )
    return postal_conf.unionByName(div_conf)


def extract_evidence(
    mentions: DataFrame,
    id_col: str = "mention_id",
    text_col: str = "normalized",
    materialize: bool = True,
) -> DataFrame:
    """Full stage 3-7 evidence generation. Input must already carry the
    normalized text column (see functions.normalize.normalize_expr).

    ``materialize`` persists the first-pass evidence before the
    gazetteer enrichment fans out over it (6 broadcast-join branches) —
    without it the regex battery is re-evaluated per branch and the
    logical plan grows combinatorially."""
    base = regex_evidence(mentions, id_col, text_col).unionByName(
        vocab_evidence(mentions, id_col, text_col)
    )
    if materialize:
        base = base.persist()
    fuzzy = fuzzy_area_evidence(mentions, base, id_col, text_col)
    first_pass = base.unionByName(fuzzy)
    if materialize:
        first_pass = first_pass.persist()
    return first_pass.unionByName(gazetteer_evidence(first_pass))
