"""Country extraction as a pure Catalyst expression.

Reference semantics (``src/regex/district_processor.py:177-212``): the
district processor emits a ``country`` + ``country_confidence`` pair on
every result, OUTSIDE the conflict resolver and the overall-confidence
mean (country never enters the components dict —
``production_address_extractor.py:1292-1304`` carries it as separate
``City`` fields). The cascade, first (country, variation) in table
order to match wins:

  * address ends with the variation (or variation + '.')  -> 1.00
  * variation appears in the last comma-separated part    -> 0.98
  * variation appears anywhere (word-bounded)             -> 0.90
  * no variation matches at all                           -> ("Bangladesh", 0.95)

P1 pairwise compare gives country weight 0 (it is absent from
``reference_semantics.PAIR_WEIGHTS``) — every reference address is in
Bangladesh, so the component carries no discriminating signal for
linkage; it exists for output parity only.

The whole cascade compiles to one codegen'd when-chain of JVM ``rlike``
/ ``endswith`` / ``contains`` predicates — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (canonical country, variations) in the reference's dict order —
# iteration order is load-bearing: "burma pakistan" resolves to
# Pakistan because Pakistan's row is checked first.
COUNTRY_PATTERNS: list[tuple[str, list[str]]] = [
    ("Bangladesh", ["bangladesh", "bd", "b.d.", "b.d", "bdesh", "বাংলাদেশ"]),
    ("India", ["india", "ind", "ভারত"]),
    ("Pakistan", ["pakistan", "pak", "পাকিস্তান"]),
    ("Myanmar", ["myanmar", "burma", "মিয়ানমার"]),
    ("Nepal", ["nepal", "নেপাল"]),
    ("Bhutan", ["bhutan", "ভুটান"]),
    ("Sri Lanka", ["sri lanka", "srilanka", "ceylon", "শ্রীলঙ্কা"]),
]


def country_expr(col: Column | str) -> Column:
    """text column → struct(country string, country_confidence double).

    ``(?U)`` makes Java ``\\b`` Unicode-aware (Bangla letters are word
    chars), matching the reference's Python 3 ``re`` semantics; the
    variation itself is quoted literally (``\\Q…\\E``), mirroring the
    reference's ``re.escape``. Note the ``b.d.`` variation is inert in
    BOTH engines: ``\\b`` after a final '.' demands a following word
    char, so "dhaka b.d." matches via the ``b.d`` entry instead at the
    same confidence (``endswith(v + '.')`` rung) — the dead table row is
    kept only so the table is the reference's, byte for byte
    (district_processor.py:186).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    last_part = F.element_at(F.split(c, ","), -1)

    out = F.struct(
        F.lit("Bangladesh").alias("country"),
        F.lit(0.95).alias("country_confidence"),
    )
    # build the when-chain from the LAST table entry backwards so the
    # first-listed (country, variation) wins, like the reference's
    # nested for-loop with early return
    for country, variations in reversed(COUNTRY_PATTERNS):
        for v in reversed(variations):
            matched = c.rlike(r"(?U)\b\Q" + v + r"\E\b")
            conf = (
                F.when(c.endswith(v) | c.endswith(v + "."), F.lit(1.00))
                .when(last_part.contains(v), F.lit(0.98))
                .otherwise(F.lit(0.90))
            )
            out = F.when(
                matched,
                F.struct(F.lit(country).alias("country"),
                         conf.alias("country_confidence")),
            ).otherwise(out)
    return out


def with_country(df, text_col: str = "normalized"):
    """Attach ``country`` / ``country_confidence`` columns to a mention
    frame (LinkagePlan wide output, eval frames)."""
    s = country_expr(text_col)
    return (
        df.withColumn("_country_s", s)
        .withColumn("country", F.col("_country_s.country"))
        .withColumn("country_confidence", F.col("_country_s.country_confidence"))
        .drop("_country_s")
    )
