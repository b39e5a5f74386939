"""Stage-1 script & language detection as column expressions.

Reference: ``src/core/stages/script_detector.py:10-39``. Per-char
counting becomes two codegen'd ``regexp_count``-style expressions over
the Bangla block (U+0980–U+09FF) and ASCII letters; the enum is a
``when`` chain. No UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BANGLA_CLASS = "[ঀ-৿]"
_ASCII_ALPHA = "[A-Za-z]"


def _count_matches(c: Column, char_class: str) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, char_class, ""))


def script_cols(col: Column | str) -> dict[str, Column]:
    """Return {bangla_ratio, english_ratio, primary_script, is_mixed}.

    Ratios are over total string length (reference divides by
    ``len(address)``), doubles; enum values: bn/en/mixed/neutral.
    """
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    br = F.when(total > 0, _count_matches(c, _BANGLA_CLASS) / total).otherwise(F.lit(0.0))
    er = F.when(total > 0, _count_matches(c, _ASCII_ALPHA) / total).otherwise(F.lit(0.0))
    primary = (
        F.when(c.isNull() | (total == 0), F.lit("neutral"))
        .when((br > 0.3) & (er > 0.3), F.lit("mixed"))
        .when(br > er, F.lit("bn"))
        .otherwise(F.lit("en"))
    )
    return {
        "bangla_ratio": br,
        "english_ratio": er,
        "primary_script": primary,
        "is_mixed": primary == F.lit("mixed"),
    }
