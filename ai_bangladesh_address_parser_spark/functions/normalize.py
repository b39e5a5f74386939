"""Stage-2 canonical normalization as pure Catalyst column expressions.

Reproduces, byte-identically, the reference's normalization chain
(``src/core/stages/normalizer.py:44-75``; tables ``:13-40``) with zero
Python in the hot path — every step is a JVM-side, codegen'd string
expression, so the whole stage fuses into one WholeStageCodegen span
and costs one pass over the text column.

Dialect notes (verified against Python ``re`` in tests):
  * ``(?U)`` makes Java's ``\\s``/``\\b``/``\\w`` Unicode-aware,
    matching Python 3 ``str`` regex semantics (Bangla letters are word
    chars, NBSP is whitespace).
  * Bangla numerals are single code points → one ``translate`` call.
  * Literal multi-char replacements use ``replace`` (no regex engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..reference_semantics import BN_KEYWORDS, BN_NUMERALS, BN_PLACES, CORRECTIONS

_BN_DIGITS = "".join(bn for bn, _ in BN_NUMERALS)
_EN_DIGITS = "".join(en for _, en in BN_NUMERALS)


def normalize_expr(col: Column | str) -> Column:
    """Return the normalized form of an address/mention column.

    Replay order is load-bearing and matches the reference exactly:
    numerals → places → keywords → strip quotes → spelling corrections
    (word-bounded, case-insensitive) → ``#``→`` No `` → ``:``→`` `` →
    whitespace collapse + trim → comma-space canonicalization.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _BN_DIGITS, _EN_DIGITS)
    for bn, en in BN_PLACES:
        c = F.replace(c, F.lit(bn), F.lit(en))
    for bn, en in BN_KEYWORDS:
        c = F.replace(c, F.lit(bn), F.lit(en))
    c = F.replace(c, F.lit('"'), F.lit(""))
    c = F.replace(c, F.lit("'"), F.lit(""))
    for wrong, right in CORRECTIONS:
        c = F.regexp_replace(c, r"(?iU)\b" + wrong + r"\b", right)
    c = F.replace(c, F.lit("#"), F.lit(" No "))
    c = F.replace(c, F.lit(":"), F.lit(" "))
    c = F.trim(F.regexp_replace(c, r"(?U)\s+", " "))
    c = F.regexp_replace(c, r"(?U)\s*,\s*", ", ")
    return c


def norm_key_expr(col: Column | str) -> Column:
    """Cache/dedup key: the reference keys its LRU on
    ``address.strip().lower()`` (``src/core/extractor.py:129``); the
    Spark analogue is dedup-before-compute on this key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))
