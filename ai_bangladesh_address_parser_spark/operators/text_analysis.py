"""Text-analysis operators for the web-corpus pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst column expressions (whole-stage codegen; zero
Python). These run in the same narrow stage as mention extraction on
the 100 TB corpus — one pass over ``text`` computes everything.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.script import _ASCII_ALPHA, _BANGLA_CLASS, _count_matches
from .dedup import tokens_expr

# Small, fixed stopword lists (public, high-frequency function words).
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "in", "on", "to", "is", "are",
    "was", "for", "with", "that", "this", "it", "as", "at", "by", "be",
]
BN_STOPWORDS = ["এবং", "ও", "এই", "যে", "করে", "থেকে", "জন্য", "সাথে", "হয়", "না"]


def _count_in(toks: Column, vocab: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.array_intersect(F.array_distinct(toks), arr))


def langid_cols(text_col: str = "text") -> dict[str, Column]:
    """Heuristic language ID: script ratio + stopword hits.

    bn if Bangla chars dominate; en if ASCII dominates AND ≥1 English
    stopword type present; und otherwise. Deterministic, order-free.
    """
    c = F.col(text_col)
    total = F.length(c)
    # same char classes as functions.script (one definition of "Bangla
    # char" / "ASCII letter" across both classifiers)
    bangla = _count_matches(c, _BANGLA_CLASS)
    ascii_alpha = _count_matches(c, _ASCII_ALPHA)
    toks = tokens_expr(c)
    en_hits = _count_in(toks, EN_STOPWORDS)
    bn_hits = _count_in(toks, BN_STOPWORDS)
    lang = (
        F.when(total == 0, F.lit("und"))
        .when((bangla > ascii_alpha) & (bangla > 0), F.lit("bn"))
        # en needs BOTH dominance and stopword support — without the
        # en_hits requirement every Latin-script gibberish page would
        # classify 'en' and 'und' would be unreachable for ASCII text
        .when((ascii_alpha > bangla) & (en_hits > 0), F.lit("en"))
        .otherwise(F.lit("und"))
    )
    return {
        "pred_lang": lang,
        "en_stopword_types": en_hits,
        "bn_stopword_types": bn_hits,
        "bangla_chars": bangla,
        "ascii_alpha_chars": ascii_alpha,
    }


def quality_cols(text_col: str = "text") -> dict[str, Column]:
    """Document quality features + composite score in [0,1].

    Features follow the standard web-corpus filters (length band,
    punctuation density, stopword ratio, mean word length band); the
    composite is a fixed linear blend — deterministic and monotone in
    each feature's "good" direction.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens_expr(c)
    n_tokens = F.size(toks)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}-]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")).otherwise(F.lit(0.0))
    stop_hits_total = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    stopword_ratio = F.when(n_tokens > 0, stop_hits_total / n_tokens.cast("double")).otherwise(F.lit(0.0))
    # sum of token lengths == length of the joined tokens — no
    # interpreted per-token aggregate lambda in a whole-corpus scan
    mean_tok_len = F.when(
        n_tokens > 0,
        F.length(F.array_join(toks, "")) / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio / F.lit(0.2), F.lit(1.0))
    punct_score = F.greatest(F.lit(1.0) - punct_ratio * 5, F.lit(0.0))
    wordlen_score = F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    quality = F.round(
        len_score * 0.3 + stop_score * 0.3 + punct_score * 0.2 + wordlen_score * 0.2, 6
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stopword_ratio, 6),
        "mean_token_len": F.round(mean_tok_len, 6),
        "quality": quality,
    }


def token_count_cols(text_col: str = "text") -> dict[str, Column]:
    """Whitespace token count + a BPE-ish subword proxy count
    (letter-runs, digits, and punctuation each count as one piece —
    the standard cheap estimator for tokenizer budgeting)."""
    c = F.col(text_col)
    ws = F.size(F.array_remove(F.split(c, r"\s+"), ""))
    bpe = F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))
    return {"ws_tokens": ws, "bpe_tokens": bpe}


def fingerprint_expr(text_col: str = "text") -> Column:
    """Order-insensitive bag-of-words document fingerprint: md5 of the
    sorted distinct token list. Pages with permuted/duplicated content
    collide; any token change breaks the collision."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens_expr(F.col(text_col)))), " "))
