"""Text-analysis operators for the web-corpus pipeline: language ID,
quality scoring, token counting, document fingerprinting, and
repetition/boilerplate signals (Gopher-style repetition filters).

The per-document signals are pure Catalyst column expressions
(whole-stage codegen; zero Python) and run in the same narrow stage as
mention extraction on the 100 TB corpus — one pass over ``text``
computes everything. The two corpus-level operators (``top_ngram``,
``repeated_paragraphs``) are explode→partial-agg plans: one shuffle
each, map-side combined, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.script import _ASCII_ALPHA, _BANGLA_CLASS, _count_matches
from .dedup import ngrams_expr, shingles_expr, tokens_expr

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


# --- repetition / boilerplate (Gopher-style filters) ----------------------

# Split on newlines, absorbing surrounding whitespace, so a line's
# trailing space before '\n' (or before end-of-text after trim) never
# breaks line identity. Pure regex split — no per-line trim lambda.
_LINE_SPLIT = r"\s*\n\s*"


def lines_expr(c: Column | str) -> Column:
    """Non-empty whitespace-trimmed lines of a document."""
    c = F.col(c) if isinstance(c, str) else c
    return F.array_remove(F.split(F.trim(c), _LINE_SPLIT), "")


def repetition_cols(text_col: str = "text") -> dict[str, Column]:
    """Line-level repetition signals (the Gopher/MassiveText
    ``duplicate line fraction`` family), per document, as pure codegen
    expressions:

    * ``n_lines`` — non-empty lines;
    * ``dup_line_frac`` — fraction of lines that repeat an earlier
      line (1 − distinct/total);
    * ``dup_line_char_frac`` — fraction of line characters inside
      those repeats (char mass of all lines minus char mass of the
      distinct set, over the total) — catches a short doc whose one
      long boilerplate line repeats.

    Both are 0.0 for empty / newline-free documents (a single line
    cannot repeat)."""
    lines = lines_expr(text_col)
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    total_chars = F.length(F.array_join(lines, ""))
    distinct_chars = F.length(F.array_join(F.array_distinct(lines), ""))
    dup_frac = F.when(
        n_lines > 0, (n_lines - n_distinct) / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    dup_char_frac = F.when(
        total_chars > 0,
        (total_chars - distinct_chars) / total_chars.cast("double"),
    ).otherwise(F.lit(0.0))
    return {
        "n_lines": n_lines,
        "dup_line_frac": F.round(dup_frac, 6),
        "dup_line_char_frac": F.round(dup_char_frac, 6),
        # exact integer counterparts of the two fractions (numerator /
        # denominator) — hash-stable across engines where a rounded
        # double's decimal rendering is not
        "n_dup_lines": n_lines - n_distinct,
        "n_line_chars": total_chars,
        "n_dup_line_chars": total_chars - distinct_chars,
    }


def top_ngram(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Most frequent word ``n``-gram per document + the fraction of
    (non-space) token characters it covers — the Gopher ``top n-gram
    character fraction`` repetition filter.

    Plan: explode the non-distinct gram array → groupBy (id, gram)
    count (map-side combined, the only data-sized shuffle) → groupBy
    (id) taking ``max(struct(cnt, gram))`` (partial-agg'd, O(docs)
    rows) — no window, no sort of the full gram table. Tie-break is
    deterministic: highest count, then lexicographically greatest
    gram. Documents with fewer than ``n`` tokens are absent (no
    gram exists)."""
    tok_chars = F.length(F.array_join(tokens_expr(text_col), ""))
    grams = (
        df.select(
            F.col(id_col),
            tok_chars.alias("_tok_chars"),
            F.explode(ngrams_expr(text_col, n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("_tok_chars").alias("_tok_chars"),
        )
    )
    best = grams.groupBy(id_col).agg(
        F.max(F.struct("cnt", "gram", "_tok_chars")).alias("m")
    )
    gram_chars = F.length(F.replace(F.col("m.gram"), F.lit(" "), F.lit("")))
    return best.select(
        id_col,
        F.col("m.gram").alias("top_gram"),
        F.col("m.cnt").alias("gram_count"),
        F.round(
            F.col("m.cnt") * gram_chars / F.col("m._tok_chars").cast("double"), 6
        ).alias("top_gram_char_frac"),
        # the frac's exact integer denominator (non-space token chars);
        # (gram_count, top_gram, tok_chars) determine the frac, so
        # cross-engine hash checks can use integers only
        F.col("m._tok_chars").alias("tok_chars"),
    )


# --- PII detection / redaction -------------------------------------------

# RE2-compatible (no lookaround/backrefs) so the DuckDB oracle mirrors
# the patterns verbatim. BD mobile: optional +880/880/0 prefix then
# 1[3-9] and 8 digits — precise enough to leave postal codes and house
# numbers alone (no generic "long digit run" heuristic).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"(?:\+?880|0)1[3-9]\d{8}", "<PHONE>"),
)


def pii_cols(text_col: str = "text") -> dict[str, Column]:
    """Per-document PII signals + redacted text, pure codegen. Each
    category is counted on the text with the PRIOR categories already
    redacted (emails first, so an address-bearing local part never
    also counts as a phone), then replaced — one progressive chain,
    mirrored verbatim by the oracle. The redaction pass a training
    corpus runs before tokenization; counts drive the drop-vs-redact
    policy."""
    out: dict[str, Column] = {}
    red = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}s"] = F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, token)
    out["redacted"] = red
    return out


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction
    of its distinct ``k``-token shingles that appear anywhere in the
    benchmark set — the standard n-gram-overlap contamination check a
    training-data pipeline runs before a corpus ships.

    → (id, n_shingles, n_contaminated, contamination_frac). Documents
    with no tokens are absent (no shingle exists to test).

    Plan: benchmark shingles collapse to one distinct set (partial-agg
    explode, O(|benchmark shingles|)); doc shingles explode once; the
    membership test is a left join on the shingle string — broadcast
    by default (benchmark sets are MBs against a 100 TB corpus; pass
    ``broadcast_benchmark=False`` to shuffle-join a giant holdout).
    One count-aggregate back to one row per document."""
    bench = (
        benchmark.select(F.explode(shingles_expr(bench_text_col, k)).alias("sh"))
        .filter(F.col("sh") != "")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingles_expr(text_col, k)).alias("sh")
    ).filter(F.col("sh") != "")
    joined = doc_sh.join(bench, "sh", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        F.round(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("contamination_frac"),
    )


def repeated_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-corpus boilerplate detection: lines (paragraphs) that
    occur in ≥ ``min_docs`` distinct documents, with occurrence
    counts — the discovery pass behind C4-style "remove any line seen
    ≥ N times" filtering.

    Plan: explode lines → groupBy md5(line) with partial aggregation —
    one (hash)-keyed shuffle whose width is the distinct-paragraph
    count, not the corpus size. ``count(distinct id)`` is exact; at
    10^12 pages swap it for ``approx_count_distinct`` if a bounded
    error is acceptable."""
    paras = df.select(
        F.col(id_col).alias("_id"),
        F.explode(lines_expr(text_col)).alias("para"),
    )
    return (
        paras.groupBy(F.md5(F.col("para")).alias("para_hash"))
        .agg(
            F.min("para").alias("paragraph"),
            F.countDistinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
